"""Validation-metric comparison tables (WARP vs BPR vs ALS).

Counterpart of the reference's accuracy harness
(``benchmark/test_accuracy.py:37-84`` and ``accuracy_warp.md``):
train each ranking algorithm on the same database with a validation
carve-out and tabulate NDCG / MAP / AUC / accuracy at top-10.

With no network egress the default dataset is a synthetic
ML-100k-shaped matrix with planted cluster structure (users prefer one
of ``--clusters`` item groups) so ranking metrics are meaningfully
above chance; pass ``--mm`` for a real dataset (e.g. the reference's
preprocessed ML-20M main file) to reproduce accuracy_warp.md.

Usage:
  python benchmark/test_accuracy.py --d 40 --epochs 30
  python benchmark/test_accuracy.py --mm tests/ext/ml-20m/main --epochs 100
"""
from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))          # sibling models.py
_sys.path.insert(0, str(_here.parent))   # repo root (buffalo_tpu)
import json
import os
import tempfile

import numpy as np

from models import build_data


def write_clustered_mm(num_users=943, num_items=1682, clusters=32,
                       per_user=40, seed=7, out_dir=None):
    """Synthetic matrix with planted block preferences.

    Same recipe as the CI fixture (tests/conftest.py ``ml100k_like``)
    at ML-100k scale: users rate most of their ~52-item cluster at 4-5
    and a few out-of-cluster items at 1-2.  The metric ceiling is set
    by how much of a user's UNSEEN in-cluster set fits in top-k —
    clusters must be small relative to per_user + topk for the ceiling
    to be reachable (with 8 clusters of ~210 items the ceiling is
    ~0.05 NDCG@10 no matter how good the model; with 32 clusters it is
    several times higher).
    """
    rng = np.random.default_rng(seed)
    out_dir = out_dir or tempfile.mkdtemp(prefix="bt_acc_")
    path = os.path.join(out_dir, "main.mtx")
    ucl = rng.integers(0, clusters, num_users)
    icl = rng.integers(0, clusters, num_items)
    lines = []
    for u in range(num_users):
        same = np.nonzero(icl == ucl[u])[0]
        other = np.nonzero(icl != ucl[u])[0]
        n_in = min(len(same), int(rng.integers(per_user * 2 // 3,
                                               per_user)))
        n_out = min(len(other), int(rng.integers(3, 10)))
        for i in rng.choice(same, n_in, replace=False):
            lines.append(f"{u + 1} {int(i) + 1} {rng.integers(4, 6)}")
        for i in rng.choice(other, n_out, replace=False):
            lines.append(f"{u + 1} {int(i) + 1} {rng.integers(1, 3)}")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_users} {num_items} {len(lines)}\n")
        f.write("\n".join(lines) + "\n")
    return path


def main():
    from models import pin_cpu_if_requested
    pin_cpu_if_requested()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mm", default=None)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--clusters", type=int, default=32)
    ap.add_argument("--algos", nargs="+",
                    default=["als", "bpr", "warp"],
                    choices=["als", "bpr", "warp", "eals"])
    args = ap.parse_args()

    mm = args.mm or write_clustered_mm(clusters=args.clusters)
    db = os.path.join(tempfile.gettempdir(), "bt_acc_db")
    data = build_data(mm, db, validation={"name": "sample", "p": 0.1,
                                          "max_samples": 5000})

    from buffalo_tpu import (ALS, ALSOption, BPRMF, BPRMFOption, EALS,
                             EALSOption, WARP, WARPOption)
    setups = {
        "als": (ALS, ALSOption),
        "bpr": (BPRMF, BPRMFOption),
        "warp": (WARP, WARPOption),
        "eals": (EALS, EALSOption),
    }
    print(f"| algo | d={args.d}, {args.epochs} epochs "
          "| NDCG | MAP | AUC | ACC | error |")
    print("|---|---|---|---|---|---|---|")
    for name in args.algos:
        cls, opt_cls = setups[name]
        opt = opt_cls().get_default_option()
        opt.d = args.d
        opt.num_iters = args.epochs
        opt.validation = {"topk": args.topk}
        opt.evaluation_period = args.epochs  # evaluate once at the end
        np.random.seed(0)
        algo = cls(opt, data=data)
        algo.initialize()
        algo.train()
        v = algo.get_validation_results()
        print(f"| {name} | top-{args.topk} "
              f"| {v.get('ndcg', 0):.4f} | {v.get('map', 0):.4f} "
              f"| {v.get('auc', 0):.4f} | {v.get('accuracy', 0):.4f} "
              f"| {v.get('error', 0):.4f} |")
        print(json.dumps({"algo": name, **{k: round(float(x), 5)
                                           for k, x in v.items()}}))


if __name__ == "__main__":
    main()
