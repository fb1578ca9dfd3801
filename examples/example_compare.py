"""Model comparison walkthrough (counterpart of the reference's
``examples/jupyter-examples/4. Performance comparison over models.ipynb``):
train every matrix-input family — ALS, eALS, BPR-MF, WARP, pLSI — on
one dataset with a shared validation split and print a metric/time
table.

Usage:
  python examples/example_compare.py --mm /path/to/main.mtx
  python examples/example_compare.py            # synthetic demo
  python examples/example_compare.py --algos als bpr
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from buffalo_tpu.utils import pin_cpu

pin_cpu()  # re-pin before backend init if JAX_PLATFORMS=cpu

import numpy as np


def make_demo_dataset(tmp_dir: str):
    """Clustered interactions so ranking metrics have signal."""
    rng = np.random.default_rng(5)
    num_users, num_items, clusters = 500, 150, 6
    group = num_items // clusters
    mm = os.path.join(tmp_dir, "main.mtx")
    lines = []
    for u in range(num_users):
        c = u % clusters
        items = np.unique(np.concatenate([
            rng.integers(c * group, (c + 1) * group, 28),
            rng.integers(0, num_items, 6)]))
        lines += [f"{u + 1} {int(i) + 1} {rng.integers(1, 6)}"
                  for i in items]
    with open(mm, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_users} {num_items} {len(lines)}\n")
        f.write("\n".join(lines) + "\n")
    return mm


def build(mm_path: str, tmp: str):
    from buffalo_tpu import MatrixMarketOptions
    from buffalo_tpu.data import load
    data_opt = MatrixMarketOptions().get_default_option()
    data_opt.input.main = mm_path
    data_opt.data.path = os.path.join(tmp, "compare.bfo")
    data_opt.data.validation = {"name": "sample", "p": 0.1,
                                "max_samples": 2000}
    data = load(data_opt)
    data.create()
    return data


def make_algo(name: str, d: int, epochs: int, data):
    import buffalo_tpu as bt
    opt_cls, algo_cls = {
        "als": (bt.ALSOption, bt.ALS),
        "eals": (bt.EALSOption, bt.EALS),
        "bpr": (bt.BPRMFOption, bt.BPRMF),
        "warp": (bt.WARPOption, bt.WARP),
        "plsi": (bt.PLSIOption, bt.PLSI),
    }[name]
    opt = opt_cls().get_default_option()
    opt.d = d
    opt.num_iters = epochs
    opt.validation = {"topk": 10}
    return algo_cls(opt, data=data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mm", default=None)
    ap.add_argument("--algos", nargs="+",
                    default=["als", "eals", "bpr", "warp", "plsi"],
                    choices=["als", "eals", "bpr", "warp", "plsi"])
    ap.add_argument("--d", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=12)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="buffalo_tpu_compare_")
    if args.mm is None:
        args.mm = make_demo_dataset(tmp)
    data = build(args.mm, tmp)

    rows = []
    for name in args.algos:
        algo = make_algo(name, args.d, args.epochs, data)
        algo.initialize()
        t0 = time.time()
        algo.train()
        elapsed = time.time() - t0
        res = algo.get_validation_results() or {}
        rows.append((name, elapsed / max(1, args.epochs),
                     res.get("ndcg", float("nan")),
                     res.get("map", float("nan")),
                     res.get("accuracy", float("nan")),
                     res.get("auc", float("nan"))))

    print(f"\nd={args.d}, {args.epochs} epochs, validation top-10:")
    print("| model | s/epoch | NDCG | MAP | ACC | AUC |")
    print("|---|---|---|---|---|---|")
    for name, spe, ndcg, m, acc, auc in rows:
        print(f"| {name} | {spe:.3f} | {ndcg:.4f} | {m:.4f} "
              f"| {acc:.4f} | {auc:.4f} |")


if __name__ == "__main__":
    main()
