"""Batch-retrieval throughput: ParALS most_similar / topk_recommendation.

Counterpart of ``benchmark/test_parallel.py`` (reference numbers at
``benchmark/README.md:175-179``: 10k most_similar queries in 63.9s /
34.1s / 21.8s at 1/2/4 threads on the Xeon box; an HNSW ANN index cuts
that to ~0.2s).  Here retrieval is one sharded matmul + top-k per
batch, so the whole 10k-query bench is a handful of XLA dispatches.

Usage:
  python benchmark/test_parallel.py --queries 10000 --topk 10
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
import time

import numpy as np

from models import DATASET_SHAPES, build_data, write_synth_mm


def main():
    from models import pin_cpu_if_requested
    pin_cpu_if_requested()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="kakao_brunch_12m",
                    choices=sorted(DATASET_SHAPES))
    ap.add_argument("--mm", default=None)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--queries", type=int, default=10000)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--approx", action="store_true",
                    help="also time the approx=True facade (full scan "
                         "with lax.approx_max_k selection) and report "
                         "its recall vs the exact scan")
    ap.add_argument("--ann", action="store_true",
                    help="also time the IVF ANN path and report its "
                         "recall vs the exact scan (reference HNSW "
                         "row: benchmark/README.md:177)")
    ap.add_argument("--n_probe", type=int, nargs="+", default=[32],
                    help="cells probed per query; several values reuse "
                         "one trained model + one index build")
    ap.add_argument("--spill", type=int, default=1,
                    help="index each item in its s best cells")
    ap.add_argument("--n_clusters", type=int, default=None,
                    help="IVF cells (default sqrt(num_items))")
    args = ap.parse_args()

    mm = args.mm or write_synth_mm(args.dataset)
    db = os.path.join(tempfile.gettempdir(),
                      f"bt_par_db_{args.dataset}")
    data = build_data(mm, db)

    from buffalo_tpu import ALS, ALSOption, ParALS
    opt = ALSOption().get_default_option()
    opt.d = args.d
    # a few epochs: 1-iteration factors are near-random, which both
    # understates IVF recall (no cluster structure) and overstates how
    # hard exact ranking is; 3 epochs is converged enough and cheap
    opt.num_iters = 3
    als = ALS(opt, data=data)
    als.initialize()
    als.train()

    par = ParALS(als)
    als.build_itemid_map()
    als.build_userid_map()
    rng = np.random.default_rng(0)
    itemids = als._idmanager.itemids
    userids = als._idmanager.userids
    def phase(msg):
        # timestamped + flushed: a timed-out run's log shows exactly
        # which compile/run it died in
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    uqs = [userids[i] for i in rng.integers(0, len(userids), args.queries)]
    # warm at the FULL query count: the chunked scan is jit-keyed on
    # the (bucketed) chunk count, so a 64-query warmup would leave the
    # full-count compile inside the timed region (r4 ml20m run showed
    # 4.9 s "timed" topk vs 0.3 s for the identical program warm)
    phase(f"warmup: topk_recommendation compile x{args.queries}")
    par.topk_recommendation(uqs, topk=args.topk)
    phase(f"timed: topk_recommendation x{args.queries}")
    st = time.perf_counter()
    _keys, topks, scores = par.topk_recommendation(uqs, topk=args.topk)
    tk_t = time.perf_counter() - st

    qs = [itemids[i] for i in rng.integers(0, len(itemids), args.queries)]
    phase("warmup: most_similar (normalize + compile)")
    par.most_similar(qs, topk=args.topk)  # normalizes factors
    phase(f"timed: most_similar x{args.queries}")
    st = time.perf_counter()
    topks, scores = par.most_similar(qs, topk=args.topk)
    ms_t = time.perf_counter() - st

    approx_row = None
    if args.approx:
        par_ax = ParALS(als, approx=True)
        phase("warmup: approx most_similar compile")
        par_ax.most_similar(qs, topk=args.topk)   # warmup at full count
        phase("timed: approx most_similar")
        st = time.perf_counter()
        ax_topks, _ = par_ax.most_similar(qs, topk=args.topk)
        ax_t = time.perf_counter() - st
        hits = sum(len(set(a) & set(e)) for a, e in
                   zip(np.asarray(ax_topks), np.asarray(topks)))
        approx_row = (ax_t, hits / np.asarray(topks).size)

    ann_rows = []
    if args.ann:
        from buffalo_tpu.parallel import IVFIndex
        exact_topks = np.asarray(topks)
        phase("ivf: index build")
        st = time.perf_counter()
        index = IVFIndex.build(als.Q, n_probe=max(args.n_probe),
                               spill=args.spill,
                               n_clusters=args.n_clusters)
        build_t = time.perf_counter() - st
        par.set_ann_index(index)
        for n_probe in args.n_probe:
            index.n_probe = n_probe
            # warm up at the FULL query count: the IVF scorer's jit
            # cache is keyed on the tile shapes, so a small warmup
            # would leave one compile inside the timed region
            phase(f"ivf: warmup probe={n_probe}")
            par.most_similar(qs, topk=args.topk)
            phase(f"ivf: timed probe={n_probe}")
            st = time.perf_counter()
            ann_topks, _ = par.most_similar(qs, topk=args.topk)
            ann_t = time.perf_counter() - st
            # recall@topk of the ANN result against the exact scan
            hits = sum(len(set(a) & set(e)) for a, e in
                       zip(np.asarray(ann_topks), exact_topks))
            ann_rows.append((n_probe, ann_t, hits / exact_topks.size))

    print(f"| op | queries | d | elapsed_s | q_per_s |")
    print(f"|---|---|---|---|---|")
    print(f"| most_similar | {len(qs)} | {args.d} | {ms_t:.3f} "
          f"| {len(qs) / ms_t:.0f} |")
    print(f"| topk_recommendation | {len(uqs)} | {args.d} | {tk_t:.3f} "
          f"| {len(uqs) / tk_t:.0f} |")
    out = {"most_similar_s": round(ms_t, 4),
           "topk_s": round(tk_t, 4),
           "queries": len(qs), "d": args.d,
           "vs_baseline_1t": round(63.9 / max(ms_t, 1e-9), 1)}
    if approx_row is not None:
        ax_t, ax_recall = approx_row
        print(f"| most_similar_approx | {len(qs)} | {args.d} "
              f"| {ax_t:.3f} | {len(qs) / ax_t:.0f} |")
        print(f"approx recall@{args.topk} {ax_recall:.3f} vs exact")
        out.update({"approx_s": round(ax_t, 4),
                    "approx_recall": round(ax_recall, 4)})
    for n_probe, ann_t, ann_recall in ann_rows:
        print(f"| most_similar_ivf (probe={n_probe}) | {len(qs)} "
              f"| {args.d} | {ann_t:.3f} | {len(qs) / ann_t:.0f} |")
        print(f"IVF build {build_t:.2f}s, probe={n_probe} "
              f"recall@{args.topk} {ann_recall:.3f} vs exact")
    if ann_rows:
        n_probe, ann_t, ann_recall = ann_rows[-1]
        out.update({"ann_s": round(ann_t, 4),
                    "ann_recall": round(ann_recall, 4),
                    "ann_build_s": round(build_t, 2),
                    "n_probe": n_probe, "spill": args.spill,
                    "ann_rows": [[p_, round(t_, 4), round(r_, 4)]
                                 for p_, t_, r_ in ann_rows]})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
