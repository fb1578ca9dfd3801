"""Micro-benchmark: IVF partial-top-k merge — device-fused vs host.

The TPU search path fuses the per-tile partial-top-k merge into the
scoring dispatch (two/three multi-key stable ``lax.sort`` passes over
~B * n_probe * k elements, ``parallel/ann.py::_tiled_search``); the
CPU path reads the partials back and merges with numpy composite keys.
The fused sort belongs to the compile class that wedged the remote TPU
compiler for the (deleted) two-stage top-k, so the decision needs its
own bounded measurement instead of riding inside every retrieval
benchmark.  ``IVFIndex.merge = "host" | "device"`` is the knob.

Run on the chip:
  python benchmark/microbench_ivf_merge.py [--rows 505840] [--d 100]
CPU smoke:
  JAX_PLATFORMS=cpu python benchmark/microbench_ivf_merge.py --smoke
"""
from __future__ import annotations

import argparse
import json
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=505_840)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--n_probe", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    from buffalo_tpu.utils import enable_compilation_cache, pin_cpu
    if args.smoke:
        pin_cpu(force=True)
        args.rows, args.queries = 20_000, 500
    else:
        pin_cpu()
    import threading

    def _watchdog():
        import os
        print(json.dumps({"error": "backend init exceeded 900 s"}))
        os._exit(3)

    timer = threading.Timer(900.0, _watchdog)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()
    timer.cancel()
    enable_compilation_cache()

    from buffalo_tpu.parallel import IVFIndex

    rng = np.random.default_rng(0)
    # clustered table so the IVF has real structure
    k_lat = 64
    C = rng.standard_normal((k_lat, args.d)).astype(np.float32)
    lab = rng.integers(0, k_lat, args.rows)
    table = (C[lab] + 0.3 * rng.standard_normal(
        (args.rows, args.d))).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    queries = table[rng.integers(0, args.rows, args.queries)] \
        + 0.1 * rng.standard_normal(
            (args.queries, args.d)).astype(np.float32)
    queries = queries.astype(np.float32)

    t0 = time.perf_counter()
    index = IVFIndex.build(table, n_probe=args.n_probe, spill=2)
    build_t = time.perf_counter() - t0
    print(json.dumps({"config": "ivf_merge_ab", "rows": args.rows,
                      "d": args.d, "queries": args.queries,
                      "n_probe": args.n_probe,
                      "build_s": round(build_t, 2),
                      "backend": jax.default_backend()}))

    ref_i = None
    for merge in ("host", "device"):
        index.merge = merge
        try:
            t0 = time.perf_counter()
            ids, vals = index.search(queries, args.topk)   # compile
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ids, vals = index.search(queries, args.topk)
            el = (time.perf_counter() - t0) / args.iters
        except Exception as e:
            print(json.dumps({"merge": merge, "error": str(e)[:160]}))
            continue
        row = {"merge": merge, "search_s": round(el, 4),
               "warmup_s": round(warm, 1),
               "q_per_s": round(args.queries / el)}
        if ref_i is None:
            ref_i = np.asarray(ids)
        else:
            agree = float(np.mean([
                len(set(a) & set(b)) / max(len(set(b)), 1)
                for a, b in zip(np.asarray(ids), ref_i)]))
            row["overlap_vs_host"] = round(agree, 4)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
