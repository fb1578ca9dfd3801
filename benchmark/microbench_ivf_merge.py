"""IVF merge placement: the decision record (settled 2026-08-19, r4).

Two merges of the per-tile partial top-k existed:

- **host** (numpy composite int64 keys + argsort): the shipped path.
- **device-fused** (two/three multi-key stable ``lax.sort`` passes
  inside the scoring dispatch): built for TPU, DELETED on this data —
  its compile ran 45 minutes and then killed the remote compiler
  connection (``UNAVAILABLE: remote_compile: Network Error: Unexpected
  EOF``), the same pathological-compile class as the (also deleted)
  two-stage top-k.  Measured rows from the deciding run
  (v5e, 505840x100 table, 10k queries, n_probe=32, spill=2):

      {"merge": "host",   "search_s": 7.886, "q_per_s": 1268}
      {"merge": "device", "error": "UNAVAILABLE: ... Unexpected EOF"}

  For scale: the EXACT full-scan at the same shape is 0.76 s warm
  (one MXU matmul + top_k per chunk) — on one chip, dense scan beats
  IVF up to at least ~500k items, so the merge was never the lever.

This script now times the shipped host-merge path only (kept so the
decision can be re-checked on future backend builds).

  python benchmark/microbench_ivf_merge.py [--rows 505840] [--d 100]
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
    k_lat = 64
    C = rng.standard_normal((k_lat, args.d)).astype(np.float32)
    lab = rng.integers(0, k_lat, args.rows)
    table = (C[lab] + 0.3 * rng.standard_normal(
        (args.rows, args.d))).astype(np.float32)
    table /= np.linalg.norm(table, axis=1, keepdims=True)
    queries = (table[rng.integers(0, args.rows, args.queries)]
               + 0.1 * rng.standard_normal(
                   (args.queries, args.d))).astype(np.float32)

    t0 = time.perf_counter()
    index = IVFIndex.build(table, n_probe=args.n_probe, spill=2)
    build_t = time.perf_counter() - t0
    print(json.dumps({"config": "ivf_host_merge", "rows": args.rows,
                      "d": args.d, "queries": args.queries,
                      "n_probe": args.n_probe,
                      "build_s": round(build_t, 2),
                      "backend": jax.default_backend()}))
    t0 = time.perf_counter()
    index.search(queries, args.topk)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        index.search(queries, args.topk)
    el = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"merge": "host", "search_s": round(el, 4),
                      "warmup_s": round(warm, 1),
                      "q_per_s": round(args.queries / el)}))


if __name__ == "__main__":
    main()
