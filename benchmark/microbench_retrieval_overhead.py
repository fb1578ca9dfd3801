"""Decompose the per-call cost of the approx retrieval scan.

The round-4 brunch d=100 approx `most_similar` measured 0.356 s per
10k queries, while the raw per-chunk `approx_max_k` compute at that
width projects to ~0.16 s — and the 19x-smaller ML-20M catalog only
drops the end-to-end time to 0.237 s, so a fixed per-call overhead
dominates.  Candidates, in `ops/topk.batch_topn`'s call path:

  1. `_stage`'s mutation-checksum (`_fingerprint`) reads the FULL
     202 MB table once per call (cache hit still pays the read);
  2. query padding + host->device transfer of the (nc, 2048, d)
     chunk tensor over the tunneled link;
  3. the one-dispatch scan compute itself;
  4. device->host readback of (nc, 2048, k) vals+idx.

This bench times each stage separately (warm programs, loss-readback
fencing per CLAUDE.md) and prints one JSON line per row.  Decide from
data: if (1) dominates, key the cache on a facade-owned version
counter; if (2) dominates, ship queries bf16 or keep them device-side.

Run (real chip, serialized with other TPU jobs):
  python benchmark/microbench_retrieval_overhead.py --items 505926 \
      --d 100 --queries 10000
"""
from __future__ import annotations

import argparse
import json
import os
import sys as _sys
import time
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))
_sys.path.insert(0, str(_here.parent))

import numpy as np

from models import pin_cpu_if_requested

pin_cpu_if_requested()

import jax  # noqa: E402

from buffalo_tpu import utils  # noqa: E402
from buffalo_tpu.ops import topk as topk_mod  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=505_926)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.items, args.queries, args.reps = 4096, 512, 2

    # backend-init watchdog (same contract as the sibling benches): a
    # down axon service hangs jax.devices() indefinitely — emit the
    # error JSON the runner health-gates on instead of wedging the
    # serialized measurement session
    import threading

    def _watchdog():
        print(json.dumps({"error": "backend init exceeded 900 s"}),
              flush=True)
        os._exit(3)

    timer = threading.Timer(900.0, _watchdog)
    timer.daemon = True
    timer.start()
    devices = jax.devices()
    timer.cancel()
    utils.enable_compilation_cache()
    backend = devices[0].platform
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((args.items, args.d), dtype=np.float32)
    p = rng.standard_normal((args.queries, args.d), dtype=np.float32)
    emit(config="retrieval_overhead", backend=backend, items=args.items,
         d=args.d, queries=args.queries, chunk=args.chunk)

    # --- end-to-end batch_topn (warm) ---------------------------------
    for approx in (True, False):
        topk_mod.batch_topn(p, Q, args.topk, chunk=args.chunk,
                            approx=approx)        # compile + stage
        t = timeit(lambda a=approx: topk_mod.batch_topn(
            p, Q, args.topk, chunk=args.chunk, approx=a), args.reps)
        emit(stage="e2e_batch_topn", approx=approx, seconds=round(t, 4))

    # --- 1. fingerprint over the full table ---------------------------
    t = timeit(lambda: topk_mod._fingerprint(Q), args.reps)
    emit(stage="fingerprint", seconds=round(t, 4),
         mb=round(Q.nbytes / 1e6, 1))

    # --- 2a. host-side pad/reshape of queries -------------------------
    t = timeit(lambda: topk_mod._bucketed_chunks(p, args.chunk), args.reps)
    emit(stage="bucketed_chunks", seconds=round(t, 4))

    # --- 2b. query upload (padded chunk tensor) -----------------------
    chunks = topk_mod._bucketed_chunks(p, args.chunk)
    t = timeit(
        lambda: jax.device_put(chunks).block_until_ready(), args.reps)
    emit(stage="query_upload", seconds=round(t, 4),
         mb=round(chunks.nbytes / 1e6, 1))

    # --- 3. scan compute with pre-staged inputs -----------------------
    Q_d = jax.device_put(Q)
    chunks_d = jax.device_put(chunks)
    zb = jax.numpy.zeros((), jax.numpy.float32)
    for approx in (True, False):
        def run(a=approx):
            vals, idx = topk_mod._chunked_topn(
                chunks_d, Q_d, zb, k=args.topk, with_bias=False, approx=a)
            # loss-readback fence (block_until_ready unreliable over
            # the tunnel, CLAUDE.md)
            np.asarray(vals[0, 0])
        run()
        t = timeit(run, args.reps)
        emit(stage="scan_compute", approx=approx, seconds=round(t, 4))

    # --- 4. full readback of device results ---------------------------
    vals, idx = topk_mod._chunked_topn(
        chunks_d, Q_d, zb, k=args.topk, with_bias=False, approx=True)
    np.asarray(vals[0, 0])
    t = timeit(lambda: (np.asarray(vals), np.asarray(idx)), args.reps)
    emit(stage="result_readback", seconds=round(t, 4),
         mb=round((vals.nbytes + idx.nbytes) / 1e6, 1))

    # --- chunk-size sensitivity (compute only) -------------------------
    for chunk in (2048, 4096, 8192):
        ch = topk_mod._bucketed_chunks(p, chunk)
        ch_d = jax.device_put(ch)

        def run_c(ch_d=ch_d):
            vals, _ = topk_mod._chunked_topn(
                ch_d, Q_d, zb, k=args.topk, with_bias=False, approx=True)
            np.asarray(vals[0, 0])
        run_c()
        t = timeit(run_c, args.reps)
        emit(stage="scan_compute_chunk", chunk=chunk, approx=True,
             seconds=round(t, 4))


if __name__ == "__main__":
    main()
