"""Micro-benchmark: wide-row top-k strategies on the live backend.

Compares single-pass ``lax.top_k`` against ``lax.approx_max_k``
(TPU-optimized partial reduction; approximate — reported with its
recall so speed is never quoted without accuracy).

The two-stage tie-exact rewrite was measured on the v5e (2026-08-19):
16.6x SLOWER than single ``lax.top_k`` (713.9 ms vs 42.9 ms at
2048x505840) and its compile wedged the remote compiler — the strategy
is settled and the implementation was deleted (see CLAUDE.md).

Run on the chip when the service is healthy:
  python benchmark/microbench_topk.py [--rows 2048] [--cols 505840]
"""
from __future__ import annotations

import argparse
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--cols", type=int, default=505840)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from buffalo_tpu.utils import pin_cpu
    pin_cpu()
    # the tunneled TPU backend can hang indefinitely when the service
    # is down (same watchdog recipe as bench.py)
    import threading

    def _watchdog():
        import os
        print(json.dumps({"error": "backend init exceeded 900 s "
                          "(TPU service unreachable?)"}))
        os._exit(3)

    timer = threading.Timer(900.0, _watchdog)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()
    timer.cancel()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.random((args.rows, args.cols)).astype(np.float32))
    k = args.k

    single = jax.jit(lambda s: jax.lax.top_k(s, k))

    def approx(s):
        v, i = jax.lax.approx_max_k(s, k)
        return v, i

    approx_j = jax.jit(approx)

    ref_v, ref_i = single(scores)
    ref_i = np.asarray(ref_i)

    def bench(fn, name):
        try:
            v, i = fn(scores)
        except Exception as e:  # approx_max_k may be unsupported
            print(json.dumps({"name": name, "error": str(e)[:120]}))
            return
        np.asarray(v)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v, i = fn(scores)
        np.asarray(v)
        el = (time.perf_counter() - t0) / args.iters
        recall = float(np.mean([
            len(set(a) & set(e)) / k
            for a, e in zip(np.asarray(i), ref_i)]))
        print(json.dumps({"name": name, "ms": round(el * 1e3, 2),
                          "recall_vs_exact": round(recall, 4),
                          "rows": args.rows, "cols": args.cols, "k": k,
                          "backend": jax.default_backend()}))

    bench(single, "lax.top_k")
    bench(approx_j, "lax.approx_max_k")


if __name__ == "__main__":
    main()
