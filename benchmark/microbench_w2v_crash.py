"""Bisect the stream-scale W2V TPU worker crash.

`w2v_epoch` reproducibly crashes the axon TPU worker ("kernel fault")
at the KakaoBrunch12M stream shape (vocab 502k) AND at half scale
(vocab 251k), while every sibling SGD family (BPR/WARP, 27k-item
catalogs) trains fine.  This harness runs the REAL `w2v_epoch` on
synthetic pair chunks, sweeping one axis at a time, to find the
faulting ingredient:

  --vocab N          vocab size (the searchsorted table + scatter width)
  --batch B          pair-chunk size
  --nchunks C        scan length
  --ablate X [X...]  drop a kernel ingredient, choices:
      clip           max_step_norm=0 (no per-row norm cap)
      loss           compute_loss=False

RESOLVED (2026-08-19, this harness): the culprit was
``jnp.searchsorted`` over the unigram^0.75 CDF — at vocab 262k it was
~90% of the warm epoch (6.18 s vs 0.562 s ablated) and 140 s of the
compile (vs 3.3 s), and at the full 502k vocab the compiled program
killed the TPU worker.  The kernel now samples via Walker-alias
tables (sgd_kernels.build_alias_table); this harness drives the REAL
kernel, so it measures the alias path now.

Each probe is one epoch dispatch on tiny-to-target shapes; run probes
in INCREASING size so the crash point is bracketed before the worker
dies (a crashed worker takes the process down — rerun for the next
probe).  Prints one JSON line per completed probe; a missing line IS
the signal.

Usage (serialized with other chip jobs):
  python benchmark/microbench_w2v_crash.py --vocab 32768 65536 131072 \
      262144 524288
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, nargs="+", default=[131072])
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--nchunks", type=int, default=8)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--negatives", type=int, default=5)
    ap.add_argument("--ablate", nargs="*", default=[],
                    choices=["clip", "loss"])
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        args.vocab, args.batch, args.nchunks = [4096], 1024, 2

    import threading

    def _watchdog():
        print(json.dumps({"error": "backend init exceeded 900 s"}),
              flush=True)
        os._exit(3)

    timer = threading.Timer(900.0, _watchdog)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()
    timer.cancel()
    import jax.numpy as jnp

    from buffalo_tpu import utils
    from buffalo_tpu.ops import w2v_kernels as W

    utils.enable_compilation_cache()

    print(json.dumps({"config": "w2v_crash_bisect",
                      "backend": jax.default_backend(),
                      "batch": args.batch, "nchunks": args.nchunks,
                      "d": args.d, "ablate": args.ablate}), flush=True)

    for vocab in args.vocab:
        rng = np.random.default_rng(0)
        # zipf-ish pair stream like the real corpus
        pop = 1.0 / np.arange(1, vocab + 1) ** 0.8
        pop /= pop.sum()
        from buffalo_tpu.ops.sgd_kernels import build_alias_table
        dist = jax.device_put(build_alias_table(pop))
        shape = (args.nchunks, args.batch)
        inputs = jnp.asarray(
            rng.integers(0, vocab, size=shape, dtype=np.int32))
        targets = jnp.asarray(
            rng.integers(0, vocab, size=shape, dtype=np.int32))
        L0 = jnp.asarray(rng.standard_normal((vocab, args.d))
                         .astype(np.float32) * 0.01)
        L1 = jnp.zeros((vocab, args.d), jnp.float32)

        def run(L0, L1):
            return W.w2v_epoch(
                L0, L1, inputs, targets, dist, jax.random.key(0),
                jnp.zeros((), jnp.float32),
                num_negatives=args.negatives, vocab_size=vocab,
                compute_loss="loss" not in args.ablate,
                lr=jnp.float32(0.025), min_lr=jnp.float32(0.0001),
                total_words=jnp.float32(args.nchunks * args.batch),
                words_per_chunk=jnp.float32(args.batch),
                max_step_norm=0.0 if "clip" in args.ablate else 0.1)

        # warm dispatch (compile); readback fences it — THIS is where
        # the worker crash surfaces (UNAVAILABLE) when the program
        # faults
        t0 = time.perf_counter()
        L0, L1, loss, cnt = run(L0, L1)
        lv = float(loss)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        L0, L1, loss, cnt = run(L0, L1)
        lv = float(loss)
        dt = time.perf_counter() - t0
        print(json.dumps({"vocab": vocab, "epoch_s": round(dt, 3),
                          "warmup_s": round(warm, 1),
                          "loss": round(lv, 3),
                          "pairs": float(cnt)}), flush=True)


if __name__ == "__main__":
    main()
