"""Is the CFR stream epoch's 6.18 s the table-gather floor, and does
a bf16 gather table dodge it?

The 3-phase CFR epoch at the brunch stream shape gathers ~182M factor
rows (sppmi_nnz=79.2M walked twice + 2x12M user-item) from d=32
tables of 39-65 MB — right at the measured 50 MB cliff where v5e
gathers jump from ~3 ns/row to ~33 ns/row (CLAUDE.md hardware facts).
182M x 33 ns ~ 6.0 s ~ the whole epoch.  Hypothesis: storing a bf16
copy for the GATHER side (einsums upcast to f32) halves the table
under the cliff and buys back most of the epoch.

  python benchmark/microbench_cfr_gather.py
"""
from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--rows", type=int, default=505_363)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--gathers", type=int, default=16_000_000)
    ap.add_argument("--L", type=int, default=64,
                    help="padded row length (batch inner dim)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        args.rows, args.gathers = 10_000, 200_000

    import jax
    import jax.numpy as jnp

    from buffalo_tpu import utils

    utils.enable_compilation_cache()
    rng = np.random.default_rng(0)
    B = args.gathers // args.L
    idx = rng.integers(0, args.rows, (B, args.L)).astype(np.int32)
    idx_sorted = np.sort(idx, axis=None).reshape(B, args.L)
    table_f32 = rng.standard_normal(
        (args.rows, args.d)).astype(np.float32)

    print(json.dumps({"config": "cfr_gather",
                      "backend": jax.default_backend(),
                      "rows": args.rows, "d": args.d,
                      "gathers": B * args.L,
                      "table_mb_f32": round(table_f32.nbytes / 1e6, 1)}),
          flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def consume(T, ix):
        F = jnp.take(T, ix, axis=0)              # (B, L, d)
        # einsum-style consumption like the CFR A-matrix build
        return jnp.einsum("bld,bl->bd", F.astype(jnp.float32),
                          jnp.ones(ix.shape, jnp.float32),
                          preferred_element_type=jnp.float32).sum()

    for name, T, ix in (
            ("f32_random", table_f32, idx),
            ("f32_sorted", table_f32, idx_sorted),
            ("bf16_random", table_f32.astype(jnp.bfloat16), idx),
            ("bf16_sorted", table_f32.astype(jnp.bfloat16), idx_sorted),
            ("f32_half_table", table_f32[:args.rows // 2],
             (idx % (args.rows // 2))),
    ):
        Td = jax.device_put(T)
        ixd = jax.device_put(ix)
        float(consume(Td, ixd))                  # warm
        st = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = consume(Td, ixd)
        float(r)
        dt = (time.perf_counter() - st) / reps
        print(json.dumps({"case": name, "s": round(dt, 4),
                          "ns_per_row": round(dt / (B * args.L) * 1e9,
                                              2)}), flush=True)


if __name__ == "__main__":
    main()
