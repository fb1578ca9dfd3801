"""KakaoReco730M-scale ALS: 21.9M x 1.47M users/items, 730M nnz.

The reference's largest published benchmark (`benchmark/README.md:118`:
2 iterations in 132 s with T=16 and a 4-8 GB `batch_mb` budget,
streaming CSR chunks from HDF5 on a 64 GB box). On TPU the *padded*
interaction data (~6.6 GB cols+vals) plus both factor tables fits one
v5e chip's HBM, so the whole epoch still runs as a single fused
dispatch — no streaming required at 730M nnz.

Usage:
  python benchmark/test_730m.py --d 32 [--nnz 730000000] [--epochs 2]

Memory notes: synthesis + batch materialization peak ~40 GB host RAM.
Use --nnz to scale down on smaller hosts.
"""
from __future__ import annotations

import argparse
import sys as _sys
from pathlib import Path as _Path

_here = _Path(__file__).resolve().parent
_sys.path.insert(0, str(_here))
_sys.path.insert(0, str(_here.parent))
import json
import time

import numpy as np

USERS = 21_940_315
ITEMS = 1_467_298
NNZ = 730_000_000
BASELINE_2ITER_S = 132.0  # reference T=16 batch_mb=4096 (README.md:118)


def synth(num_users, num_items, nnz, seed=0):
    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, num_items + 1, dtype=np.float64) ** 0.9
    cum = np.cumsum(pop / pop.sum())
    deg = rng.lognormal(mean=0.0, sigma=1.1, size=num_users)
    deg = np.maximum(1, (deg / deg.sum() * nnz)).astype(np.int64)
    total = int(deg.sum())
    # draw items in slabs to bound peak memory
    items = np.empty(total, dtype=np.int32)
    step = 50_000_000
    for beg in range(0, total, step):
        n = min(step, total - beg)
        items[beg:beg + n] = np.searchsorted(
            cum, rng.random(n)).astype(np.int32)
    np.minimum(items, num_items - 1, out=items)
    indptr = np.zeros(num_users + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])

    # colwise orientation via counting sort (vals are implicit 1.0)
    counts = np.bincount(items, minlength=num_items).astype(np.int64)
    cindptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(counts, out=cindptr[1:])
    ckey = np.empty(total, dtype=np.int32)
    cursor = cindptr[:-1].copy()
    rows = np.repeat(np.arange(num_users, dtype=np.int32), deg)
    for beg in range(0, total, step):
        end = min(beg + step, total)
        chunk_items = items[beg:end].astype(np.int64)
        order = np.argsort(chunk_items, kind="stable")
        it_s = chunk_items[order]
        rw_s = rows[beg:end][order]
        uniq, start_idx, cnts = np.unique(it_s, return_index=True,
                                          return_counts=True)
        within = np.arange(len(it_s), dtype=np.int64) - np.repeat(
            start_idx, cnts)
        pos = cursor[it_s] + within
        ckey[pos] = rw_s
        np.add.at(cursor, uniq, cnts)
    del rows, cursor
    return ({"rowwise": {"indptr": indptr, "key": items},
             "colwise": {"indptr": cindptr, "key": ckey}}, total)


class _Data:
    def __init__(self, groups):
        self.groups = groups

    def get_group(self, g):
        return self.groups[g]


def main():
    from models import pin_cpu_if_requested
    pin_cpu_if_requested()
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--nnz", type=int, default=NNZ)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_mb", type=int, default=1024)
    ap.add_argument("--resident_mb", type=int, default=9216)
    ap.add_argument("--f32_vals", action="store_true",
                    help="keep confidence values f32 (default bf16)")
    ap.add_argument("--only", default="both",
                    choices=["both", "rowwise", "colwise"],
                    help="isolate one half-epoch (profiling aid)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from buffalo_tpu.data.batching import (DeviceBatcher,
                                           build_range_layout,
                                           stack_batches)
    from buffalo_tpu.ops.als_kernels import als_epoch

    st = time.perf_counter()
    groups, total = synth(USERS, ITEMS, args.nnz)
    print(f"synth: {total / 1e6:.0f}M nnz in "
          f"{time.perf_counter() - st:.0f}s", flush=True)

    st = time.perf_counter()
    batchers = {g: DeviceBatcher(_Data(groups), g, batch_mb=args.batch_mb,
                                 resident_mb=args.resident_mb, d=args.d)
                for g in ("rowwise", "colwise")}
    rb_, cb_ = batchers["rowwise"], batchers["colwise"]
    row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
        rb_.planner, cb_.planner, rb_.key, rb_.val, cb_.key, cb_.val,
        vals_dtype=np.dtype("bfloat16")
        if not args.f32_vals else np.float32)
    rb = tuple(jax.device_put(b) for b in stack_batches(row_b)) \
        if args.only in ("both", "rowwise") else ()
    cb = tuple(jax.device_put(b) for b in stack_batches(col_b)) \
        if args.only in ("both", "colwise") else ()
    print(f"staged: {batchers['rowwise'].num_batches}+"
          f"{batchers['colwise'].num_batches} batches "
          f"(resident={batchers['rowwise'].resident}/"
          f"{batchers['colwise'].resident}) in "
          f"{time.perf_counter() - st:.0f}s", flush=True)

    rng = np.random.default_rng(7)
    D = args.d
    Pp = np.zeros((u_pad, D), np.float32)
    Pp[u_pos] = np.abs(rng.normal(
        scale=1.0 / D ** 2, size=(USERS, D))).astype(np.float32)
    Qp = np.zeros((i_pad, D), np.float32)
    Qp[i_pos] = np.abs(rng.normal(
        scale=1.0 / D ** 2, size=(ITEMS, D))).astype(np.float32)
    P = jax.device_put(Pp)
    Q = jax.device_put(Qp)

    from buffalo_tpu.ops.als_kernels import als_group_step, gramian_step
    com = dict(optimizer="manual_cg", alpha=8.0, adaptive_reg=False,
               cg_iters=3, cg_tol=1e-10, block_size=32,
               compute_loss=False)

    def fn(P, Q, rb, cb):
        """Group-per-dispatch epoch: bounds XLA temp live-set (the
        single fused program OOMs at this scale); dispatches pipeline."""
        n = dn = 0.0  # an empty orientation (e.g. --only colwise) must
        FF = gramian_step(Q)  # not leave the loss names unbound
        for g in rb:
            P, n, dn = als_group_step(P, Q, FF, g, reg=0.1,
                                      item_axis=False,
                                      num_fixed_rows=ITEMS, **com)
        FF = gramian_step(P)
        for g in cb:
            Q, n, dn = als_group_step(Q, P, FF, g, reg=0.1,
                                      item_axis=True,
                                      num_fixed_rows=USERS, **com)
        return P, Q, n, dn

    def sync(*arrs):
        return sum(float(jnp.sum(a[::65536, -1])) for a in arrs)

    st = time.perf_counter()
    P, Q, n, dn = fn(P, Q, rb, cb)
    sync(P, Q)
    print(f"first epoch (incl. compile): "
          f"{time.perf_counter() - st:.1f}s", flush=True)

    st = time.perf_counter()
    for _ in range(args.epochs):
        P, Q, n, dn = fn(P, Q, rb, cb)
    sync(P, Q)
    epoch_s = (time.perf_counter() - st) / args.epochs
    print(json.dumps({
        "metric": "als_reco730m_d32_epoch_time",
        "value": round(epoch_s, 3),
        "unit": "s",
        "vs_baseline": round((BASELINE_2ITER_S / 2) / epoch_s, 2),
    }))


if __name__ == "__main__":
    main()
