"""Micro-benchmark: the sub-128-width epoch inversion, and whether
zero-padding the factor width fixes it.

The BPR KakaoBrunch d-sweep measured 4.17 / 4.07 / 5.00 / 1.90 /
2.40 s at d = 10/20/40/80/160 — d <= 40 epochs are ~2.5x SLOWER than
d = 80 on strictly less arithmetic (same inversion class as the ALS
d = 40 row).  Hypothesis: XLA's codegen for the gather -> elementwise
-> scatter pipeline degrades when the table width is far below the
128-lane register, and storing the same d = 40 problem inside a wider
zero-padded table recovers the wide-table code path.

Padding is mathematically inert for the whole BPR/WARP update family:
padded dims start zero, every gradient component is a product with a
padded factor entry (logit * (qi - qj), logit * p) so it stays zero,
the SGD regularization term -reg * w is zero at w = 0, and the
max_step_norm row clip only shrinks steps (a zero row's norm
contribution is zero).  The bench asserts that: the padded epoch's
first-d columns must match the unpadded epoch to float tolerance, and
its padded columns must stay exactly zero.

Drives the REAL ``bpr_epoch`` (production chunk geometry imported from
the driver's sizing rule) at the KakaoBrunch12M shape:

  python benchmark/microbench_bpr_width.py --d 10 20 40 80 \
      --pad 0 64 128
CPU smoke:
  JAX_PLATFORMS=cpu python benchmark/microbench_bpr_width.py --smoke

Prints one JSON line per (d, pad) cell: epoch seconds + parity vs the
unpadded run of the same d.
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


def synth_csr(num_users, num_items, nnz, seed=0):
    """Popularity-skewed (user, item) positives, CSR by user."""
    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.8
    pop /= pop.sum()
    items = rng.choice(num_items, size=nnz, p=pop).astype(np.int32)
    users = rng.integers(0, num_users, size=nnz).astype(np.int32)
    order = np.argsort(users, kind="stable")
    users, items = users[order], items[order]
    indptr = np.zeros(num_users + 1, dtype=np.int64)
    np.add.at(indptr, users + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, users, items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=306687)
    ap.add_argument("--items", type=int, default=505840)
    ap.add_argument("--nnz", type=int, default=12_241_256)
    ap.add_argument("--d", type=int, nargs="+", default=[40, 80])
    ap.add_argument("--pad", type=int, nargs="+", default=[0, 128],
                    help="stored table widths to try per d "
                         "(0 = unpadded baseline; widths <= d skipped)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        pin_cpu_if_requested(force=True)
        args.users, args.items, args.nnz = 500, 800, 20_000
        args.d, args.pad = [8], [0, 16]

    import jax
    import jax.numpy as jnp

    from buffalo_tpu import utils
    from buffalo_tpu.ops import sgd_kernels as K

    utils.enable_compilation_cache()

    indptr, users, items = synth_csr(args.users, args.items, args.nnz)
    nnz = len(users)
    # the production driver's batch-size rule (models/bpr.py)
    batch_size = min(max(nnz // 32, 1024), 1 << 19)
    nchunks = -(-nnz // batch_size)
    pad_tail = nchunks * batch_size - nnz
    users_c = jnp.asarray(np.concatenate(
        [users, np.zeros(pad_tail, np.int32)]).reshape(nchunks, batch_size))
    items_c = jnp.asarray(np.concatenate(
        [items, np.zeros(pad_tail, np.int32)]).reshape(nchunks, batch_size))
    bloom_np, bloom_log2 = K.build_bloom(indptr, items)
    bloom = jax.device_put(bloom_np)
    cum_table = jnp.zeros((1,), jnp.float32)
    dummy = jnp.zeros(2, jnp.int32), jnp.zeros(1, jnp.int32)

    print(json.dumps({"config": "bpr_width", "backend": jax.default_backend(),
                      "users": args.users, "items": args.items, "nnz": nnz,
                      "batch": batch_size, "nchunks": nchunks}), flush=True)

    statics = dict(num_items=args.items, num_negatives=1, use_bias=True,
                   update_i=True, update_j=True, verify_neg=True,
                   use_cum_table=False)

    def run_epoch(P, Q, Qb):
        return K.bpr_epoch(
            P, Q, Qb, {}, users_c, items_c, bloom, cum_table,
            jax.random.PRNGKey(7), jnp.int32(0), dummy[0], dummy[1],
            None, optimizer="sgd", bloom_log2=bloom_log2,
            per_coordinate_normalize=False, lr=0.05, min_lr=0.0001,
            beta1=0.9, beta2=0.999, reg_u=0.025, reg_i=0.025,
            reg_j=0.025, reg_b=0.025, num_valid=nnz,
            total_samples=float(nnz), max_step_norm=0.1, **statics)

    def fence(*arrs):
        # strided readback fences the dispatch reliably over the tunnel
        return [np.asarray(a[::max(1, a.shape[0] // 64)]) for a in arrs]

    for d in args.d:
        rng = np.random.default_rng(d)
        P0 = (rng.standard_normal((args.users, d)) / np.sqrt(d)) \
            .astype(np.float32)
        Q0 = (rng.standard_normal((args.items, d)) / np.sqrt(d)) \
            .astype(np.float32)
        Qb0 = np.zeros(args.items, np.float32)
        ref_head = None
        for w in args.pad:
            width = d if w == 0 else w
            if width < d or (w != 0 and width == d):
                continue
            Pw = np.zeros((args.users, width), np.float32)
            Qw = np.zeros((args.items, width), np.float32)
            Pw[:, :d], Qw[:, :d] = P0, Q0
            P = jax.device_put(Pw)
            Q = jax.device_put(Qw)
            Qb = jax.device_put(Qb0)
            t0 = time.perf_counter()
            P, Q, Qb, _ = run_epoch(P, Q, Qb)
            fence(P, Q)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            P, Q, Qb, _ = run_epoch(P, Q, Qb)
            fence(P, Q)
            dt = time.perf_counter() - t0
            row = {"d": d, "stored_width": width,
                   "epoch_s": round(dt, 3), "warmup_s": round(warm, 1)}
            Ph = np.asarray(P[: 4096])
            if w == 0:
                ref_head = Ph
            elif ref_head is not None:
                row["head_max_abs_diff"] = float(
                    np.abs(Ph[:, :d] - ref_head[:, :d]).max())
                row["pad_cols_max_abs"] = float(np.abs(Ph[:, d:]).max())
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
