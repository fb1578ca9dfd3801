"""Headline benchmark: ALS epoch time at ML-20M scale on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ core trains ALS on ML-20M (138k x 27k,
20M nnz) at d=40 in 11.32 s/epoch on the 6-core Xeon box with T=8
(BASELINE.md, benchmark/README.md:97).  The dataset itself cannot be
downloaded here (zero egress), so an equivalently-shaped synthetic
dataset is used: same user/item counts, same nnz, power-law item
popularity — epoch time depends on shape/nnz, not values.

Run `python bench.py --smoke` for a small CPU-friendly sanity run.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

ML20M_USERS = 138_493
ML20M_ITEMS = 26_744
ML20M_NNZ = 20_000_000
BASELINE_EPOCH_S = 11.32  # reference ALS ML-20M d=40, T=8 (README.md:97)
D = 40


def synth_ml20m(num_users, num_items, nnz, seed=0):
    """Synthetic CSR with power-law item popularity, ML-20M shaped."""
    rng = np.random.default_rng(seed)
    # item popularity ~ zipf(1.0), user degree ~ lognormal
    pop = 1.0 / np.arange(1, num_items + 1) ** 0.9
    cum = np.cumsum(pop / pop.sum())
    deg = rng.lognormal(mean=0.0, sigma=1.1, size=num_users)
    deg = np.maximum(1, (deg / deg.sum() * nnz)).astype(np.int64)
    total = int(deg.sum())
    items = np.searchsorted(cum, rng.random(total)).astype(np.int32)
    items = np.minimum(items, num_items - 1)
    vals = (1.0 + rng.integers(0, 5, size=total)).astype(np.float32)

    indptr = np.zeros(num_users + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    rows = np.repeat(np.arange(num_users, dtype=np.int32), deg)
    # colwise orientation
    order = np.argsort(items, kind="stable")
    ckey = rows[order]
    cval = vals[order]
    cindptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(np.bincount(items, minlength=num_items), out=cindptr[1:])
    return {
        "rowwise": {"indptr": indptr, "key": items, "val": vals},
        "colwise": {"indptr": cindptr, "key": ckey, "val": cval},
    }, total


class _ArrayData:
    def __init__(self, groups):
        self.groups = groups

    def get_group(self, g):
        return self.groups[g]


def run_epoch(P, Q, row_batches, col_batches, epoch_fn):
    P, Q, nume, deno = epoch_fn(P, Q, row_batches, col_batches)
    return P, Q


def sync(*arrays):
    """Force completion of everything the arrays depend on.

    block_until_ready is unreliable on the tunneled platform, so read
    back a strided slice of each table — the scatter of the last batch
    feeds it, so this fences the full epoch.
    """
    import jax.numpy as jnp
    return sum(float(jnp.sum(a[::4096, -1])) for a in arrays)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            # never let a "CPU sanity run" contend with the one shared
            # TPU chip (it would corrupt a serialized benchmark job)
            raise RuntimeError(
                f"--smoke could not pin the CPU backend "
                f"(got {jax.default_backend()}); run in a fresh process")
        num_users, num_items, nnz = 5000, 2000, 200_000
    else:
        num_users, num_items, nnz = ML20M_USERS, ML20M_ITEMS, ML20M_NNZ
        # the tunneled TPU backend can hang indefinitely when the
        # service is down; fail loudly after a bounded wait instead
        import threading

        def _watchdog():
            import os
            sys.stderr.write(
                "bench.py: device backend did not initialize within "
                "900 s (TPU service unreachable?) — aborting\n")
            sys.stderr.flush()
            os._exit(3)

        timer = threading.Timer(900.0, _watchdog)
        timer.daemon = True
        timer.start()
        import jax
        jax.devices()  # force backend init under the watchdog
        timer.cancel()

    import jax

    from buffalo_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from functools import partial

    from buffalo_tpu.data.batching import DeviceBatcher
    from buffalo_tpu.ops.als_kernels import als_epoch

    groups, total = synth_ml20m(num_users, num_items, nnz)
    data = _ArrayData(groups)
    batchers = {g: DeviceBatcher(data, g, batch_mb=1024, resident_mb=8192,
                                 d=D)
                for g in ("rowwise", "colwise")}
    # bucket-order range layout: contiguous range updates, no scatter
    from buffalo_tpu.data.batching import build_range_layout, stack_batches
    rb_, cb_ = batchers["rowwise"], batchers["colwise"]
    row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
        rb_.planner, cb_.planner, rb_.key, rb_.val, cb_.key, cb_.val)
    row_batches = tuple(jax.device_put(b) for b in stack_batches(row_b))
    col_batches = tuple(jax.device_put(b) for b in stack_batches(col_b))

    rng = np.random.default_rng(7)
    Pp = np.zeros((u_pad, D), np.float32)
    Pp[u_pos] = np.abs(rng.normal(
        scale=1.0 / D ** 2, size=(num_users, D))).astype(np.float32)
    Qp = np.zeros((i_pad, D), np.float32)
    Qp[i_pos] = np.abs(rng.normal(
        scale=1.0 / D ** 2, size=(num_items, D))).astype(np.float32)
    P = jax.device_put(Pp)
    Q = jax.device_put(Qp)

    epoch_fn = partial(als_epoch, optimizer="manual_cg", alpha=8.0,
                       reg_u=0.1, reg_i=0.1, adaptive_reg=False, cg_iters=3,
                       cg_tol=1e-10, block_size=32, compute_loss=True,
                       num_p_rows=num_users, num_q_rows=num_items)

    # warmup (compiles + resident upload)
    P, Q = run_epoch(P, Q, row_batches, col_batches, epoch_fn)
    sync(P, Q)
    n_epochs = 5
    st = time.perf_counter()
    for _ in range(n_epochs):
        P, Q = run_epoch(P, Q, row_batches, col_batches, epoch_fn)
    sync(P, Q)
    epoch_s = (time.perf_counter() - st) / n_epochs
    print(json.dumps({
        "metric": "als_ml20m_d40_epoch_time" + ("_smoke" if smoke else ""),
        "value": round(epoch_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_EPOCH_S / epoch_s, 2),
    }))


if __name__ == "__main__":
    main()
