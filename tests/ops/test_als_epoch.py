"""Fused epoch + segment-batch correctness vs a numpy reference.

The reference per-row solve (``als.cc:107-209``) builds
``A = Q'Q + alpha Q_u' C Q_u + reg I`` and ``y = Q_u' (1 + alpha v)``;
here the same per-row systems must come out of (a) the padded-batch
path, (b) the chunked segment-sum path for long rows, and (c) the
whole-epoch fused jit — all within float tolerance of numpy.
"""
import numpy as np
import pytest

from buffalo_tpu.data.batching import BatchPlanner, SegmentBatch


def _make_csr(num_rows, num_cols, seed=0, min_deg=1, max_deg=60):
    rng = np.random.default_rng(seed)
    degs = rng.integers(min_deg, max_deg, size=num_rows)
    indptr = np.zeros(num_rows + 1, dtype=np.int64)
    np.cumsum(degs, out=indptr[1:])
    key = rng.integers(0, num_cols, int(indptr[-1])).astype(np.int32)
    val = (1.0 + rng.random(int(indptr[-1]))).astype(np.float32)
    return indptr, key, val


def _numpy_half_epoch(P, Q, indptr, key, val, alpha, reg):
    """Direct per-row normal-equation solve (the reference math)."""
    FF = Q.T @ Q
    d = P.shape[1]
    out = P.copy()
    for u in range(len(indptr) - 1):
        beg, end = indptr[u], indptr[u + 1]
        if beg == end:
            continue
        F = Q[key[beg:end]]
        w = alpha * val[beg:end]
        A = FF + (F * w[:, None]).T @ F + reg * np.eye(d, dtype=np.float32)
        y = F.T @ (1.0 + w)
        out[u] = np.linalg.solve(A, y)
    return out


@pytest.mark.parametrize("max_len", [16, 64])
def test_fused_epoch_matches_numpy(max_len):
    import jax

    from buffalo_tpu.ops.als_kernels import als_epoch

    num_users, num_items, d = 60, 40, 8
    rng = np.random.default_rng(3)
    # rowwise CSR with one deliberately long row (degree > max_len)
    indptr, key, val = _make_csr(num_users, num_items, seed=1, max_deg=30)
    long_deg = max_len * 3 + 5
    extra_cols = rng.integers(0, num_items, long_deg).astype(np.int32)
    extra_vals = (1.0 + rng.random(long_deg)).astype(np.float32)
    key = np.concatenate([key[:indptr[-2]], extra_cols])
    val = np.concatenate([val[:indptr[-2]], extra_vals])
    indptr[-1] = indptr[-2] + long_deg

    # colwise orientation of the same interactions
    rows = np.repeat(np.arange(num_users, dtype=np.int32), np.diff(indptr))
    order = np.argsort(key, kind="stable")
    ckey, cval = rows[order], val[order]
    cindptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(np.bincount(key, minlength=num_items), out=cindptr[1:])

    P0 = rng.normal(size=(num_users, d)).astype(np.float32) * 0.1
    Q0 = rng.normal(size=(num_items, d)).astype(np.float32) * 0.1
    alpha, reg = 4.0, 0.05

    # numpy reference: rowwise half then colwise half
    P_ref = _numpy_half_epoch(P0, Q0, indptr, key, val, alpha, reg)
    Q_ref = _numpy_half_epoch(Q0, P_ref, cindptr, ckey, cval, alpha, reg)

    rp = BatchPlanner(indptr, entries_per_batch=512, max_len=max_len)
    cp = BatchPlanner(cindptr, entries_per_batch=512, max_len=max_len)
    rb = tuple(rp.iter_batches(key, val))
    cb = tuple(cp.iter_batches(ckey, cval))
    assert any(isinstance(b, SegmentBatch) for b in rb), \
        "long row must take the segment path"

    P, Q, nume, deno = als_epoch(
        jax.device_put(P0), jax.device_put(Q0), rb, cb,
        optimizer="llt", alpha=alpha, reg_u=reg, reg_i=reg,
        adaptive_reg=False, cg_iters=3, cg_tol=1e-10, block_size=8,
        compute_loss=True)
    np.testing.assert_allclose(np.asarray(P), P_ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Q), Q_ref, rtol=2e-3, atol=2e-4)
    assert np.isfinite(float(nume)) and float(deno) > 0


def test_segment_vs_padded_same_stats():
    """A row split into chunks must solve to the same factors."""
    import jax

    from buffalo_tpu.ops.als_kernels import als_epoch

    num_items, d = 32, 8
    rng = np.random.default_rng(5)
    deg = 50
    indptr = np.array([0, deg], dtype=np.int64)
    key = rng.integers(0, num_items, deg).astype(np.int32)
    val = (1.0 + rng.random(deg)).astype(np.float32)
    P0 = rng.normal(size=(1, d)).astype(np.float32)
    Q0 = rng.normal(size=(num_items, d)).astype(np.float32)

    outs = []
    for max_len in (8, 16, 64):  # 8/16 -> segment path, 64 -> padded
        planner = BatchPlanner(indptr, entries_per_batch=512,
                               max_len=max_len)
        rb = tuple(planner.iter_batches(key, val))
        P, _, _, _ = als_epoch(
            jax.device_put(P0), jax.device_put(Q0), rb, (),
            optimizer="llt", alpha=4.0, reg_u=0.05, reg_i=0.05,
            adaptive_reg=False, cg_iters=3, cg_tol=1e-10, block_size=8,
            compute_loss=False)
        outs.append(np.asarray(P))
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outs[1], outs[2], rtol=1e-4, atol=1e-5)


def test_stacked_groups_match_flat():
    """lax.scan over shape-stacked batches == flat batch list."""
    import jax

    from buffalo_tpu.data.batching import stack_batches
    from buffalo_tpu.ops.als_kernels import als_epoch

    num_users, num_items, d = 64, 40, 8
    rng = np.random.default_rng(9)
    indptr, key, val = _make_csr(num_users, num_items, seed=2,
                                 min_deg=3, max_deg=12)
    planner = BatchPlanner(indptr, entries_per_batch=64, max_len=64)
    flat = tuple(planner.iter_batches(key, val))
    stacked = tuple(stack_batches(flat))
    assert len(stacked) < len(flat), "fixture must exercise stacking"

    P0 = rng.normal(size=(num_users, d)).astype(np.float32) * 0.1
    Q0 = rng.normal(size=(num_items, d)).astype(np.float32) * 0.1
    kw = dict(optimizer="manual_cg", alpha=4.0, reg_u=0.05, reg_i=0.05,
              adaptive_reg=False, cg_iters=3, cg_tol=1e-10, block_size=8,
              compute_loss=True)
    P1, _, n1, d1 = als_epoch(jax.device_put(P0), jax.device_put(Q0),
                              flat, (), **kw)
    P2, _, n2, d2 = als_epoch(jax.device_put(P0), jax.device_put(Q0),
                              stacked, (), **kw)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(n1), float(n2), rtol=1e-5)


def test_range_layout_matches_flat():
    """Permuted contiguous-range epoch == plain scatter epoch."""
    import jax

    from buffalo_tpu.data.batching import build_range_layout
    from buffalo_tpu.ops.als_kernels import als_epoch

    num_users, num_items, d = 70, 40, 8
    rng = np.random.default_rng(11)
    indptr, key, val = _make_csr(num_users, num_items, seed=4,
                                 min_deg=0, max_deg=40)
    # add a long row to exercise the remapped segment path
    long_deg = 60
    key = np.concatenate([key[:indptr[-2]],
                          rng.integers(0, num_items,
                                       long_deg).astype(np.int32)])
    val = np.concatenate([val[:indptr[-2]],
                          (1.0 + rng.random(long_deg)).astype(np.float32)])
    indptr[-1] = indptr[-2] + long_deg
    rows = np.repeat(np.arange(num_users, dtype=np.int32), np.diff(indptr))
    order = np.argsort(key, kind="stable")
    ckey, cval = rows[order], val[order]
    cindptr = np.zeros(num_items + 1, dtype=np.int64)
    np.cumsum(np.bincount(key, minlength=num_items), out=cindptr[1:])

    P0 = rng.normal(size=(num_users, d)).astype(np.float32) * 0.1
    Q0 = rng.normal(size=(num_items, d)).astype(np.float32) * 0.1
    kw = dict(optimizer="manual_cg", alpha=4.0, reg_u=0.05, reg_i=0.05,
              adaptive_reg=False, cg_iters=3, cg_tol=1e-10, block_size=8,
              compute_loss=True)

    rp = BatchPlanner(indptr, entries_per_batch=256, max_len=32)
    cp = BatchPlanner(cindptr, entries_per_batch=256, max_len=32)
    # flat reference
    rb = tuple(rp.iter_batches(key, val))
    cb = tuple(cp.iter_batches(ckey, cval))
    P1, Q1, n1, d1 = als_epoch(jax.device_put(P0), jax.device_put(Q0),
                               rb, cb, **kw)

    # range layout
    row_b, col_b, u_pos, i_pos, u_pad, i_pad = build_range_layout(
        rp, cp, key, val, ckey, cval)
    Pp = np.zeros((u_pad, d), np.float32)
    Pp[u_pos] = P0
    Qp = np.zeros((i_pad, d), np.float32)
    Qp[i_pos] = Q0
    P2p, Q2p, n2, d2 = als_epoch(
        jax.device_put(Pp), jax.device_put(Qp), tuple(row_b),
        tuple(col_b), num_p_rows=num_users, num_q_rows=num_items, **kw)
    P2 = np.asarray(P2p)[u_pos]
    Q2 = np.asarray(Q2p)[i_pos]
    np.testing.assert_allclose(np.asarray(P1), P2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Q1), Q2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(n1), float(n2), rtol=1e-4)
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-5)
