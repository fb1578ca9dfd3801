"""Element-wise ALS (eALS) coordinate-descent kernels.

Counterpart of ``lib/algo_impl/eals/eals.cc`` (He et al., Fast Matrix
Factorization for Online Recommendation with Implicit Feedback): the
per-dimension closed-form updates with popularity-weighted negative
feedback ``C_i`` and per-nnz residual caches.  The C++ core walks rows
on OpenMP threads mutating two cross-indexed vhat caches
(``eals.cc:49-100``); here a single residual vector in rowwise order
plus a rowwise->colwise permutation replaces the cross-index maps, and
each of the D sequential dimension updates is one fully vectorized
pass over all nnz (gather + segment-sum + scatter), with the dense
negative-feedback term coming from the gramians ``Sq = (C^0.5 Q)^T
(C^0.5 Q)`` / ``Sp = P^T P`` (eals.cc:182-279).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_rows", "alpha", "reg"))
def eals_half_epoch(X, Y, vhat, row_ids, keys, vals, c_nnz, c_row, S,
                    *, num_rows, alpha, reg):
    """Update every row of X along each dimension sequentially.

    X: (num_rows, D) side being updated; Y: fixed side; vhat: per-nnz
    residual cache in X's row-major nnz order; row_ids/keys/vals: COO
    of that orientation; c_nnz: negative weight per nnz (C[item]);
    c_row: per-row dense-term weight (ones for the user side, C for
    the item side); S: the fixed side's weighted gramian.

    Returns (X_new, vhat_new).  Math per dimension d (eals.cc:202-236):
      num = sum_nnz (w v - (w - C)(vhat - x_d y_d)) y_d
            - c_row (x . S[:, d] - x_d S[d, d])
      den = sum_nnz (w - C) y_d^2 + c_row S[d, d] + reg
      x_d <- num / den ; vhat <- vhat - old + new
    """
    D = X.shape[1]
    w = 1.0 + alpha * vals
    wmc = w - c_nnz
    wv = w * vals

    def body(d, carry):
        X, vhat = carry
        x_col = jax.lax.dynamic_slice_in_dim(X, d, 1, axis=1)[:, 0]
        y_col = jax.lax.dynamic_slice_in_dim(Y, d, 1, axis=1)[:, 0]
        y_d = jnp.take(y_col, keys)
        x_d = jnp.take(x_col, row_ids)
        pq = x_d * y_d
        vf = vhat - pq
        num_nnz = jax.ops.segment_sum((wv - wmc * vf) * y_d, row_ids,
                                      num_segments=num_rows)
        den_nnz = jax.ops.segment_sum(wmc * y_d * y_d, row_ids,
                                      num_segments=num_rows)
        S_col = jax.lax.dynamic_slice_in_dim(S, d, 1, axis=1)[:, 0]
        S_dd = jnp.take(S_col, d)
        dense = X @ S_col - x_col * S_dd
        num = num_nnz - c_row * dense
        den = den_nnz + c_row * S_dd + reg
        x_new = num / den
        vhat = vf + jnp.take(x_new, row_ids) * y_d
        X = jax.lax.dynamic_update_slice_in_dim(
            X, x_new[:, None], d, axis=1)
        return X, vhat

    return jax.lax.fori_loop(0, D, body, (X, vhat))


def _eals_dim_sweep(p, F, vals, cvals, c_row, lens, S, *, alpha, reg):
    """Coordinate descent over all D dimensions for a padded row block.

    p: (B, d) rows being updated; F: (B, L, d) gathered fixed-side
    rows; cvals: (B, L) per-entry negative weights (broadcastable);
    c_row: (B,) dense-term weights; S: fixed-side weighted gramian.

    The whole sweep is dense masked arithmetic on (B, L) blocks — the
    residual cache ``vhat`` lives in registers/HBM as one (B, L) array
    and every per-row reduction is a lane-wise sum, so the
    scatter-floor that bound the COO formulation (one segment-sum per
    dimension over all nnz) never appears.  Math per dimension matches
    ``eals.cc:202-236``.
    """
    B, L = vals.shape
    D = p.shape[1]
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
            < lens[:, None]).astype(jnp.float32)
    w = (1.0 + alpha * vals) * mask
    wv = w * vals
    wmc = w - cvals * mask
    vhat = jnp.einsum("bd,bld->bl", p, F,
                      preferred_element_type=jnp.float32) * mask

    def body(dim, carry):
        p, vhat = carry
        y_d = jax.lax.dynamic_slice_in_dim(F, dim, 1, axis=2)[:, :, 0]
        x_d = jax.lax.dynamic_slice_in_dim(p, dim, 1, axis=1)[:, 0]
        vf = vhat - x_d[:, None] * y_d
        num_nnz = jnp.sum((wv - wmc * vf) * y_d, axis=1)
        den_nnz = jnp.sum(wmc * y_d * y_d, axis=1)
        S_col = jax.lax.dynamic_slice_in_dim(S, dim, 1, axis=1)[:, 0]
        S_dd = jnp.take(S_col, dim)
        dense = p @ S_col - x_d * S_dd
        x_new = (num_nnz - c_row * dense) / (den_nnz + c_row * S_dd + reg)
        vhat = vf + x_new[:, None] * y_d
        p = jax.lax.dynamic_update_slice_in_dim(p, x_new[:, None], dim,
                                                axis=1)
        return p, vhat

    p, _ = jax.lax.fori_loop(0, D, body, (p, vhat))
    return p


def _eals_segment_sweep(p, Q, batch, cvals, c_row, S, *, alpha, reg):
    """Coordinate descent for long rows arriving as fixed-width chunks.

    Per-row statistics are accumulated with one small segment-sum per
    dimension over the CHUNKS (a few hundred rows), not over all nnz.
    """
    R, D = p.shape
    Nc, C = batch.vals.shape
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :]
            < batch.chunk_lens[:, None]).astype(jnp.float32)
    F = jnp.take(Q, batch.cols, axis=0)                   # (Nc, C, d)
    vals = batch.vals
    w = (1.0 + alpha * vals) * mask
    wv = w * vals
    wmc = w - cvals * mask
    seg = jnp.minimum(batch.seg_ids, R)

    def chunk_rows(x_col):  # (R,) -> (Nc,) via seg gather with pad 0
        return jnp.take(jnp.append(x_col, 0.0), seg)

    p0_chunk = jnp.take(jnp.vstack([p, jnp.zeros((1, D), p.dtype)]),
                        seg, axis=0)
    vhat = jnp.einsum("ncd,nd->nc", F, p0_chunk,
                      preferred_element_type=jnp.float32) * mask

    def body(dim, carry):
        p, vhat = carry
        y_d = jax.lax.dynamic_slice_in_dim(F, dim, 1, axis=2)[:, :, 0]
        x_row = jax.lax.dynamic_slice_in_dim(p, dim, 1, axis=1)[:, 0]
        x_d = chunk_rows(x_row)
        vf = vhat - x_d[:, None] * y_d
        num = jax.ops.segment_sum(
            jnp.sum((wv - wmc * vf) * y_d, axis=1), seg,
            num_segments=R + 1)[:R]
        den = jax.ops.segment_sum(
            jnp.sum(wmc * y_d * y_d, axis=1), seg,
            num_segments=R + 1)[:R]
        S_col = jax.lax.dynamic_slice_in_dim(S, dim, 1, axis=1)[:, 0]
        S_dd = jnp.take(S_col, dim)
        dense = p @ S_col - x_row * S_dd
        x_new = (num - c_row * dense) / (den + c_row * S_dd + reg)
        vhat = vf + chunk_rows(x_new)[:, None] * y_d
        p = jax.lax.dynamic_update_slice_in_dim(p, x_new[:, None], dim,
                                                axis=1)
        return p, vhat

    p, _ = jax.lax.fori_loop(0, D, body, (p, vhat))
    return p


def _eals_apply_batch(X, Y, C_other, c_self, S, batch, *, item_axis,
                      alpha, reg):
    """Update table X with one RangeBatch/SegmentBatch (permuted space).

    C_other: negative weights in the FIXED side's permuted positions
    (used by the user pass, gathered per entry); c_self: weights in
    X's own permuted positions (used by the item pass as the per-row
    dense/entry weight).  One of the two drives each pass.
    """
    from buffalo_tpu.data.batching import RangeBatch, SegmentBatch

    if isinstance(batch, RangeBatch):
        B = batch.lens.shape[0]
        p = jax.lax.dynamic_slice_in_dim(X, batch.row_start, B, axis=0)
        F = jnp.take(Y, batch.cols, axis=0)
        if item_axis:
            c_row = jax.lax.dynamic_slice_in_dim(c_self, batch.row_start,
                                                 B, axis=0)
            cvals = c_row[:, None] * jnp.ones_like(batch.vals)
        else:
            c_row = jnp.ones((B,), jnp.float32)
            cvals = jnp.take(C_other, batch.cols)
        x = _eals_dim_sweep(p, F, batch.vals, cvals, c_row, batch.lens, S,
                            alpha=alpha, reg=reg)
        return jax.lax.dynamic_update_slice_in_dim(X, x, batch.row_start,
                                                   axis=0)
    assert isinstance(batch, SegmentBatch)
    safe = jnp.minimum(batch.rows, X.shape[0] - 1)
    p = jnp.take(X, safe, axis=0)
    if item_axis:
        c_row = jnp.where(batch.lens > 0, jnp.take(c_self, safe), 0.0)
        cvals = jnp.take(c_row, jnp.minimum(batch.seg_ids,
                                            len(batch.rows) - 1))[:, None] \
            * jnp.ones_like(batch.vals)
    else:
        c_row = jnp.ones((p.shape[0],), jnp.float32)
        cvals = jnp.take(C_other, batch.cols)
    x = _eals_segment_sweep(p, Y, batch, cvals, c_row, S,
                            alpha=alpha, reg=reg)
    return X.at[batch.rows].set(x, mode="drop")


def _eals_apply_group(X, Y, C_other, c_self, S, group, **kw):
    """Scan over a same-shape stack of batches (leading axis)."""
    from buffalo_tpu.data.batching import RangeBatch

    flat = (group.lens.ndim == 1 if isinstance(group, RangeBatch)
            else group.rows.ndim == 1)
    if flat:
        return _eals_apply_batch(X, Y, C_other, c_self, S, group, **kw)

    def body(X, b):
        return _eals_apply_batch(X, Y, C_other, c_self, S, b, **kw), None

    X, _ = jax.lax.scan(body, X, group)
    return X


@partial(jax.jit, static_argnames=("item_axis", "alpha", "reg"),
         donate_argnums=(0,))
def eals_group_step(X, Y, C_perm, S, group, *, item_axis, alpha, reg):
    """One stacked same-shape group per dispatch (the 730M-scale
    variant: bounds XLA temp live-set like ALS's als_group_step)."""
    return _eals_apply_group(
        X, Y, None if item_axis else C_perm,
        C_perm if item_axis else None, S, group,
        item_axis=item_axis, alpha=alpha, reg=reg)


@jax.jit
def eals_gramian(T, C_perm=None):
    """Sq = (C^0.5 Q)^T (C^0.5 Q) or Sp = P^T P as one dispatch."""
    if C_perm is not None:
        T = T * jnp.sqrt(C_perm)[:, None]
    return jnp.dot(T.T, T, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("mesh", "axis_name", "alpha",
                                   "reg_u", "reg_i"),
         donate_argnums=(0, 1))
def eals_epoch_sharded_range(P, Q, row_groups, col_groups, row_segments,
                             col_segments, C_perm, *, mesh, axis_name,
                             alpha, reg_u, reg_i):
    """One eALS epoch over a device mesh, per-shard range layout.

    TPU-native replacement for the reference's OpenMP row loop
    (``eals.cc:201``) at multi-chip scale, mirroring
    ``als_epoch_sharded_range``: tables (and the item negative-weight
    vector ``C_perm``) row-shard over the mesh in the per-shard bucket
    order of ``build_sharded_range_layout``; each half all-gathers the
    fixed side over ICI (the user pass also gathers ``C_perm``, whose
    entries are read at fixed-side positions) and runs the dimension
    sweeps on contiguous LOCAL ranges.  The weighted gramians Sq/Sp
    are computed eagerly on the sharded tables (GSPMD all-reduce) and
    enter shard_map replicated.  Long rows (SegmentBatch, global ids)
    update outside shard_map with GSPMD gather/scatter.
    """
    from jax.sharding import PartitionSpec as PS

    def sharded_half(A, Bf, C_sh, S, groups, *, item_axis, reg):
        if not groups:
            return A

        def body(A_loc, Bf_loc, C_loc, S, *groups_loc):
            Bf_full = jax.lax.all_gather(Bf_loc, axis_name, axis=0,
                                         tiled=True)
            if item_axis:
                C_other, c_self = None, C_loc  # local A positions
            else:
                C_other = jax.lax.all_gather(C_loc, axis_name, axis=0,
                                             tiled=True)
                c_self = None
            for g in groups_loc:
                g = jax.tree.map(lambda x: x[0], g)
                A_loc = _eals_apply_group(
                    A_loc, Bf_full, C_other, c_self, S, g,
                    item_axis=item_axis, alpha=alpha, reg=reg)
            return A_loc

        specs = tuple(jax.tree.map(lambda _: PS(axis_name), g)
                      for g in groups)
        run = jax.shard_map(
            body, mesh=mesh,
            in_specs=(PS(axis_name), PS(axis_name), PS(axis_name),
                      PS()) + specs,
            out_specs=PS(axis_name), check_vma=False)
        return run(A, Bf, C_sh, S, *groups)

    Sq = eals_gramian(Q, C_perm)  # GSPMD reduces the partial products
    P = sharded_half(P, Q, C_perm, Sq, row_groups, item_axis=False,
                     reg=reg_u)
    for sb in row_segments:
        P = _eals_apply_batch(P, Q, C_perm, None, Sq, sb,
                              item_axis=False, alpha=alpha, reg=reg_u)
    Sp = eals_gramian(P)
    Q = sharded_half(Q, P, C_perm, Sp, col_groups, item_axis=True,
                     reg=reg_i)
    for sb in col_segments:
        Q = _eals_apply_batch(Q, P, None, C_perm, Sp, sb,
                              item_axis=True, alpha=alpha, reg=reg_i)
    return P, Q


@partial(jax.jit, static_argnames=("alpha", "reg_u", "reg_i"),
         donate_argnums=(0, 1))
def eals_epoch(P, Q, row_groups, col_groups, C_perm, *, alpha, reg_u,
               reg_i):
    """One full eALS epoch (user pass + item pass) in ONE dispatch.

    Tables and batches live in the bucket-order permuted space of
    ``build_range_layout``; ``C_perm`` holds the negative weights at
    the permuted ITEM positions (zero on padding).  ``Sq/Sp`` are
    recomputed before each half like the reference (``eals.cc:182,
    240``); the per-nnz residual caches are recomputed per batch from
    the current factors, which is exactly their invariant.
    """
    CQ = Q * jnp.sqrt(C_perm)[:, None]
    Sq = jnp.dot(CQ.T, CQ, preferred_element_type=jnp.float32)
    for g in row_groups:
        P = _eals_apply_group(P, Q, C_perm, None, Sq, g,
                              item_axis=False, alpha=alpha, reg=reg_u)
    Sp = jnp.dot(P.T, P, preferred_element_type=jnp.float32)
    for g in col_groups:
        Q = _eals_apply_group(Q, P, None, C_perm, Sp, g,
                              item_axis=True, alpha=alpha, reg=reg_i)
    return P, Q


@partial(jax.jit, static_argnames=("alpha",))
def eals_loss(P, Q, vhat, row_ids, keys, vals, C, reg_u, reg_i, *, alpha):
    """RMSE + total loss with negative feedback (eals.cc:117-180).

    loss = sum w err^2 - sum C_i vhat^2 + <P^T P, Q^T C Q>
           + reg_u |P|^2 + reg_i |Q|^2
    """
    w = 1.0 + alpha * vals
    err = vals - vhat
    c_i = jnp.take(C, keys)
    feedbacks = jnp.sum(w * err * err) - jnp.sum(c_i * vhat * vhat)
    sq_err = jnp.sum(err * err)

    CQ = Q * jnp.sqrt(C)[:, None]
    Sp = P.T @ P
    Sq = CQ.T @ CQ
    feedbacks = feedbacks + jnp.sum(Sp * Sq)
    reg = reg_u * jnp.sum(P * P) + reg_i * jnp.sum(Q * Q)
    rmse = jnp.sqrt(sq_err / vals.shape[0])
    return rmse, feedbacks + reg


@jax.jit
def compute_vhat(P, Q, row_ids, keys):
    """Per-nnz predictions p_u . q_i (cache precompute, eals.cc:66-80).

    Chunked: a one-shot gather materializes (nnz, d) tensors that TPU
    lane-pads to (nnz, 128) — 10 GB at 20M nnz, d=16.  Processing
    2^20-entry chunks bounds the padded temporaries at ~0.5 GB.
    """
    n = row_ids.shape[0]
    chunk = 1 << 20
    if n <= chunk:
        return jnp.sum(jnp.take(P, row_ids, axis=0)
                       * jnp.take(Q, keys, axis=0), axis=-1)
    k = n // chunk

    def body(i, out):
        r = jax.lax.dynamic_slice_in_dim(row_ids, i * chunk, chunk, 0)
        c = jax.lax.dynamic_slice_in_dim(keys, i * chunk, chunk, 0)
        v = jnp.sum(jnp.take(P, r, axis=0) * jnp.take(Q, c, axis=0),
                    axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(out, v, i * chunk, 0)

    out = jax.lax.fori_loop(0, k, body, jnp.zeros((n,), jnp.float32))
    if n - k * chunk:
        r = jax.lax.slice_in_dim(row_ids, k * chunk, n, axis=0)
        c = jax.lax.slice_in_dim(keys, k * chunk, n, axis=0)
        v = jnp.sum(jnp.take(P, r, axis=0) * jnp.take(Q, c, axis=0),
                    axis=-1)
        out = jax.lax.dynamic_update_slice_in_dim(out, v, k * chunk, 0)
    return out
