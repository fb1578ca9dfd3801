"""CoFactor (CFR) joint-factorization batch kernels.

Counterpart of ``lib/algo_impl/cfr/cfr.cc``: the three-phase epoch —
user update (weighted implicit ALS scaled by ``l``, cfr.cc:92-150),
item update coupling the user-side implicit term with the SPPMI-side
explicit term and item/context biases plus a closed-form bias update
(cfr.cc:152-253), and context update over SPPMI only (cfr.cc:255-314).
Per-row OpenMP solves become padded-batch einsums + batched solves,
as in ops/als_kernels.

Reference: Liang et al., Factorization Meets the Item Embedding
(RecSys 2016).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from buffalo_tpu.ops.solve import solve


def _mask(lens, L):
    return (jnp.arange(L, dtype=jnp.int32)[None, :]
            < lens[:, None]).astype(jnp.float32)


def _implicit_terms(F, vals, mask, alpha):
    """A_data = sum alpha v f f^T, y = sum (1 + alpha v) f (masked).

    A uses the sqrt-scaled symmetric form (Fs = F * sqrt(w);
    A = Fs^T Fs): one scaled (B, L, d) operand feeds the einsum twice
    instead of reading a scaled copy AND the raw gather (w >= 0
    always: alpha * vals * {0,1} mask)."""
    w = vals * alpha * mask
    Fs = F * jnp.sqrt(w)[:, :, None]
    A = jnp.einsum("bld,ble->bde", Fs, Fs,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bld,bl->bd", F, (1.0 + w) * mask,
                   preferred_element_type=jnp.float32)
    return A, y, w


@partial(jax.jit, static_argnames=("alpha", "l", "reg_u", "optimizer",
                                   "cg_iters", "cg_tol", "compute_loss"),
         donate_argnums=(0,))
def cfr_user_step(U, I, FF, rows, lens, cols, vals, *, alpha, l, reg_u,
                  optimizer, cg_iters, cg_tol, compute_loss):
    return _cfr_user_body(U, I, FF, rows, lens, cols, vals, alpha=alpha,
                          l=l, reg_u=reg_u, optimizer=optimizer,
                          cg_iters=cg_iters, cg_tol=cg_tol,
                          compute_loss=compute_loss)


def _cfr_user_body(U, I, FF, rows, lens, cols, vals, *, alpha, l, reg_u,
                   optimizer, cg_iters, cg_tol, compute_loss):
    """User phase: A = l (FF + sum a v i i^T) + reg_u, y = l sum (1+av) i."""
    B, L = vals.shape
    mask = _mask(lens, L)
    row_mask = (lens > 0).astype(jnp.float32)
    safe_rows = jnp.minimum(rows, U.shape[0] - 1)
    u = jnp.take(U, safe_rows, axis=0)
    F = jnp.take(I, cols, axis=0)

    A, y, _ = _implicit_terms(F, vals, mask, alpha)
    d = U.shape[1]
    A = l * (FF[None] + A) + reg_u * jnp.eye(d, dtype=U.dtype)[None]
    y = l * y
    x = solve(A, y, u, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, u)
    U = U.at[rows].set(x, mode="drop")
    loss = (reg_u * jnp.sum(row_mask * jnp.sum(x * x, axis=-1))
            if compute_loss else jnp.zeros((), jnp.float32))
    return U, loss


@partial(jax.jit, static_argnames=("alpha", "l", "reg_i", "optimizer",
                                   "cg_iters", "cg_tol", "compute_loss"),
         donate_argnums=(0, 3))
def cfr_item_step(I, U, C, Ib, Cb, FF, rows,
                  lens_u, cols_u, vals_u, lens_c, cols_c, vals_c,
                  *, alpha, l, reg_i, optimizer, cg_iters, cg_tol,
                  compute_loss):
    return _cfr_item_body(I, U, C, Ib, Cb, FF, rows, lens_u, cols_u,
                          vals_u, lens_c, cols_c, vals_c, alpha=alpha,
                          l=l, reg_i=reg_i, optimizer=optimizer,
                          cg_iters=cg_iters, cg_tol=cg_tol,
                          compute_loss=compute_loss)


def _cfr_item_body(I, U, C, Ib, Cb, FF, rows,
                   lens_u, cols_u, vals_u, lens_c, cols_c, vals_c,
                   *, alpha, l, reg_i, optimizer, cg_iters, cg_tol,
                   compute_loss):
    """Item phase: implicit user term + explicit SPPMI term + biases."""
    B, Lu = vals_u.shape
    _, Lc = vals_c.shape
    mask_u = _mask(lens_u, Lu)
    mask_c = _mask(lens_c, Lc)
    row_mask = ((lens_u + lens_c) > 0).astype(jnp.float32)
    safe_rows = jnp.minimum(rows, I.shape[0] - 1)
    i_vec = jnp.take(I, safe_rows, axis=0)

    Fu = jnp.take(U, cols_u, axis=0)            # (B, Lu, d)
    A, y, w = _implicit_terms(Fu, vals_u, mask_u, alpha)
    A = l * (FF[None] + A)
    y = l * y

    if compute_loss:
        dots = jnp.einsum("bd,bld->bl", i_vec, Fu,
                          preferred_element_type=jnp.float32)
        iFFi = jnp.einsum("bd,de,be->b", i_vec, FF, i_vec,
                          preferred_element_type=jnp.float32)
        pos = mask_u * (-dots * dots + (1.0 + w) * (dots - 1.0) ** 2)
        loss_u = l * jnp.sum(row_mask * (iFFi + jnp.sum(pos, axis=-1)))
    else:
        loss_u = jnp.zeros((), jnp.float32)

    # SPPMI explicit side: coeff = v - Ib_x - Cb_c
    Fc = jnp.take(C, cols_c, axis=0)            # (B, Lc, d)
    ib = jnp.take(Ib, safe_rows)
    cb = jnp.take(Cb, cols_c)                   # (B, Lc)
    coeff = (vals_c - ib[:, None] - cb) * mask_c
    A = A + jnp.einsum("bld,ble,bl->bde", Fc, Fc, mask_c,
                       preferred_element_type=jnp.float32)
    y = y + jnp.einsum("bld,bl->bd", Fc, coeff,
                       preferred_element_type=jnp.float32)

    if compute_loss:
        pred = jnp.einsum("bd,bld->bl", i_vec, Fc,
                          preferred_element_type=jnp.float32)
        err = (vals_c - pred - ib[:, None] - cb) * mask_c
        loss_c = jnp.sum(row_mask * jnp.sum(err * err, axis=-1))
        loss_reg = reg_i * jnp.sum(row_mask * jnp.sum(i_vec * i_vec,
                                                      axis=-1))
    else:
        loss_c = loss_reg = jnp.zeros((), jnp.float32)

    d = I.shape[1]
    A = A + reg_i * jnp.eye(d, dtype=I.dtype)[None]
    x = solve(A, y, i_vec, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, i_vec)
    I = I.at[rows].set(x, mode="drop")

    # closed-form bias: Ib_x = mean_c (v - i_new . c - Cb_c) (cfr.cc:243-251)
    pred_new = jnp.einsum("bd,bld->bl", x, Fc,
                          preferred_element_type=jnp.float32)
    b = jnp.sum((vals_c - pred_new - cb) * mask_c, axis=-1)
    # unconditional like the reference (cfr.cc:243-251): an updated
    # item with zero SPPMI entries gets Ib = 0/(0+eps) = 0, not its
    # stale bias
    new_ib = b / (lens_c.astype(jnp.float32) + 1e-10)
    Ib = Ib.at[rows].set(jnp.where(row_mask > 0, new_ib, ib), mode="drop")
    return I, Ib, loss_u + loss_c + loss_reg


def _segment_stats(F, mask, seg, R, *, weights=None):
    """Per-row A = sum w f f^T and masked helpers via segment-sum.

    F: (Nc, C, d) gathered chunks; weights: optional (Nc, C) entry
    weights for A (defaults to the mask).  Returns A (R, d, d).
    """
    Nc, Cw, d = F.shape
    w = mask if weights is None else weights
    Fw = F * w[:, :, None]
    A_chunk = jnp.einsum("ncd,nce->nde", Fw, F,
                         preferred_element_type=jnp.float32)
    return jax.ops.segment_sum(A_chunk.reshape(Nc, d * d), seg,
                               num_segments=R + 1)[:R].reshape(R, d, d)


def _seg_rows(x, seg, R):
    """Gather per-row values to chunks ((R,) or (R,d) -> per-chunk)."""
    if x.ndim == 1:
        return jnp.take(jnp.append(x, 0.0), jnp.minimum(seg, R))
    pad = jnp.zeros((1, x.shape[1]), x.dtype)
    return jnp.take(jnp.vstack([x, pad]), jnp.minimum(seg, R), axis=0)


def _cfr_user_segment_body(U, I, FF, sb, *, alpha, l, reg_u, optimizer,
                           cg_iters, cg_tol, compute_loss):
    """User phase for long rows (chunked normal-equation statistics)."""
    R = sb.rows.shape[0]
    Nc, Cw = sb.vals.shape
    mask = _mask(sb.chunk_lens, Cw)
    row_mask = (sb.lens > 0).astype(jnp.float32)
    safe_rows = jnp.minimum(sb.rows, U.shape[0] - 1)
    u = jnp.take(U, safe_rows, axis=0)
    F = jnp.take(I, sb.cols, axis=0)
    seg = sb.seg_ids

    w = sb.vals * alpha * mask
    A_data = _segment_stats(F, mask, seg, R, weights=w)
    y_chunk = jnp.einsum("ncd,nc->nd", F, (1.0 + w) * mask,
                         preferred_element_type=jnp.float32)
    y = jax.ops.segment_sum(y_chunk, seg, num_segments=R + 1)[:R]

    d = U.shape[1]
    A = l * (FF[None] + A_data) + reg_u * jnp.eye(d, dtype=U.dtype)[None]
    x = solve(A, l * y, u, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, u)
    U = U.at[sb.rows].set(x, mode="drop")
    loss = (reg_u * jnp.sum(row_mask * jnp.sum(x * x, axis=-1))
            if compute_loss else jnp.zeros((), jnp.float32))
    return U, loss


def _cfr_item_segment_body(I, U, C, Ib, Cb, FF, sb_u, sb_c, *, alpha, l,
                           reg_i, optimizer, cg_iters, cg_tol,
                           compute_loss):
    """Item phase for long rows: both the colwise (implicit) and SPPMI
    (explicit) sides arrive as chunk sets over the SAME row list."""
    R = sb_u.rows.shape[0]
    d = I.shape[1]
    safe_rows = jnp.minimum(sb_u.rows, I.shape[0] - 1)
    i_vec = jnp.take(I, safe_rows, axis=0)
    row_mask = ((sb_u.lens + sb_c.lens) > 0).astype(jnp.float32)

    # implicit user side
    Nu, Cu = sb_u.vals.shape
    mask_u = _mask(sb_u.chunk_lens, Cu)
    Fu = jnp.take(U, sb_u.cols, axis=0)
    w = sb_u.vals * alpha * mask_u
    A_u = _segment_stats(Fu, mask_u, sb_u.seg_ids, R, weights=w)
    y_u = jax.ops.segment_sum(
        jnp.einsum("ncd,nc->nd", Fu, (1.0 + w) * mask_u,
                   preferred_element_type=jnp.float32),
        sb_u.seg_ids, num_segments=R + 1)[:R]

    # explicit SPPMI side
    Nc_, Cc = sb_c.vals.shape
    mask_c = _mask(sb_c.chunk_lens, Cc)
    Fc = jnp.take(C, sb_c.cols, axis=0)
    ib = jnp.take(Ib, safe_rows)
    ib_c = _seg_rows(ib, sb_c.seg_ids, R)
    cb = jnp.take(Cb, sb_c.cols)
    coeff = (sb_c.vals - ib_c[:, None] - cb) * mask_c
    A_c = _segment_stats(Fc, mask_c, sb_c.seg_ids, R)
    y_c = jax.ops.segment_sum(
        jnp.einsum("ncd,nc->nd", Fc, coeff,
                   preferred_element_type=jnp.float32),
        sb_c.seg_ids, num_segments=R + 1)[:R]

    if compute_loss:
        i_u = _seg_rows(i_vec, sb_u.seg_ids, R)
        dots = jnp.einsum("ncd,nd->nc", Fu, i_u,
                          preferred_element_type=jnp.float32)
        pos = mask_u * (-dots * dots + (1.0 + w) * (dots - 1.0) ** 2)
        iFFi = jnp.einsum("rd,de,re->r", i_vec, FF, i_vec,
                          preferred_element_type=jnp.float32)
        loss_u = l * (jnp.sum(row_mask * iFFi) + jnp.sum(pos))
        i_c = _seg_rows(i_vec, sb_c.seg_ids, R)
        pred = jnp.einsum("ncd,nd->nc", Fc, i_c,
                          preferred_element_type=jnp.float32)
        err = (sb_c.vals - pred - ib_c[:, None] - cb) * mask_c
        loss_c = jnp.sum(err * err)
        loss_reg = reg_i * jnp.sum(row_mask * jnp.sum(i_vec * i_vec,
                                                      axis=-1))
        loss = loss_u + loss_c + loss_reg
    else:
        loss = jnp.zeros((), jnp.float32)

    A = l * (FF[None] + A_u) + A_c + reg_i * jnp.eye(d, dtype=I.dtype)[None]
    y = l * y_u + y_c
    x = solve(A, y, i_vec, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, i_vec)
    I = I.at[sb_u.rows].set(x, mode="drop")

    # closed-form bias over SPPMI entries (cfr.cc:243-251)
    x_c = _seg_rows(x, sb_c.seg_ids, R)
    pred_new = jnp.einsum("ncd,nd->nc", Fc, x_c,
                          preferred_element_type=jnp.float32)
    b = jax.ops.segment_sum(
        jnp.sum((sb_c.vals - pred_new - cb) * mask_c, axis=1),
        sb_c.seg_ids, num_segments=R + 1)[:R]
    # unconditional like the reference (cfr.cc:243-251): zero SPPMI
    # entries -> Ib = 0, not the stale bias
    new_ib = b / (sb_c.lens.astype(jnp.float32) + 1e-10)
    Ib = Ib.at[sb_u.rows].set(jnp.where(row_mask > 0, new_ib, ib),
                              mode="drop")
    return I, Ib, loss


def _cfr_context_segment_body(C, I, Ib, Cb, sb, *, reg_c, optimizer,
                              cg_iters, cg_tol, compute_loss):
    """Context phase for long SPPMI rows."""
    R = sb.rows.shape[0]
    d = C.shape[1]
    Nc_, Cw = sb.vals.shape
    mask = _mask(sb.chunk_lens, Cw)
    row_mask = (sb.lens > 0).astype(jnp.float32)
    safe_rows = jnp.minimum(sb.rows, C.shape[0] - 1)
    c_vec = jnp.take(C, safe_rows, axis=0)
    seg = sb.seg_ids

    Fi = jnp.take(I, sb.cols, axis=0)
    cb = jnp.take(Cb, safe_rows)
    cb_c = _seg_rows(cb, seg, R)
    ib = jnp.take(Ib, sb.cols)
    coeff = (sb.vals - cb_c[:, None] - ib) * mask
    A = _segment_stats(Fi, mask, seg, R) \
        + reg_c * jnp.eye(d, dtype=C.dtype)[None]
    y = jax.ops.segment_sum(
        jnp.einsum("ncd,nc->nd", Fi, coeff,
                   preferred_element_type=jnp.float32),
        seg, num_segments=R + 1)[:R]
    loss = (reg_c * jnp.sum(row_mask * jnp.sum(c_vec * c_vec, axis=-1))
            if compute_loss else jnp.zeros((), jnp.float32))
    x = solve(A, y, c_vec, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, c_vec)
    C = C.at[sb.rows].set(x, mode="drop")

    x_c = _seg_rows(x, seg, R)
    pred_new = jnp.einsum("ncd,nd->nc", Fi, x_c,
                          preferred_element_type=jnp.float32)
    b = jax.ops.segment_sum(
        jnp.sum((sb.vals - pred_new - ib) * mask, axis=1), seg,
        num_segments=R + 1)[:R]
    new_cb = b / (sb.lens.astype(jnp.float32) + 1e-10)
    Cb = Cb.at[sb.rows].set(jnp.where(row_mask > 0, new_cb, cb),
                            mode="drop")
    return C, Cb, loss


@partial(jax.jit, static_argnames=("alpha", "l", "reg_u", "optimizer",
                                   "cg_iters", "cg_tol", "compute_loss"),
         donate_argnums=(0,))
def cfr_user_segment_step(U, I, FF, sb, *, alpha, l, reg_u, optimizer,
                          cg_iters, cg_tol, compute_loss):
    """Streaming-mode user update for one SegmentBatch."""
    return _cfr_user_segment_body(
        U, I, FF, sb, alpha=alpha, l=l, reg_u=reg_u, optimizer=optimizer,
        cg_iters=cg_iters, cg_tol=cg_tol, compute_loss=compute_loss)


@partial(jax.jit, static_argnames=("alpha", "l", "reg_i", "optimizer",
                                   "cg_iters", "cg_tol", "compute_loss"),
         donate_argnums=(0, 3))
def cfr_item_segment_step(I, U, C, Ib, Cb, FF, sb_u, sb_c, *, alpha, l,
                          reg_i, optimizer, cg_iters, cg_tol,
                          compute_loss):
    """Streaming-mode item update for one segment pair."""
    return _cfr_item_segment_body(
        I, U, C, Ib, Cb, FF, sb_u, sb_c, alpha=alpha, l=l, reg_i=reg_i,
        optimizer=optimizer, cg_iters=cg_iters, cg_tol=cg_tol,
        compute_loss=compute_loss)


@partial(jax.jit, static_argnames=("reg_c", "optimizer", "cg_iters",
                                   "cg_tol", "compute_loss"),
         donate_argnums=(0, 3))
def cfr_context_segment_step(C, I, Ib, Cb, sb, *, reg_c, optimizer,
                             cg_iters, cg_tol, compute_loss):
    """Streaming-mode context update for one SegmentBatch."""
    return _cfr_context_segment_body(
        C, I, Ib, Cb, sb, reg_c=reg_c, optimizer=optimizer,
        cg_iters=cg_iters, cg_tol=cg_tol, compute_loss=compute_loss)


@partial(jax.jit, static_argnames=("alpha", "l", "reg_u", "reg_i",
                                   "reg_c", "optimizer", "cg_iters",
                                   "cg_tol", "compute_loss"),
         donate_argnums=(0, 1, 2, 3, 4))
def cfr_epoch(U, I, C, Ib, Cb, user_batches, item_batches,
              context_batches, *, alpha, l, reg_u, reg_i, reg_c,
              optimizer, cg_iters, cg_tol, compute_loss):
    """Full 3-phase CoFactor epoch (cfr.py:128-160) in ONE dispatch.

    ``user_batches``/``context_batches`` are PaddedBatch (short rows)
    or SegmentBatch (long rows) pytrees; ``item_batches`` are either
    (PaddedBatch colwise, lens_c, cols_c, vals_c) tuples carrying the
    row-synchronized SPPMI block, or (SegmentBatch colwise,
    SegmentBatch sppmi) pairs over the same row list for rows long on
    either side — the scale path the reference serves with
    ``fetch_batch_range`` chunk streaming (buffered_data.py:120-160).
    """
    from buffalo_tpu.data.batching import SegmentBatch

    loss = jnp.zeros((), jnp.float32)
    FF = jnp.dot(I.T, I, preferred_element_type=jnp.float32)
    for b in user_batches:
        if isinstance(b, SegmentBatch):
            U, l_ = _cfr_user_segment_body(
                U, I, FF, b, alpha=alpha, l=l, reg_u=reg_u,
                optimizer=optimizer, cg_iters=cg_iters, cg_tol=cg_tol,
                compute_loss=compute_loss)
        else:
            U, l_ = _cfr_user_body(
                U, I, FF, b.rows, b.lens, b.cols, b.vals,
                alpha=alpha, l=l, reg_u=reg_u, optimizer=optimizer,
                cg_iters=cg_iters, cg_tol=cg_tol,
                compute_loss=compute_loss)
        loss = loss + l_
    FF = jnp.dot(U.T, U, preferred_element_type=jnp.float32)
    for entry in item_batches:
        if isinstance(entry[0], SegmentBatch):
            sb_u, sb_c = entry
            I, Ib, l_ = _cfr_item_segment_body(
                I, U, C, Ib, Cb, FF, sb_u, sb_c, alpha=alpha, l=l,
                reg_i=reg_i, optimizer=optimizer, cg_iters=cg_iters,
                cg_tol=cg_tol, compute_loss=compute_loss)
        else:
            b, lens_c, cols_c, vals_c = entry
            I, Ib, l_ = _cfr_item_body(
                I, U, C, Ib, Cb, FF, b.rows, b.lens, b.cols, b.vals,
                lens_c, cols_c, vals_c, alpha=alpha, l=l, reg_i=reg_i,
                optimizer=optimizer, cg_iters=cg_iters, cg_tol=cg_tol,
                compute_loss=compute_loss)
        loss = loss + l_
    for b in context_batches:
        if isinstance(b, SegmentBatch):
            C, Cb, l_ = _cfr_context_segment_body(
                C, I, Ib, Cb, b, reg_c=reg_c, optimizer=optimizer,
                cg_iters=cg_iters, cg_tol=cg_tol,
                compute_loss=compute_loss)
        else:
            C, Cb, l_ = _cfr_context_body(
                C, I, Ib, Cb, b.rows, b.lens, b.cols, b.vals,
                reg_c=reg_c, optimizer=optimizer, cg_iters=cg_iters,
                cg_tol=cg_tol, compute_loss=compute_loss)
        loss = loss + l_
    return U, I, C, Ib, Cb, loss


@partial(jax.jit, static_argnames=("mesh", "axis_name", "alpha", "l",
                                   "reg_u", "reg_i", "reg_c",
                                   "optimizer", "cg_iters", "cg_tol",
                                   "compute_loss"),
         donate_argnums=(0, 1, 2, 3, 4))
def cfr_epoch_dp(U, I, C, Ib, Cb, user_batches, item_batches,
                 context_batches, *, mesh, axis_name, alpha, l, reg_u,
                 reg_i, reg_c, optimizer, cg_iters, cg_tol,
                 compute_loss):
    """Full 3-phase CoFactor epoch over a device mesh (dp).

    Jitted as a whole (mesh static): un-jitted, each epoch would
    rebuild its shard_map closures and RECOMPILE — measured 50.5 s per
    iteration on the 80x24 dryrun toy, both iterations identical.

    TPU-native analog of the reference's OpenMP row loops at
    multi-chip scale (``cfr.cc:105-110``): every padded batch shards
    its ROW axis over the mesh while the tables replicate; each phase
    runs its local row solves, then the per-table delta (updates are
    row-disjoint set-writes, so deltas sum exactly) and loss psum over
    ICI once per phase.  Long rows (SegmentBatch) update outside
    shard_map on the replicated tables, matching the segment
    convention of the other sharded epochs.
    """
    from jax.sharding import PartitionSpec as PS

    from buffalo_tpu.data.batching import SegmentBatch

    kw = dict(optimizer=optimizer, cg_iters=cg_iters, cg_tol=cg_tol,
              compute_loss=compute_loss)
    zero = jnp.zeros((), jnp.float32)

    def specs_of(bs):
        return tuple(jax.tree.map(lambda _: PS(axis_name), b)
                     for b in bs)

    loss = zero

    # ---- user phase
    FF = jnp.dot(I.T, I, preferred_element_type=jnp.float32)
    padded = [b for b in user_batches if not isinstance(b, SegmentBatch)]
    segs = [b for b in user_batches if isinstance(b, SegmentBatch)]
    if padded:
        def u_body(U_r, I_r, FF_r, *bs):
            U_cur, ls = U_r, zero
            for b in bs:
                U_cur, l_ = _cfr_user_body(
                    U_cur, I_r, FF_r, b.rows, b.lens, b.cols, b.vals,
                    alpha=alpha, l=l, reg_u=reg_u, **kw)
                ls = ls + l_
            return (U_r + jax.lax.psum(U_cur - U_r, axis_name),
                    jax.lax.psum(ls, axis_name))

        run = jax.shard_map(
            u_body, mesh=mesh,
            in_specs=(PS(), PS(), PS()) + specs_of(padded),
            out_specs=(PS(), PS()), check_vma=False)
        U, l_ = run(U, I, FF, *padded)
        loss = loss + l_
    for sb in segs:
        U, l_ = cfr_user_segment_step(U, I, FF, sb, alpha=alpha, l=l,
                                      reg_u=reg_u, **kw)
        loss = loss + l_

    # ---- item phase
    FF = jnp.dot(U.T, U, preferred_element_type=jnp.float32)
    pad_items = [e for e in item_batches
                 if not isinstance(e[0], SegmentBatch)]
    seg_items = [e for e in item_batches
                 if isinstance(e[0], SegmentBatch)]
    if pad_items:
        def i_body(I_r, Ib_r, U_r, C_r, Cb_r, FF_r, *es):
            I_cur, Ib_cur, ls = I_r, Ib_r, zero
            for e in es:
                b, lens_c, cols_c, vals_c = e
                I_cur, Ib_cur, l_ = _cfr_item_body(
                    I_cur, U_r, C_r, Ib_cur, Cb_r, FF_r, b.rows,
                    b.lens, b.cols, b.vals, lens_c, cols_c, vals_c,
                    alpha=alpha, l=l, reg_i=reg_i, **kw)
                ls = ls + l_
            return (I_r + jax.lax.psum(I_cur - I_r, axis_name),
                    Ib_r + jax.lax.psum(Ib_cur - Ib_r, axis_name),
                    jax.lax.psum(ls, axis_name))

        run = jax.shard_map(
            i_body, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS(), PS(), PS())
            + specs_of(pad_items),
            out_specs=(PS(), PS(), PS()), check_vma=False)
        I, Ib, l_ = run(I, Ib, U, C, Cb, FF, *pad_items)
        loss = loss + l_
    for sb_u, sb_c in seg_items:
        I, Ib, l_ = cfr_item_segment_step(
            I, U, C, Ib, Cb, FF, sb_u, sb_c, alpha=alpha, l=l,
            reg_i=reg_i, **kw)
        loss = loss + l_

    # ---- context phase
    pad_ctx = [b for b in context_batches
               if not isinstance(b, SegmentBatch)]
    seg_ctx = [b for b in context_batches if isinstance(b, SegmentBatch)]
    if pad_ctx:
        def c_body(C_r, Cb_r, I_r, Ib_r, *bs):
            C_cur, Cb_cur, ls = C_r, Cb_r, zero
            for b in bs:
                C_cur, Cb_cur, l_ = _cfr_context_body(
                    C_cur, I_r, Ib_r, Cb_cur, b.rows, b.lens, b.cols,
                    b.vals, reg_c=reg_c, **kw)
                ls = ls + l_
            return (C_r + jax.lax.psum(C_cur - C_r, axis_name),
                    Cb_r + jax.lax.psum(Cb_cur - Cb_r, axis_name),
                    jax.lax.psum(ls, axis_name))

        run = jax.shard_map(
            c_body, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS()) + specs_of(pad_ctx),
            out_specs=(PS(), PS(), PS()), check_vma=False)
        C, Cb, l_ = run(C, Cb, I, Ib, *pad_ctx)
        loss = loss + l_
    for sb in seg_ctx:
        C, Cb, l_ = cfr_context_segment_step(
            C, I, Ib, Cb, sb, reg_c=reg_c, **kw)
        loss = loss + l_
    return U, I, C, Ib, Cb, loss


@partial(jax.jit, static_argnames=("reg_c", "optimizer", "cg_iters",
                                   "cg_tol", "compute_loss"),
         donate_argnums=(0, 3))
def cfr_context_step(C, I, Ib, Cb, rows, lens, cols, vals, *, reg_c,
                     optimizer, cg_iters, cg_tol, compute_loss):
    return _cfr_context_body(C, I, Ib, Cb, rows, lens, cols, vals,
                             reg_c=reg_c, optimizer=optimizer,
                             cg_iters=cg_iters, cg_tol=cg_tol,
                             compute_loss=compute_loss)


def _cfr_context_body(C, I, Ib, Cb, rows, lens, cols, vals, *, reg_c,
                      optimizer, cg_iters, cg_tol, compute_loss):
    """Context phase over SPPMI rows (cfr.cc:255-314)."""
    B, L = vals.shape
    mask = _mask(lens, L)
    row_mask = (lens > 0).astype(jnp.float32)
    safe_rows = jnp.minimum(rows, C.shape[0] - 1)
    c_vec = jnp.take(C, safe_rows, axis=0)

    Fi = jnp.take(I, cols, axis=0)
    cb = jnp.take(Cb, safe_rows)
    ib = jnp.take(Ib, cols)                     # (B, L)
    coeff = (vals - cb[:, None] - ib) * mask
    A = jnp.einsum("bld,ble,bl->bde", Fi, Fi, mask,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bld,bl->bd", Fi, coeff,
                   preferred_element_type=jnp.float32)
    d = C.shape[1]
    A = A + reg_c * jnp.eye(d, dtype=C.dtype)[None]
    loss = (reg_c * jnp.sum(row_mask * jnp.sum(c_vec * c_vec, axis=-1))
            if compute_loss else jnp.zeros((), jnp.float32))
    x = solve(A, y, c_vec, optimizer, num_iters=cg_iters, tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, c_vec)
    C = C.at[rows].set(x, mode="drop")

    pred_new = jnp.einsum("bd,bld->bl", x, Fi,
                          preferred_element_type=jnp.float32)
    b = jnp.sum((vals - pred_new - ib) * mask, axis=-1)
    new_cb = b / (lens.astype(jnp.float32) + 1e-10)
    Cb = Cb.at[rows].set(jnp.where(row_mask > 0, new_cb, cb), mode="drop")
    return C, Cb, loss
