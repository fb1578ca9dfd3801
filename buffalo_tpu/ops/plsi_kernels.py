"""pLSI EM steps over padded batches.

Counterpart of ``lib/algo_impl/plsi/plsi.cc``: the E-step
responsibility ``latent = P(z|u) * Q(i|z)`` normalized over z with a
1e-10 floor, accumulated into next-epoch tables weighted by the
interaction value, loss ``-sum v * log(norm)`` (plsi.cc:72-106); the
M-step smooths by ``alpha1/d`` / ``alpha2/|I|`` and normalizes P rows
and Q columns (plsi.cc:108-125), then the double buffers swap
(plsi.cc:127-130).  Per-row OpenMP loops become one masked
(B, L, d) elementwise block plus scatter-adds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from buffalo_tpu.data.batching import SegmentBatch


@jax.jit
def plsi_accumulate(Pn, Qn, P, Q, rows, lens, cols, vals):
    """One padded-batch E-step accumulation.  Returns (Pn, Qn, loss)."""
    B, L = cols.shape
    safe_rows = jnp.minimum(rows, P.shape[0] - 1)
    p = jnp.take(P, safe_rows, axis=0)              # (B, d)
    q = jnp.take(Q, cols, axis=0)                   # (B, L, d)
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
            < lens[:, None]).astype(jnp.float32)    # (B, L)
    w = vals * mask

    latent = jnp.maximum(p[:, None, :] * q, 1e-10)  # (B, L, d)
    norm = jnp.sum(latent, axis=-1, keepdims=True)
    loss = -jnp.sum(jnp.log(norm[..., 0]) * w)
    latent = latent / norm * w[..., None]

    Pn = Pn.at[rows].add(jnp.sum(latent, axis=1), mode="drop")
    Qn = Qn.at[cols.reshape(-1)].add(
        latent.reshape(B * L, -1), mode="drop")
    return Pn, Qn, loss


def _accumulate_chunks(Pn, Qn, P, Q, chunk_rows, chunk_lens, cols, vals):
    """E-step accumulation where each row is one fixed-width chunk
    (SegmentBatch path for power-law long rows); chunk_rows carries the
    global row id per chunk (out-of-range for padding chunks)."""
    Nc, C = cols.shape
    safe = jnp.minimum(chunk_rows, P.shape[0] - 1)
    p = jnp.take(P, safe, axis=0)                   # (Nc, d)
    q = jnp.take(Q, cols, axis=0)                   # (Nc, C, d)
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :]
            < chunk_lens[:, None]).astype(jnp.float32)
    w = vals * mask
    latent = jnp.maximum(p[:, None, :] * q, 1e-10)
    norm = jnp.sum(latent, axis=-1, keepdims=True)
    loss = -jnp.sum(jnp.log(norm[..., 0]) * w)
    latent = latent / norm * w[..., None]
    Pn = Pn.at[chunk_rows].add(jnp.sum(latent, axis=1), mode="drop")
    Qn = Qn.at[cols.reshape(-1)].add(
        latent.reshape(Nc * C, -1), mode="drop")
    return Pn, Qn, loss


@jax.jit
def plsi_accumulate_segments(Pn, Qn, P, Q, rows, seg_ids, chunk_lens,
                             cols, vals):
    """Streaming-mode E-step accumulation for one SegmentBatch."""
    R = rows.shape[0]
    padded_rows = jnp.concatenate(
        [rows, jnp.full((1,), Pn.shape[0], rows.dtype)])
    chunk_rows = jnp.take(padded_rows, jnp.minimum(seg_ids, R), axis=0)
    return _accumulate_chunks(Pn, Qn, P, Q, chunk_rows, chunk_lens,
                              cols, vals)


@partial(jax.jit, static_argnames=("alpha1", "alpha2"))
def plsi_epoch(P, Q, batches, *, alpha1, alpha2):
    """One full EM epoch (E accumulate over all batches + M normalize)
    in ONE dispatch; handles padded and segment batches."""
    Pn = jnp.zeros_like(P)
    Qn = jnp.zeros_like(Q)
    loss = jnp.zeros((), jnp.float32)

    def one(Pn, Qn, b):
        if isinstance(b, SegmentBatch):
            R = b.rows.shape[0]
            padded_rows = jnp.concatenate(
                [b.rows, jnp.full((1,), Pn.shape[0], b.rows.dtype)])
            chunk_rows = jnp.take(padded_rows, jnp.minimum(b.seg_ids, R),
                                  axis=0)
            return _accumulate_chunks(
                Pn, Qn, P, Q, chunk_rows, b.chunk_lens, b.cols, b.vals)
        return plsi_accumulate(Pn, Qn, P, Q, b.rows, b.lens, b.cols,
                               b.vals)

    for b in batches:
        if b.rows.ndim == 2:  # shape-stacked group: scan one body
            def body(carry, bb):
                Pn, Qn, ls = carry
                Pn, Qn, l_ = one(Pn, Qn, bb)
                return (Pn, Qn, ls + l_), None
            (Pn, Qn, loss), _ = jax.lax.scan(body, (Pn, Qn, loss), b)
        else:
            Pn, Qn, batch_loss = one(Pn, Qn, b)
            loss = loss + batch_loss
    P, Q = plsi_normalize_swap(Pn, Qn, alpha1=alpha1, alpha2=alpha2)
    return P, Q, loss


def _estep_block(a, f, vals, mask, *, with_loss):
    """E-step responsibilities for one padded block.

    a: (B, d) rows of the side being accumulated; f: (B, L, d) gathered
    other-side rows.  ``latent(u,i) = P(z|u) * Q(i|z)`` is symmetric in
    the two sides, so the same block math serves both orientations.
    Returns (row_sums (B, d), loss).

    The sums factor into two CONTRACTIONS —
    ``row_sums[b,z] = a[b,z] * sum_l (w/norm)[b,l] f[b,l,z]`` with
    ``norm[b,l] = sum_z a[b,z] f[b,l,z]`` — so no (B, L, d) latent
    tensor ever materializes (the earlier explicit-product form put
    the ML-20M epoch at ~250 GB of claimed HBM traffic for 3.5 GFLOP,
    ``microbench_plsi_chain.py``).  The degenerate-product guard moves
    from per-element (``max(a*f, 1e-10)``) to the summed norm
    (``max(norm, d*1e-10)``): identical except when EVERY latent
    component of an entry is below 1e-10, where the old form spread
    the weight uniformly and this form drops it — both arbitrary, the
    M-step's alpha smoothing dominates either.
    """
    d = a.shape[-1]
    norm = jnp.maximum(
        jnp.einsum("bd,bld->bl", a, f,
                   preferred_element_type=jnp.float32), d * 1e-10)
    w = vals * mask
    loss = (-jnp.sum(jnp.log(norm) * w) if with_loss
            else jnp.zeros((), jnp.float32))
    g = w / norm
    return a * jnp.einsum("bl,bld->bd", g, f,
                          preferred_element_type=jnp.float32), loss


def _range_accumulate(An, A, Bf, batch, *, with_loss):
    """Accumulate next-epoch sums for one contiguous row range.

    The write is a dynamic_update_slice (read + add + write of a
    contiguous block) — the scatter-add over all nnz that bound the
    single-orientation epoch (~133 ns/row) never happens.
    """
    B, L = batch.vals.shape
    a = jax.lax.dynamic_slice_in_dim(A, batch.row_start, B, axis=0)
    f = jnp.take(Bf, batch.cols, axis=0)
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
            < batch.lens[:, None]).astype(jnp.float32)
    sums, loss = _estep_block(a, f, batch.vals, mask, with_loss=with_loss)
    cur = jax.lax.dynamic_slice_in_dim(An, batch.row_start, B, axis=0)
    An = jax.lax.dynamic_update_slice_in_dim(An, cur + sums,
                                             batch.row_start, axis=0)
    return An, loss


def _segment_accumulate(An, A, Bf, batch, *, with_loss):
    """One-side accumulation for long rows (scatter over the few
    chunk rows only)."""
    R = batch.rows.shape[0]
    Nc, C = batch.vals.shape
    padded_rows = jnp.concatenate(
        [batch.rows, jnp.full((1,), An.shape[0], batch.rows.dtype)])
    chunk_rows = jnp.take(padded_rows, jnp.minimum(batch.seg_ids, R))
    a = jnp.take(A, jnp.minimum(chunk_rows, A.shape[0] - 1), axis=0)
    f = jnp.take(Bf, batch.cols, axis=0)
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :]
            < batch.chunk_lens[:, None]).astype(jnp.float32)
    sums, loss = _estep_block(a, f, batch.vals, mask, with_loss=with_loss)
    An = An.at[chunk_rows].add(sums, mode="drop")
    return An, loss


def _accumulate_side(An, A, Bf, groups, segments, *, with_loss):
    loss = jnp.zeros((), jnp.float32)
    for g in groups:
        if g.lens.ndim == 2:  # shape-stacked group: scan one body
            def body(carry, b):
                An, ls = carry
                An, l_ = _range_accumulate(An, A, Bf, b,
                                           with_loss=with_loss)
                return (An, ls + l_), None
            (An, loss), _ = jax.lax.scan(body, (An, loss), g)
        else:
            An, l_ = _range_accumulate(An, A, Bf, g, with_loss=with_loss)
            loss = loss + l_
    for s in segments:
        An, l_ = _segment_accumulate(An, A, Bf, s, with_loss=with_loss)
        loss = loss + l_
    return An, loss


@partial(jax.jit, static_argnames=("with_loss",), donate_argnums=(0,))
def plsi_accumulate_group(An, A, Bf, group, *, with_loss):
    """One stacked range group per dispatch (730M-scale variant)."""
    return _accumulate_side(An, A, Bf, (group,), (), with_loss=with_loss)


@partial(jax.jit, static_argnames=("with_loss",), donate_argnums=(0,))
def plsi_segment_group(An, A, Bf, seg, *, with_loss):
    return _segment_accumulate(An, A, Bf, seg, with_loss=with_loss)


def _mstep(Pn, Qn, p_mask, q_mask, alpha1, alpha2, num_items):
    """M-step smoothing + normalization over the permuted tables
    (masked to real rows; padding rows stay zero)."""
    d = Pn.shape[1]
    Pn = Pn + (alpha1 / d) * p_mask[:, None]
    p_sum = jnp.sum(Pn, axis=1, keepdims=True)
    Pn = Pn / jnp.where(p_sum > 0, p_sum, 1.0)
    Qn = Qn + (alpha2 / num_items) * q_mask[:, None]
    q_sum = jnp.sum(Qn, axis=0, keepdims=True)
    Qn = Qn / jnp.where(q_sum > 0, q_sum, 1.0)
    return Pn, Qn


@partial(jax.jit, static_argnames=("alpha1", "alpha2", "num_items"),
         donate_argnums=(0, 1))
def plsi_mstep(Pn, Qn, p_mask, q_mask, *, alpha1, alpha2, num_items):
    return _mstep(Pn, Qn, p_mask, q_mask, alpha1, alpha2, num_items)


@partial(jax.jit, static_argnames=("alpha1", "alpha2", "num_items"))
def plsi_epoch_range(P, Q, row_groups, col_groups, row_segments,
                     col_segments, p_mask, q_mask, *, alpha1, alpha2,
                     num_items):
    """One EM epoch in the bucket-order permuted layout, ONE dispatch.

    The E-step runs over BOTH orientations: the rowwise pass
    accumulates Pn (and the loss) with contiguous range writes; the
    colwise pass recomputes the symmetric responsibilities and
    accumulates Qn the same way.  The duplicated elementwise latent is
    ~2x FLOPs but removes every per-nnz scatter-add — the measured
    epoch bound of the single-orientation formulation
    (``plsi.cc:72-106`` is a trivially parallel loop; its TPU analog is
    bandwidth, not scatter).  ``p_mask``/``q_mask`` flag the REAL rows
    of the padded permuted tables so the M-step smoothing
    (``plsi.cc:108-125``, ``alpha2 / |I|`` with the REAL item count)
    and the column normalization stay exactly reference-shaped.
    """
    Pn, loss = _accumulate_side(jnp.zeros_like(P), P, Q,
                                row_groups, row_segments, with_loss=True)
    Qn, _ = _accumulate_side(jnp.zeros_like(Q), Q, P,
                             col_groups, col_segments, with_loss=False)
    Pn, Qn = _mstep(Pn, Qn, p_mask, q_mask, alpha1, alpha2, num_items)
    return Pn, Qn, loss


@partial(jax.jit, static_argnames=("mesh", "axis_name", "alpha1",
                                   "alpha2", "num_items"))
def plsi_epoch_sharded_range(P, Q, row_groups, col_groups, row_segments,
                             col_segments, p_mask, q_mask, *, mesh,
                             axis_name, alpha1, alpha2, num_items):
    """One EM epoch over a device mesh, range-layout accumulators.

    The TPU-native replacement for the reference's OpenMP EM loop
    (``plsi.cc:80``) at multi-chip scale, mirroring
    ``als_epoch_sharded_range``: both tables row-shard over the mesh
    in the per-shard bucket order of ``build_sharded_range_layout``;
    each orientation all-gathers the fixed side over ICI and
    accumulates its LOCAL next-epoch rows with contiguous
    ``dynamic_update_slice`` ranges.  Long rows (SegmentBatch, global
    ids) accumulate outside shard_map with GSPMD scatter.  The M-step
    runs on the sharded accumulators — the column normalization's
    axis-0 sum is a GSPMD all-reduce.  Loss is psum-replicated.
    """
    from jax.sharding import PartitionSpec as PS

    zero = jnp.zeros((), jnp.float32)

    def sharded_side(A, Bf, groups, *, with_loss):
        if not groups:
            return jnp.zeros_like(A), zero

        def body(A_loc, Bf_loc, *groups_loc):
            Bf_full = jax.lax.all_gather(Bf_loc, axis_name, axis=0,
                                         tiled=True)
            local = tuple(jax.tree.map(lambda x: x[0], g)
                          for g in groups_loc)
            An, loss = _accumulate_side(
                jnp.zeros_like(A_loc), A_loc, Bf_full, local, (),
                with_loss=with_loss)
            return An, jax.lax.psum(loss, axis_name)

        specs = tuple(jax.tree.map(lambda _: PS(axis_name), g)
                      for g in groups)
        # check_vma off: scan carries accumulate device-varying terms
        # from unvarying zeros (same caveat as the ALS sharded epoch);
        # the explicit psum makes the loss replicated.
        run = jax.shard_map(
            body, mesh=mesh,
            in_specs=(PS(axis_name), PS(axis_name)) + specs,
            out_specs=(PS(axis_name), PS()), check_vma=False)
        return run(A, Bf, *groups)

    Pn, loss = sharded_side(P, Q, row_groups, with_loss=True)
    for s in row_segments:
        Pn, l_ = _segment_accumulate(Pn, P, Q, s, with_loss=True)
        loss = loss + l_
    Qn, _ = sharded_side(Q, P, col_groups, with_loss=False)
    for s in col_segments:
        Qn, _ = _segment_accumulate(Qn, Q, P, s, with_loss=False)
    Pn, Qn = _mstep(Pn, Qn, p_mask, q_mask, alpha1, alpha2, num_items)
    return Pn, Qn, loss


@partial(jax.jit, static_argnames=("alpha1", "alpha2"))
def plsi_normalize_swap(Pn, Qn, *, alpha1, alpha2):
    """M-step smoothing + normalization (plsi.cc:108-125).

    Zero-sum rows/columns (an empty user with alpha1=0, a never-seen
    item with alpha2=0) are guarded like ``_mstep``'s permuted-layout
    variant: dividing by 1 leaves them all-zero instead of NaN.
    """
    d = Pn.shape[1]
    num_items = Qn.shape[0]
    Pn = Pn + alpha1 / d
    psum = jnp.sum(Pn, axis=1, keepdims=True)
    Pn = Pn / jnp.where(psum > 0, psum, 1.0)
    Qn = Qn + alpha2 / num_items
    qsum = jnp.sum(Qn, axis=0, keepdims=True)
    Qn = Qn / jnp.where(qsum > 0, qsum, 1.0)
    return Pn, Qn
