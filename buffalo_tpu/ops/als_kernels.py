"""ALS batch update math: per-row normal equations over padded batches.

TPU-native counterpart of ``CALS::_partial_update``
(``lib/algo_impl/als/als.cc:107-209``) and the iALS++ blockwise
subspace CG ``_partial_update_ialspp`` (``als.cc:211-358``).  The C++
core loops rows on OpenMP threads building one d x d system at a time;
here a padded batch of B rows becomes three MXU einsums —
``A = FF + Fw^T F``, ``y = F^T (1 + alpha v)`` and a batched solve —
with masking for ragged row lengths.

The training loss accumulators (nume/deno) reproduce the reference
formula (``als.cc:175-202``): computed on the item axis only, with the
pre-update factor rows, including the implicit-negative term
``p FF p``, plus the regularization term on both axes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from buffalo_tpu.data.batching import (MATRIX_FREE_MAX_L, RangeBatch,
                                        SegmentBatch)
from buffalo_tpu.ops.solve import cg_loop, cg_warm_start, solve


def als_stored_width(d: int, opt_value: int = 0,
                     max_rows: int = 0) -> int:
    """On-device factor-table width for the ALS family.

    Unlike the SGD family (``sgd_kernels.resolve_stored_width``, pad
    everything below 64), the solve epochs pay real extra work per
    padded lane, so auto-padding only wins in the band the r5 width
    audit measured, AND only on large catalogs:

    * KakaoBrunch (505k-row table, ``als_brunch_width.log``): epoch
      0.303 / 0.439 / **0.613** / 0.446 / 0.455 s at d =
      10/20/40/64/80 — the sub-128 codegen inversion hits only
      32 < d < 64, where storing at 64 is 1.37x faster; d <= 32
      epochs are already faster than the d = 64 cost.
    * ML-20M (138k-row table, ``als_ml20m_d40_{padded,unpadded}.log``):
      d = 40 padded 0.276 s vs unpadded 0.238 s — padding LOSES 16%.

    So auto pads only when the larger factor table exceeds ~200k rows
    (``max_rows``); the inversion is a property of gathers/codegen
    against very tall tables, not of the width alone.

    ``opt_value``: 0 = auto; -1 = never pad; >= 1 = store at exactly
    max(d, value).  Zero columns are exact through every solver here:
    the normal equations decouple (A's padded block is reg * I with
    y = 0, so x_pad = 0 for llt/ldlt; CG and the iALS++ block sweeps
    preserve exact zeros).
    """
    v = int(opt_value)
    if v < 0:
        return d
    if v > 0:
        return max(d, v)
    return 64 if (32 < d < 64 and max_rows > 200_000
                  and jax.default_backend() == "tpu") else d


def _row_stats(F: jax.Array, vals: jax.Array, mask: jax.Array,
               alpha: float) -> Tuple[jax.Array, jax.Array]:
    """Per-row data terms: A_data (B,d,d) = alpha * F^T C F, y (B,d)."""
    w = vals.astype(jnp.float32) * alpha * mask
    Fw = F * w[:, :, None]
    A_data = jnp.einsum("bld,ble->bde", Fw, F,
                        preferred_element_type=jnp.float32)
    y = jnp.einsum("bld,bl->bd", F, (1.0 + w) * mask,
                   preferred_element_type=jnp.float32)
    return A_data, y


def _loss_terms(p: jax.Array, F: jax.Array, FF: jax.Array,
                vals: jax.Array, mask: jax.Array, row_mask: jax.Array,
                lens: jax.Array, num_fixed_rows: int, alpha: float,
                reg: float, adaptive_reg: bool, item_axis: bool):
    """Reference loss accumulators (``als.cc:175-202``, pre-update p)."""
    ada = jnp.where(adaptive_reg, lens.astype(jnp.float32), 1.0)
    p_sq = jnp.sum(p * p, axis=-1)
    nume = jnp.sum(row_mask * ada * reg * p_sq)
    deno = jnp.zeros((), jnp.float32)
    if item_axis:
        w = vals.astype(jnp.float32) * alpha * mask
        dots = jnp.einsum("bd,bld->bl", p, F,
                          preferred_element_type=jnp.float32)
        pos = mask * (-dots * dots + (dots - 1.0) ** 2 * (1.0 + w))
        pFFp = jnp.einsum("bd,de,be->b", p, FF, p,
                          preferred_element_type=jnp.float32)
        nume = nume + jnp.sum(row_mask * (pFFp + jnp.sum(pos, axis=-1)))
        deno = deno + jnp.sum(row_mask) * num_fixed_rows \
            + jnp.sum(w * row_mask[:, None])
    return nume, deno


# below MATRIX_FREE_MAX_L (batching.py) the CG solve runs matrix-free;
# above it, materializing A once is cheaper than re-reading F per matvec


def _solve_cg_matrix_free(p, F, FF, w, mask, reg_vec, y,
                          num_iters: int, tolerance: float):
    """Warm-started batched CG where the matvec applies
    ``A x = FF x + reg x + F^T (w * (F x))`` without ever materializing
    the per-row d x d system.

    For short rows (the bulk of a power-law dataset) the (B, d, d)
    system is lane-padded to (B, d, 128) on TPU and re-read every CG
    step — the dominant HBM traffic of the 21.9M-row KakaoReco730M
    user pass.  Matrix-free CG reads only F (B, L, d) per matvec,
    ~8x less at L=8, d=32.  Same math as ``solve.solve_cg`` +
    ``als.cc:58-81`` warm-start semantics.
    """
    def matvec(x):
        dense = jnp.dot(x, FF, precision=jax.lax.Precision.HIGHEST) \
            + reg_vec[:, None] * x
        fx = jnp.einsum("bld,bd->bl", F, x,
                        preferred_element_type=jnp.float32)
        return dense + jnp.einsum("bld,bl->bd", F, fx * w,
                                  preferred_element_type=jnp.float32)

    x, r = cg_warm_start(matvec, y, p)
    return cg_loop(matvec, x, r, num_iters, tolerance, unroll=True)


def als_solve_batch(p: jax.Array, F: jax.Array, FF: jax.Array,
                    lens: jax.Array, vals: jax.Array,
                    *, alpha: float, reg: float, adaptive_reg: bool,
                    optimizer: str, cg_iters: int, cg_tol: float,
                    item_axis: bool, num_fixed_rows: int,
                    compute_loss: bool):
    """Solve a padded batch of per-row systems.

    p:    (B, d)   current rows of the side being updated
    F:    (B, L, d) gathered fixed-side rows (padding garbage is masked)
    FF:   (d, d)   gramian of the fixed side
    lens: (B,)     true row lengths; vals: (B, L) confidence values.

    Returns (x_new (B, d), nume, deno).
    """
    B, L = vals.shape
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
            < lens[:, None]).astype(jnp.float32)
    row_mask = (lens > 0).astype(jnp.float32)
    ada = jnp.where(adaptive_reg, lens.astype(jnp.float32), 1.0)

    if compute_loss:
        nume, deno = _loss_terms(p, F, FF, vals, mask, row_mask, lens,
                                 num_fixed_rows, alpha, reg,
                                 adaptive_reg, item_axis)
    else:
        nume = deno = jnp.zeros((), jnp.float32)

    from buffalo_tpu.ops.solve import CG_SOLVERS
    if optimizer in CG_SOLVERS and L <= MATRIX_FREE_MAX_L:
        w = vals.astype(jnp.float32) * alpha * mask
        y = jnp.einsum("bld,bl->bd", F, (1.0 + w) * mask,
                       preferred_element_type=jnp.float32)
        x = _solve_cg_matrix_free(p, F, FF, w, mask, reg * ada, y,
                                  num_iters=cg_iters, tolerance=cg_tol)
    else:
        A_data, y = _row_stats(F, vals, mask, alpha)
        d = p.shape[-1]
        A = FF[None] + A_data \
            + (reg * ada)[:, None, None] * jnp.eye(d, dtype=p.dtype)[None]
        x = solve(A, y, p, optimizer, num_iters=cg_iters,
                  tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, p)
    return x, nume, deno


def ialspp_solve_batch(p: jax.Array, F: jax.Array, FF: jax.Array,
                       lens: jax.Array, vals: jax.Array,
                       *, alpha: float, reg: float, adaptive_reg: bool,
                       block_size: int, cg_tol: float,
                       item_axis: bool, num_fixed_rows: int,
                       compute_loss: bool):
    """iALS++ blockwise subspace CG over a padded batch.

    Faithful to ``als.cc:211-358``: residual cache ``Yui = p . q`` per
    interaction, then for each size-``block_size`` slice of the d
    dimensions solve the subspace system with 3 CG steps whose matvec
    adds the data term implicitly (``Ap += v*alpha*(q_blk . p) q_blk``),
    update the block of p and fold the step back into the residuals.
    The d x d system never materializes per row — per-row state is
    O(block_size^2) for the shared gramian block only.
    """
    B, L = vals.shape
    d = p.shape[-1]
    mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
            < lens[:, None]).astype(jnp.float32)
    row_mask = (lens > 0).astype(jnp.float32)

    if compute_loss:
        nume, deno = _loss_terms(p, F, FF, vals, mask, row_mask, lens,
                                 num_fixed_rows, alpha, reg,
                                 adaptive_reg, item_axis)
    else:
        nume = deno = jnp.zeros((), jnp.float32)

    w = vals.astype(jnp.float32) * alpha * mask           # (B, L)
    Yui = jnp.einsum("bd,bld->bl", p, F,
                     preferred_element_type=jnp.float32)

    num_blocks = (d + block_size - 1) // block_size
    for blk in range(num_blocks):
        beg = blk * block_size
        bs = min(block_size, d - beg)
        Fb = jax.lax.slice_in_dim(F, beg, beg + bs, axis=2)   # (B, L, bs)
        gram_cols = jax.lax.slice_in_dim(FF, beg, beg + bs, axis=1)
        A = (jax.lax.slice_in_dim(gram_cols, beg, beg + bs, axis=0)
             + reg * jnp.eye(bs, dtype=p.dtype))              # (bs, bs)
        p_blk = jax.lax.slice_in_dim(p, beg, beg + bs, axis=1)

        # b = p @ FF[:, blk] + reg p_blk + sum (Yui - 1) w q_blk
        b = (p @ gram_cols + reg * p_blk
             + jnp.einsum("bl,bld->bd", (Yui - 1.0) * w, Fb,
                          preferred_element_type=jnp.float32))

        def matvec(v):  # (B, bs) -> (B, bs)
            dense = v @ A.T
            data = jnp.einsum(
                "bl,bld->bd",
                jnp.einsum("bld,bd->bl", Fb, v,
                           preferred_element_type=jnp.float32) * w,
                Fb, preferred_element_type=jnp.float32)
            return dense + data

        # 3-step CG from zero start (als.cc:322-345)
        x = cg_loop(matvec, jnp.zeros_like(b), b, 3, cg_tol, unroll=True)
        x = x * row_mask[:, None]
        p = jax.lax.dynamic_update_slice_in_dim(
            p, p_blk - x, beg, axis=1)
        Yui = Yui - jnp.einsum("bld,bd->bl", Fb, x,
                               preferred_element_type=jnp.float32)
    return p, nume, deno


def als_solve_segment_batch(p: jax.Array, Q: jax.Array, FF: jax.Array,
                            lens: jax.Array, seg_ids: jax.Array,
                            chunk_lens: jax.Array, cols: jax.Array,
                            vals: jax.Array,
                            *, alpha: float, reg: float, adaptive_reg: bool,
                            optimizer: str, cg_iters: int, cg_tol: float,
                            item_axis: bool, num_fixed_rows: int,
                            compute_loss: bool):
    """Solve long rows whose entries arrive as fixed-width chunks.

    p:          (R, d)  current rows being updated
    Q:          fixed-side table (gathered per chunk here, so a power-law
                head row never materializes as one multi-GB padded row)
    seg_ids:    (Nc,) local row index of each chunk (padding -> R)
    chunk_lens: (Nc,) valid entries per chunk; cols/vals: (Nc, C).

    Per-chunk normal-equation statistics are accumulated per row with
    ``segment_sum`` — numerically identical to the single-row padded
    path (the reference's per-row loop ``als.cc:107-209`` visits the
    same entries in CSR order).
    """
    R, d = p.shape
    Nc, C = vals.shape
    mask = (jnp.arange(C, dtype=jnp.int32)[None, :]
            < chunk_lens[:, None]).astype(jnp.float32)
    row_mask = (lens > 0).astype(jnp.float32)

    F = jnp.take(Q, cols, axis=0)                       # (Nc, C, d)
    w = vals.astype(jnp.float32) * alpha * mask
    Fw = F * w[:, :, None]
    A_chunk = jnp.einsum("ncd,nce->nde", Fw, F,
                         preferred_element_type=jnp.float32)
    y_chunk = jnp.einsum("ncd,nc->nd", F, (1.0 + w) * mask,
                         preferred_element_type=jnp.float32)
    A_data = jax.ops.segment_sum(
        A_chunk.reshape(Nc, d * d), seg_ids, num_segments=R + 1
    )[:R].reshape(R, d, d)
    y = jax.ops.segment_sum(y_chunk, seg_ids, num_segments=R + 1)[:R]

    ada = jnp.where(adaptive_reg, lens.astype(jnp.float32), 1.0)
    A = FF[None] + A_data \
        + (reg * ada)[:, None, None] * jnp.eye(d, dtype=p.dtype)[None]

    nume = deno = jnp.zeros((), jnp.float32)
    if compute_loss:
        p_sq = jnp.sum(p * p, axis=-1)
        nume = jnp.sum(row_mask * ada * reg * p_sq)
        if item_axis:
            p_chunk = jnp.take(jnp.vstack([p, jnp.zeros((1, d), p.dtype)]),
                               jnp.minimum(seg_ids, R), axis=0)
            dots = jnp.einsum("ncd,nd->nc", F, p_chunk,
                              preferred_element_type=jnp.float32)
            pos = mask * (-dots * dots + (dots - 1.0) ** 2 * (1.0 + w))
            pFFp = jnp.einsum("rd,de,re->r", p, FF, p,
                              preferred_element_type=jnp.float32)
            nume = nume + jnp.sum(row_mask * pFFp) + jnp.sum(pos)
            deno = deno + jnp.sum(row_mask) * num_fixed_rows + jnp.sum(w)

    x = solve(A, y, p, optimizer if optimizer != "ialspp" else "manual_cg",
              num_iters=max(cg_iters, 3), tolerance=cg_tol)
    x = jnp.where(row_mask[:, None] > 0, x, p)
    return x, nume, deno


def gramian(X: jax.Array, chunk: int = 1 << 20) -> jax.Array:
    """``X^T X`` accumulated over row chunks.

    ``jnp.dot(X.T, X)`` on a 21.9M x 32 table makes XLA materialize a
    full transposed-layout copy (2.6 GB at KakaoReco scale — it OOM'd
    the chip); chunking keeps the transpose at (chunk, d).
    """
    n, d = X.shape
    if n <= chunk:
        return jnp.dot(X.T, X, preferred_element_type=jnp.float32)
    k = n // chunk

    def body(i, acc):
        blk = jax.lax.dynamic_slice_in_dim(X, i * chunk, chunk, axis=0)
        return acc + jnp.dot(blk.T, blk,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros((d, d), jnp.float32))
    if n - k * chunk:
        blk = jax.lax.slice_in_dim(X, k * chunk, n, axis=0)
        acc = acc + jnp.dot(blk.T, blk,
                            preferred_element_type=jnp.float32)
    return acc


def _apply_batch(A, Bf, FF, batch, *, optimizer, alpha, reg, adaptive_reg,
                 cg_iters, cg_tol, block_size, item_axis, num_fixed_rows,
                 compute_loss):
    """Update table ``A`` with one batch (padded/segment/range)."""
    common = dict(alpha=alpha, reg=reg, adaptive_reg=adaptive_reg,
                  item_axis=item_axis, num_fixed_rows=num_fixed_rows,
                  compute_loss=compute_loss)
    if isinstance(batch, RangeBatch):
        # bucket-order layout: contiguous slice in, slice update out —
        # avoids the ~133 ns/row scatter floor of big tables
        B = batch.lens.shape[0]
        p = jax.lax.dynamic_slice_in_dim(A, batch.row_start, B, axis=0)
        F = jnp.take(Bf, batch.cols, axis=0)
        if optimizer == "ialspp":
            x, nume, deno = ialspp_solve_batch(
                p, F, FF, batch.lens, batch.vals, block_size=block_size,
                cg_tol=cg_tol, **common)
        else:
            x, nume, deno = als_solve_batch(
                p, F, FF, batch.lens, batch.vals, optimizer=optimizer,
                cg_iters=cg_iters, cg_tol=cg_tol, **common)
        A = jax.lax.dynamic_update_slice_in_dim(A, x, batch.row_start,
                                                axis=0)
        return A, nume, deno
    rows = batch.rows
    safe_rows = jnp.minimum(rows, A.shape[0] - 1)
    p = jnp.take(A, safe_rows, axis=0)
    if isinstance(batch, SegmentBatch):
        x, nume, deno = als_solve_segment_batch(
            p, Bf, FF, batch.lens, batch.seg_ids, batch.chunk_lens,
            batch.cols, batch.vals, optimizer=optimizer,
            cg_iters=cg_iters, cg_tol=cg_tol, **common)
    else:
        F = jnp.take(Bf, batch.cols, axis=0)
        if optimizer == "ialspp":
            x, nume, deno = ialspp_solve_batch(
                p, F, FF, batch.lens, batch.vals, block_size=block_size,
                cg_tol=cg_tol, **common)
        else:
            x, nume, deno = als_solve_batch(
                p, F, FF, batch.lens, batch.vals, optimizer=optimizer,
                cg_iters=cg_iters, cg_tol=cg_tol, **common)
    A = A.at[rows].set(x, mode="drop")
    return A, nume, deno


def _apply_group(A, Bf, FF, batch, **kw):
    """One batch, or a same-shape stack of batches (leading axis):
    stacked groups run under lax.scan so each distinct shape compiles
    exactly one body — at 21.9M-row scale that is ~30 compiled bodies
    instead of ~400."""
    flat = (batch.lens.ndim == 1 if isinstance(batch, RangeBatch)
            else batch.rows.ndim == 1)
    if flat:
        return _apply_batch(A, Bf, FF, batch, **kw)

    def body(carry, b):
        A, nu, de = carry
        A, n, dn = _apply_batch(A, Bf, FF, b, **kw)
        return (A, nu + n, de + dn), None

    (A, nu, de), _ = jax.lax.scan(
        body, (A, jnp.zeros((), jnp.float32),
               jnp.zeros((), jnp.float32)), batch)
    return A, nu, de


@partial(jax.jit, static_argnames=(
    "optimizer", "alpha", "reg", "adaptive_reg", "cg_iters", "cg_tol",
    "block_size", "item_axis", "num_fixed_rows", "compute_loss"),
    donate_argnums=(0,))
def als_group_step(A, Bf, FF, group, *, optimizer, alpha, reg,
                   adaptive_reg, cg_iters, cg_tol, block_size, item_axis,
                   num_fixed_rows, compute_loss):
    """One stacked same-shape group per dispatch (lax.scan inside).

    The single-program fused epoch OOMs at KakaoReco730M scale — XLA's
    scheduler accumulates ~11 GB of lane-padded temps plus remat
    copies of the 2.6 GB table across the whole-program schedule.
    Dispatching one group at a time bounds the live set per program;
    the ~40 dispatches pipeline, so the tunnel round trip is hidden in
    steady state.
    """
    return _apply_group(
        A, Bf, FF, group, optimizer=optimizer, alpha=alpha, reg=reg,
        adaptive_reg=adaptive_reg, cg_iters=cg_iters, cg_tol=cg_tol,
        block_size=block_size, item_axis=item_axis,
        num_fixed_rows=num_fixed_rows, compute_loss=compute_loss)


@partial(jax.jit, donate_argnums=())
def gramian_step(X):
    """Standalone chunked gramian dispatch (see ``gramian``)."""
    return gramian(X)


@partial(jax.jit, static_argnames=(
    "optimizer", "alpha", "reg", "adaptive_reg", "cg_iters", "cg_tol",
    "block_size", "item_axis", "num_fixed_rows", "compute_loss"),
    donate_argnums=(0,))
def als_batch_step(A, Bf, FF, batch, *, optimizer, alpha, reg, adaptive_reg,
                   cg_iters, cg_tol, block_size, item_axis, num_fixed_rows,
                   compute_loss):
    """Streaming-mode per-batch step (PaddedBatch or SegmentBatch)."""
    return _apply_batch(
        A, Bf, FF, batch, optimizer=optimizer, alpha=alpha, reg=reg,
        adaptive_reg=adaptive_reg, cg_iters=cg_iters, cg_tol=cg_tol,
        block_size=block_size, item_axis=item_axis,
        num_fixed_rows=num_fixed_rows, compute_loss=compute_loss)


@partial(jax.jit, static_argnames=(
    "optimizer", "alpha", "reg_u", "reg_i", "adaptive_reg", "cg_iters",
    "cg_tol", "block_size", "compute_loss", "num_p_rows", "num_q_rows"),
    donate_argnums=(0, 1))
def als_epoch(P, Q, row_batches, col_batches, *, optimizer, alpha, reg_u,
              reg_i, adaptive_reg, cg_iters, cg_tol, block_size,
              compute_loss, num_p_rows=None, num_q_rows=None):
    """One full ALS epoch — gramian + both half-epochs — in ONE dispatch.

    The reference pays one C++ call per chunk (`als.py:115-143`); on a
    remote TPU every dispatch costs a network round trip, so the whole
    epoch (all resident batches of both orientations, including the
    gramian precomputes) compiles into a single XLA program.  P and Q
    are donated and updated in place in HBM.
    """
    common = dict(optimizer=optimizer, alpha=alpha, adaptive_reg=adaptive_reg,
                  cg_iters=cg_iters, cg_tol=cg_tol, block_size=block_size,
                  compute_loss=compute_loss)

    nume = deno = jnp.zeros((), jnp.float32)
    FF = gramian(Q)
    for batch in row_batches:
        P, n, dn = _apply_group(P, Q, FF, batch, reg=reg_u, item_axis=False,
                                num_fixed_rows=num_q_rows or Q.shape[0],
                                **common)
        nume, deno = nume + n, deno + dn
    FF = gramian(P)
    for batch in col_batches:
        Q, n, dn = _apply_group(Q, P, FF, batch, reg=reg_i, item_axis=True,
                                num_fixed_rows=num_p_rows or P.shape[0],
                                **common)
        nume, deno = nume + n, deno + dn
    return P, Q, nume, deno


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "optimizer", "alpha", "reg_u", "reg_i",
    "adaptive_reg", "cg_iters", "cg_tol", "block_size", "compute_loss",
    "num_p_rows", "num_q_rows"), donate_argnums=(0, 1))
def als_epoch_sharded_range(P, Q, row_groups, col_groups, row_segments,
                            col_segments, *, mesh, axis_name, optimizer,
                            alpha, reg_u, reg_i, adaptive_reg, cg_iters,
                            cg_tol, block_size, compute_loss, num_p_rows,
                            num_q_rows):
    """One full ALS epoch over a device mesh, range-layout updates.

    The TPU-native replacement for the reference's OpenMP row loop
    (``als.cc:148-152``) at multi-chip scale, following the ALX recipe
    (PAPERS.md): both factor tables are ROW-SHARDED over the mesh
    (``NamedSharding(P(axis_name))``); each half-epoch all-gathers the
    fixed-side table over ICI, psums the d x d gramian, and updates the
    local shard with CONTIGUOUS ``dynamic_update_slice`` ranges (the
    per-shard bucket-order layout from ``build_sharded_range_layout``),
    never paying the ~133 ns/row scatter floor.  Long rows
    (SegmentBatch, global ids) run outside shard_map with ordinary
    sharded scatter — they are a measure-zero tail of the row
    distribution.  Scalars (nume/deno) are psum-reduced and replicated.
    """
    from jax.sharding import PartitionSpec as PS

    common = dict(optimizer=optimizer, alpha=alpha, adaptive_reg=adaptive_reg,
                  cg_iters=cg_iters, cg_tol=cg_tol, block_size=block_size,
                  compute_loss=compute_loss)
    zero = jnp.zeros((), jnp.float32)

    def sharded_half(A, Bf, FF, groups, *, reg, item_axis, num_fixed_rows):
        if not groups:
            return A, zero, zero
        kw = dict(reg=reg, item_axis=item_axis,
                  num_fixed_rows=num_fixed_rows, **common)

        def body(A_loc, Bf_loc, FF, *groups_loc):
            Bf_full = jax.lax.all_gather(Bf_loc, axis_name, axis=0,
                                         tiled=True)
            nu = de = zero
            for g in groups_loc:
                g = jax.tree.map(lambda x: x[0], g)  # drop shard axis
                A_loc, n, dn = _apply_group(A_loc, Bf_full, FF, g, **kw)
                nu, de = nu + n, de + dn
            return (A_loc, jax.lax.psum(nu, axis_name),
                    jax.lax.psum(de, axis_name))

        group_specs = tuple(
            jax.tree.map(lambda _: PS(axis_name), g) for g in groups)
        # check_vma off: the scan carry inside _apply_group starts from
        # an unvarying zero and accumulates device-varying terms, which
        # the vma checker rejects; the explicit psums below make the
        # scalar outputs replicated.
        run = jax.shard_map(
            body, mesh=mesh,
            in_specs=(PS(axis_name), PS(axis_name), PS()) + group_specs,
            out_specs=(PS(axis_name), PS(), PS()), check_vma=False)
        return run(A, Bf, FF, *groups)

    nume = deno = zero
    FF = gramian(Q)  # GSPMD reduces the per-shard partial products
    P, n, dn = sharded_half(P, Q, FF, row_groups, reg=reg_u,
                            item_axis=False, num_fixed_rows=num_q_rows)
    nume, deno = nume + n, deno + dn
    for sb in row_segments:
        P, n, dn = _apply_group(P, Q, FF, sb, reg=reg_u, item_axis=False,
                                num_fixed_rows=num_q_rows, **common)
        nume, deno = nume + n, deno + dn

    FF = gramian(P)
    Q, n, dn = sharded_half(Q, P, FF, col_groups, reg=reg_i,
                            item_axis=True, num_fixed_rows=num_p_rows)
    nume, deno = nume + n, deno + dn
    for sb in col_segments:
        Q, n, dn = _apply_group(Q, P, FF, sb, reg=reg_i, item_axis=True,
                                num_fixed_rows=num_p_rows, **common)
        nume, deno = nume + n, deno + dn
    return P, Q, nume, deno


@partial(jax.jit, static_argnames=(
    "optimizer", "alpha", "reg", "adaptive_reg", "cg_iters", "cg_tol",
    "block_size", "item_axis", "num_fixed_rows", "compute_loss"),
    donate_argnums=(0,))
def als_step(P, Q, FF, rows, lens, cols, vals, *, optimizer, alpha, reg,
             adaptive_reg, cg_iters, cg_tol, block_size, item_axis,
             num_fixed_rows, compute_loss):
    """Full jitted half-epoch batch step: gather -> solve -> scatter.

    Module-level (not a per-model closure) so the XLA executable cache
    is shared across model instances within a process.  ``P`` is
    donated — the factor table updates in place in HBM.
    """
    safe_rows = jnp.minimum(rows, P.shape[0] - 1)
    p = jnp.take(P, safe_rows, axis=0)
    F = jnp.take(Q, cols, axis=0)
    common = dict(alpha=alpha, reg=reg, adaptive_reg=adaptive_reg,
                  item_axis=item_axis, num_fixed_rows=num_fixed_rows,
                  compute_loss=compute_loss)
    if optimizer == "ialspp":
        x, nume, deno = ialspp_solve_batch(
            p, F, FF, lens, vals, block_size=block_size, cg_tol=cg_tol,
            **common)
    else:
        x, nume, deno = als_solve_batch(
            p, F, FF, lens, vals, optimizer=optimizer, cg_iters=cg_iters,
            cg_tol=cg_tol, **common)
    P = P.at[rows].set(x, mode="drop")
    return P, nume, deno
