"""Skip-gram negative-sampling (word2vec) megabatch kernels.

Counterpart of ``lib/algo_impl/w2v/w2v.cc``: per (input=context,
target=center) pair, draw ``num_negatives`` negatives from the
cumulative unigram^0.75 table (w2v.cc:248-256), compute the SGNS
gradients and update the input table ``L0`` and context table ``L1``
(w2v.cc:274-320).  The hogwild per-pair updates become scatter-adds
over a fixed-size pair chunk.

Note: the gradient here is the standard SGNS ``g = label - sigmoid(f)``
with the reference's +-MAX_EXP clamps.  (The reference's mid-range
table lookup returns ``1 - sigmoid`` which contradicts its own clamp
branches, w2v.cc:286-300 — we match the clamps / the original
word2vec.c semantics, not the inconsistency.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_EXP = 6.0
EPS = 1e-10


def _g(label, f):
    """label - sigmoid(f) with hard clamps at +-MAX_EXP."""
    mid = label - jax.nn.sigmoid(f)
    return jnp.where(f > MAX_EXP, label - 1.0,
                     jnp.where(f < -MAX_EXP, label, mid))


def _clipped_apply(T, dT, cap):
    """Apply a dense table delta with the per-row L2 step-norm cap
    (``max_step_norm``; 0/None disables) — ONE definition shared by
    the host-pair, single-device-stream and dp-stream paths, whose
    factors are parity-tested against each other."""
    if not cap:
        return T + dT
    norms = jnp.sqrt(jnp.sum(dT * dT, axis=-1, keepdims=True))
    return T + dT * jnp.minimum(1.0, cap / jnp.maximum(norms, 1e-20))


@partial(jax.jit, static_argnames=("num_negatives", "vocab_size",
                                   "compute_loss", "max_step_norm"),
         donate_argnums=(0, 1))
def w2v_epoch(L0, L1, inputs, targets, dist, rng_key, processed0,
              *, num_negatives, vocab_size, compute_loss, lr, min_lr,
              total_words, words_per_chunk, max_step_norm=0.1):
    """One full epoch in ONE dispatch: lax.scan over (nchunks, N)
    pair chunks staged on device, with the reference's linear lr decay
    by processed-word progress inside the scan (w2v.cc:349-359).

    ``processed0`` is the word count before this epoch;
    ``words_per_chunk`` advances the decay per chunk.  The lr/decay
    scalars are traced (NOT static): hashing per-epoch floats into the
    compile key would recompile the scan program every epoch.
    Returns (L0, L1, loss_sum, pair_count).
    """
    nchunks = inputs.shape[0]

    def body(carry, xs):
        L0, L1, loss, cnt = carry
        bi, bt, cidx = xs
        sub = jax.random.fold_in(rng_key, cidx)
        progress = jnp.minimum(
            (processed0 + cidx.astype(jnp.float32) * words_per_chunk)
            / jnp.maximum(total_words, 1.0), 1.0)
        lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)
        L0, L1, l, c = _w2v_step_body(
            L0, L1, bi, bt, dist, sub, lr_t,
            num_negatives=num_negatives, vocab_size=vocab_size,
            compute_loss=compute_loss, max_step_norm=max_step_norm)
        return (L0, L1, loss + l, cnt + c), None

    init = (L0, L1, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    (L0, L1, loss, cnt), _ = jax.lax.scan(
        body, init, (inputs, targets, jnp.arange(nchunks)))
    return L0, L1, loss, cnt


@partial(jax.jit, static_argnames=("mesh", "axis_name", "num_negatives",
                                   "vocab_size", "compute_loss",
                                   "max_step_norm"),
         donate_argnums=(0, 1))
def w2v_epoch_dp(L0, L1, inputs, targets, dist, rng_key, processed0,
                 *, mesh, axis_name="d", num_negatives, vocab_size,
                 compute_loss, lr, min_lr, total_words, words_per_chunk,
                 max_step_norm=0.1):
    """One W2V epoch over a device mesh (dp): pair chunks shard on the
    batch axis, tables replicate, negatives draw globally + slice
    locally (bit-identical to ``w2v_epoch``), and each chunk's dense
    deltas psum before the step-norm-capped apply — the cap must see
    the GLOBAL per-row delta, so it runs after the reduction."""
    from jax.sharding import PartitionSpec as PS

    nchunks, N = inputs.shape
    D = mesh.size
    assert N % D == 0, (N, D)
    N_loc = N // D

    def body_fn(L0, L1, inputs_s, targets_s, dist_):
        idx = jax.lax.axis_index(axis_name)

        def body(carry, xs):
            L0, L1, loss, cnt = carry
            bi, bt, cidx = xs
            sub = jax.random.fold_in(rng_key, cidx)
            progress = jnp.minimum(
                (processed0 + cidx.astype(jnp.float32) * words_per_chunk)
                / jnp.maximum(total_words, 1.0), 1.0)
            lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)
            L0, L1, l, c = _w2v_step_body(
                L0, L1, bi, bt, dist_, sub, lr_t,
                num_negatives=num_negatives, vocab_size=vocab_size,
                compute_loss=compute_loss, max_step_norm=max_step_norm,
                axis_name=axis_name, row_offset=idx * N_loc,
                global_B=N)
            return (L0, L1, loss + l, cnt + c), None

        init = (L0, L1, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))
        (L0, L1, loss, cnt), _ = jax.lax.scan(
            body, init, (inputs_s, targets_s, jnp.arange(nchunks)))
        return (L0, L1, jax.lax.psum(loss, axis_name),
                jax.lax.psum(cnt, axis_name))

    run = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(PS(), PS(), PS(None, axis_name), PS(None, axis_name),
                  PS()),
        out_specs=(PS(), PS(), PS(), PS()), check_vma=False)
    return run(L0, L1, inputs, targets, dist)


@partial(jax.jit, static_argnames=("window", "block", "num_negatives",
                                   "vocab_size", "compute_loss",
                                   "max_step_norm", "offset_mode"),
         donate_argnums=(0, 1))
def w2v_epoch_stream(L0, L1, words, bounds, half, rng_key, processed0,
                     dist, *, window, block, num_negatives, vocab_size,
                     compute_loss, lr, min_lr, total_words,
                     words_per_chunk, max_step_norm=0.1,
                     offset_mode="scan"):
    """On-device skip-gram pair expansion: one dispatch per token-chunk
    group, NO per-pair host arrays.

    The host-pair path ships ~8 bytes x pairs (~0.5 GB/epoch at the
    KakaoBrunch stream shape, ~12 s over the tunnel) and scatters
    2 + K table rows per pair (~40 s/epoch at the 133 ns/row HBM
    floor).  This kernel instead takes the SUBSAMPLED token stream
    (words / sentence ids / shrunken half-windows — ~9 bytes/token)
    and expands pairs internally as offset-rolled slices
    (w2v.cc:238-246 expands the same (center, context) set per
    worker):

    * position-major delta accumulation: every offset's contribution
      lands in aligned (T, d) buffers (dense adds), and only ONE
      scatter of T rows per table happens at chunk end — 2 rows per
      TOKEN instead of 2 + K rows per PAIR (~25x less scatter).
    * block-shared negatives: each run of ``block`` consecutive tokens
      shares one set of ``num_negatives`` draws for all its pairs
      (the pWord2Vec / GPU-word2vec trick), so negative scoring and
      gradients become small batched einsums against a (K, d) tile
      and the negative scatter is K rows per block, not K per pair.
      A drawn negative that equals the pair's center word contributes
      zero (the reference redraws instead, w2v.cc:248-255).

    Pairs whose two ends fall in different token-chunks are dropped
    (<= window * nchunks of ~66M at the brunch shape, < 1e-5) —
    the analog of the reference's job-boundary granularity.

    words: int32 (nchunks, T) — compacted kept tokens, sentinel
    ``vocab_size`` padding.  bounds: uint8 (nchunks, T) — 1 where a
    sentence starts (pad positions carry 1 so every pad is its own
    sentence); sentence ids are recovered on device as a per-chunk
    cumsum, which is what lets the host ship 1 byte/token instead of
    a 4-byte sentence id.  half: uint8 (nchunks, T) shrunken
    half-window per CENTER position (window - b, b ~ U[0, window)).
    The r5 decomposition (`w2v_stream_decomp.log`) measured the int32
    encoding's 151 MB/epoch upload at 2.3-3.9 s over the ~40 MB/s
    tunnel vs a 1.5 s dispatch — the bytes ARE the epoch, hence the
    uint8 wire format (72 MB).
    Returns (L0, L1, loss_sum, pair_count).

    ``offset_mode``: "unrolled" emits one copy of the offset pass per
    window position (bigger program, maximal cross-offset fusion);
    "scan" runs ONE compiled pass under ``lax.scan`` over the traced
    offset (~window-times smaller program, for when the remote-compile
    wall dominates — the full-shape unrolled compile measured ~20 min
    on the tunneled v5e).  Both modes share the same math (pad +
    dynamic_slice shifting); factors agree to fp-reorder tolerance.
    """
    nchunks, T = words.shape
    NB = T // block
    d = L0.shape[1]
    K = num_negatives

    def body(carry, xs):
        L0, L1, loss, cnt = carry
        wc, bc, hc8, cidx = xs
        sc = jnp.cumsum(bc.astype(jnp.int32))
        hc = hc8.astype(jnp.int32)
        sub = jax.random.fold_in(rng_key, cidx)
        progress = jnp.minimum(
            (processed0 + cidx.astype(jnp.float32) * words_per_chunk)
            / jnp.maximum(total_words, 1.0), 1.0)
        lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)

        dist_prob, dist_alias = dist
        from buffalo_tpu.ops.sgd_kernels import draw_from_alias
        negs = draw_from_alias(sub, (NB, K), dist_prob, dist_alias)
        ln = jnp.take(L1, negs, axis=0)                # (NB, K, d)

        dL0p, dL1p, dLn, loss_c, cnt_c = _stream_chunk_deltas(
            L0, L1, wc, sc, hc, ln, negs, window=window, block=block,
            vocab_size=vocab_size, compute_loss=compute_loss,
            offset_mode=offset_mode)

        dL0 = jnp.zeros_like(L0).at[wc].add(lr_t * dL0p, mode="drop")
        L0 = _clipped_apply(L0, dL0, max_step_norm)
        dL1 = jnp.zeros_like(L1).at[wc].add(lr_t * dL1p, mode="drop")
        dL1 = dL1.at[negs.reshape(-1)].add(
            lr_t * dLn.reshape(-1, d), mode="drop")
        L1 = _clipped_apply(L1, dL1, max_step_norm)
        return (L0, L1, loss + loss_c, cnt + cnt_c), None

    init = (L0, L1, jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32))
    (L0, L1, loss, cnt), _ = jax.lax.scan(
        body, init, (words, bounds, half, jnp.arange(nchunks)))
    return L0, L1, loss, cnt


def _stream_chunk_deltas(L0, L1, wc, sc, hc, ln, negs, *, window,
                         block, vocab_size, compute_loss, offset_mode):
    """Position-major skip-gram deltas for ONE token chunk.

    Returns (dL0p (T,d), dL1p (T,d), dLn (NB,K,d), loss, pair_count);
    the caller scatters the position deltas into the tables (per-row
    step-norm cap included there).  Shared by the single-device and
    dp-mesh stream epochs — the chunk may be a LOCAL shard of a
    global chunk (negatives then come pre-sliced so block->negative
    assignment matches the single-device stream)."""
    T = wc.shape[0]
    d = L0.shape[1]
    NB, K = negs.shape

    valid_tok = wc < vocab_size
    safe_w = jnp.minimum(wc, vocab_size - 1)
    l0_pos = jnp.take(L0, safe_w, axis=0)          # (T, d)
    l1_pos = jnp.take(L1, safe_w, axis=0)          # (T, d)

    pos_idx = jnp.arange(T)
    # center word of each position's block-shared negatives: mask a
    # negative that equals the pair's CENTER word (per direction)
    negs_pos = jnp.repeat(negs, block, axis=0)     # (T, K)

    # shifting by `off` is pad + slice (works for traced offsets;
    # the pad values are inert: wc pad = vocab_size -> invalid,
    # sc pad = -2 never equals a real or sentinel (-1) id)
    wc_p = jnp.concatenate([wc, jnp.full(window, vocab_size,
                                         wc.dtype)])
    sc_p = jnp.concatenate([sc, jnp.full(window, -2, sc.dtype)])
    hc_p = jnp.concatenate([hc, jnp.zeros(window, hc.dtype)])
    l0_p = jnp.concatenate([l0_pos, jnp.zeros((window, d),
                                              l0_pos.dtype)])
    l1_p = jnp.concatenate([l1_pos, jnp.zeros((window, d),
                                              l1_pos.dtype)])
    zpad = jnp.zeros((window, d), jnp.float32)

    def nxt(xp, off):
        return jax.lax.dynamic_slice_in_dim(xp, off, T, axis=0)

    def fwd(c, off):
        # place contribution computed at i onto position i + off
        return jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([zpad, c]), window - off, T, axis=0)

    def one_off(off, carry):
        dL0p, dL1p, dLn, loss_c, cnt_c = carry
        in_range = pos_idx < T - off
        same = (sc == nxt(sc_p, off)) & in_range
        w_next = nxt(wc_p, off)
        l0_next = nxt(l0_p, off)
        l1_next = nxt(l1_p, off)
        both = same & valid_tok & (w_next < vocab_size)

        # direction A: center i, context i+off (context's window
        # check rides the CENTER's shrunken half, w2v.cc:239-241)
        va = (both & (off <= hc)).astype(jnp.float32)
        # direction B: center i+off, context i
        vb = (both & (off <= nxt(hc_p, off))).astype(jnp.float32)

        # ---- direction A: L0 row = w_next (context), L1 = wc
        f_a = jnp.sum(l0_next * l1_pos, axis=-1)
        g_a = _g(1.0, f_a) * va
        dL1p = dL1p + (g_a[:, None] * l0_next)
        contrib_a = g_a[:, None] * l1_pos
        # ---- direction B: L0 row = wc (context), L1 = w_next
        f_b = jnp.sum(l0_pos * l1_next, axis=-1)
        g_b = _g(1.0, f_b) * vb
        dL0p = dL0p + (g_b[:, None] * l1_next)
        contrib_b = g_b[:, None] * l0_pos

        # negatives: shared per block of the pair's POSITION; the
        # center word differs per direction (wc for A at i,
        # w_next for B), so the neg==center mask does too
        l0n_a = l0_next.reshape(NB, block, d)
        f_na = jnp.einsum("nsd,nkd->nsk", l0n_a, ln,
                          preferred_element_type=jnp.float32)
        mask_a = (negs_pos != wc[:, None]).astype(jnp.float32) \
            .reshape(NB, block, K)
        g_na = _g(0.0, f_na) * va.reshape(NB, block, 1) * mask_a
        dLn = dLn + jnp.einsum("nsk,nsd->nkd", g_na, l0n_a,
                               preferred_element_type=jnp.float32)
        neg_back_a = jnp.einsum(
            "nsk,nkd->nsd", g_na, ln,
            preferred_element_type=jnp.float32).reshape(T, d)

        l0n_b = l0_pos.reshape(NB, block, d)
        f_nb = jnp.einsum("nsd,nkd->nsk", l0n_b, ln,
                          preferred_element_type=jnp.float32)
        mask_b = (negs_pos != w_next[:, None]).astype(jnp.float32) \
            .reshape(NB, block, K)
        g_nb = _g(0.0, f_nb) * vb.reshape(NB, block, 1) * mask_b
        dLn = dLn + jnp.einsum("nsk,nsd->nkd", g_nb, l0n_b,
                               preferred_element_type=jnp.float32)
        dL0p = dL0p + jnp.einsum(
            "nsk,nkd->nsd", g_nb, ln,
            preferred_element_type=jnp.float32).reshape(T, d)

        # contributions that land at position i+off
        dL0p = dL0p + fwd(contrib_a + neg_back_a, off)
        dL1p = dL1p + fwd(contrib_b, off)

        if compute_loss:
            loss_c = loss_c \
                - jnp.sum(va * jnp.log(jax.nn.sigmoid(f_a) + EPS)) \
                - jnp.sum(vb * jnp.log(jax.nn.sigmoid(f_b) + EPS)) \
                - jnp.sum(va.reshape(NB, block, 1) * mask_a
                          * jnp.log(1.0 - jax.nn.sigmoid(f_na)
                                    + EPS)) \
                - jnp.sum(vb.reshape(NB, block, 1) * mask_b
                          * jnp.log(1.0 - jax.nn.sigmoid(f_nb)
                                    + EPS))
        cnt_c = cnt_c + jnp.sum(va) + jnp.sum(vb)
        return (dL0p, dL1p, dLn, loss_c, cnt_c)

    carry0 = (jnp.zeros_like(l0_pos), jnp.zeros_like(l1_pos),
              jnp.zeros_like(ln), jnp.zeros((), jnp.float32),
              jnp.zeros((), jnp.float32))
    if offset_mode == "unrolled":
        carry_off = carry0
        for off in range(1, window + 1):
            carry_off = one_off(off, carry_off)
    else:
        carry_off, _ = jax.lax.scan(
            lambda c, off: (one_off(off, c), None), carry0,
            jnp.arange(1, window + 1))
    dL0p, dL1p, dLn, loss_c, cnt_c = carry_off
    return dL0p, dL1p, dLn, loss_c, cnt_c


def w2v_epoch_stream_dp(L0, L1, words, bounds, half, rng_key,
                        processed0, dist, *, mesh, axis_name="d",
                        window, block, num_negatives, vocab_size,
                        compute_loss, lr, min_lr, total_words,
                        words_per_chunk, max_step_norm=0.1,
                        offset_mode="scan"):
    """On-device pair expansion over a device mesh (dp).

    Token chunks shard on the POSITION axis (each device expands the
    windows of its contiguous T/D-token slice; pairs spanning a shard
    boundary are dropped — <= window * D * nchunks of the epoch, the
    same granularity loss as the chunk boundaries).  Tables replicate;
    negatives draw from the GLOBAL (T/block, K) block shape and
    row-slice, so each block sees the same draws as the single-device
    stream; each chunk's dense table deltas psum before the
    step-norm-capped apply (the cap must see the GLOBAL per-row
    delta).  T/D must be a multiple of ``block``.
    """
    from jax.sharding import PartitionSpec as PS

    nchunks, T = words.shape
    D = mesh.size
    T_loc = T // D
    assert T_loc % block == 0, (T, D, block)
    NB_g = T // block
    NB_loc = T_loc // block
    K = num_negatives
    d = L0.shape[1]

    def body_fn(L0, L1, words_s, bounds_s, half_s, dist_):
        idx = jax.lax.axis_index(axis_name)

        def body(carry, xs):
            L0, L1, loss, cnt = carry
            wc, bc, hc8, cidx = xs
            # per-shard cumsum: sentence equality is only tested
            # within a shard (boundary pairs are dropped by design)
            sc = jnp.cumsum(bc.astype(jnp.int32))
            hc = hc8.astype(jnp.int32)
            sub = jax.random.fold_in(rng_key, cidx)
            progress = jnp.minimum(
                (processed0 + cidx.astype(jnp.float32)
                 * words_per_chunk)
                / jnp.maximum(total_words, 1.0), 1.0)
            lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)

            dist_prob, dist_alias = dist_
            from buffalo_tpu.ops.sgd_kernels import draw_from_alias
            negs_g = draw_from_alias(sub, (NB_g, K), dist_prob,
                                     dist_alias)
            negs = jax.lax.dynamic_slice_in_dim(
                negs_g, idx * NB_loc, NB_loc, axis=0)
            ln = jnp.take(L1, negs, axis=0)

            dL0p, dL1p, dLn, loss_c, cnt_c = _stream_chunk_deltas(
                L0, L1, wc, sc, hc, ln, negs, window=window,
                block=block, vocab_size=vocab_size,
                compute_loss=compute_loss, offset_mode=offset_mode)

            dL0 = jnp.zeros_like(L0).at[wc].add(lr_t * dL0p,
                                                mode="drop")
            dL0 = jax.lax.psum(dL0, axis_name)
            L0 = _clipped_apply(L0, dL0, max_step_norm)
            dL1 = jnp.zeros_like(L1).at[wc].add(lr_t * dL1p,
                                                mode="drop")
            dL1 = dL1.at[negs.reshape(-1)].add(
                lr_t * dLn.reshape(-1, d), mode="drop")
            dL1 = jax.lax.psum(dL1, axis_name)
            L1 = _clipped_apply(L1, dL1, max_step_norm)
            return (L0, L1, loss + loss_c, cnt + cnt_c), None

        init = (L0, L1, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))
        (L0, L1, loss, cnt), _ = jax.lax.scan(
            body, init,
            (words_s, bounds_s, half_s, jnp.arange(nchunks)))
        return (L0, L1, jax.lax.psum(loss, axis_name),
                jax.lax.psum(cnt, axis_name))

    run = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(PS(), PS(), PS(None, axis_name),
                  PS(None, axis_name), PS(None, axis_name), PS()),
        out_specs=(PS(), PS(), PS(), PS()), check_vma=False)
    return run(L0, L1, words, bounds, half, dist)


w2v_epoch_stream_dp = partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "window", "block", "num_negatives",
    "vocab_size", "compute_loss", "max_step_norm", "offset_mode"),
    donate_argnums=(0, 1))(w2v_epoch_stream_dp)


@partial(jax.jit, static_argnames=("num_negatives", "vocab_size",
                                   "compute_loss", "max_step_norm"),
         donate_argnums=(0, 1))
def w2v_step(L0, L1, inputs, targets, dist, rng_key, lr,
             *, num_negatives, vocab_size, compute_loss,
             max_step_norm=0.1):
    """One pair-chunk update.  Returns (L0, L1, loss_sum, pair_count).

    inputs/targets: int32[B] vocab indices; padding carries
    ``vocab_size`` (dropped).  dist: (prob, alias) Walker-alias pair
    over the unigram^0.75 weights (``sgd_kernels.build_alias_table``).
    """
    return _w2v_step_body(L0, L1, inputs, targets, dist, rng_key, lr,
                          num_negatives=num_negatives,
                          vocab_size=vocab_size, compute_loss=compute_loss,
                          max_step_norm=max_step_norm)


def _w2v_step_body(L0, L1, inputs, targets, dist, rng_key, lr,
                   *, num_negatives, vocab_size, compute_loss,
                   max_step_norm=0.1, axis_name=None, row_offset=None,
                   global_B=None):
    """One pair-chunk update.  With ``axis_name`` set (dp mesh path)
    the chunk is a LOCAL slice of a global batch: negatives are drawn
    from the GLOBAL shape and row-sliced (bit-identical to the
    single-device stream), and the dense deltas psum before the
    clipped apply so the replicated tables stay in sync."""
    B = inputs.shape[0]
    d = L0.shape[1]
    valid = (inputs < vocab_size).astype(jnp.float32)

    # the reference redraws until neg != target (w2v.cc:248-255): a
    # fixed 3-attempt first-valid pick leaves p^3 residual, closed by
    # a deterministic non-target fallback — a center word is never
    # trained as its own negative.  ``dist`` is the (prob, alias)
    # Walker-alias pair (sgd_kernels.build_alias_table) over the
    # unigram^0.75 weights: the reference's per-draw ``lower_bound``
    # binary search (w2v.cc:250-254) is pathological as a TPU program
    # (90% of the epoch, 140 s compiles, and a worker crash at the
    # full 502k brunch vocab — benchmark/microbench_w2v_crash.py), so
    # the draw is one uniform int + two table gathers instead.
    k1, k2, k3 = jax.random.split(rng_key, 3)
    dist_prob, dist_alias = dist

    def _draw(k):
        nb = B if axis_name is None else global_B
        from buffalo_tpu.ops.sgd_kernels import draw_from_alias
        negs = draw_from_alias(k, (nb, num_negatives), dist_prob,
                               dist_alias)
        if axis_name is not None:
            negs = jax.lax.dynamic_slice_in_dim(negs, row_offset, B,
                                                axis=0)
        return negs

    t = targets[:, None]
    negs = _draw(k1)
    negs = jnp.where(negs == t, _draw(k2), negs)
    negs = jnp.where(negs == t, _draw(k3), negs)
    negs = jnp.where(negs == t, (t + 1) % vocab_size, negs)

    safe_in = jnp.minimum(inputs, vocab_size - 1)
    safe_tg = jnp.minimum(targets, vocab_size - 1)
    l0 = jnp.take(L0, safe_in, axis=0)              # (B, d)
    lt = jnp.take(L1, safe_tg, axis=0)              # (B, d)
    ln = jnp.take(L1, negs, axis=0)                 # (B, K, d)

    f_pos = jnp.sum(l0 * lt, axis=-1)
    f_neg = jnp.einsum("bd,bkd->bk", l0, ln,
                       preferred_element_type=jnp.float32)
    g_pos = _g(1.0, f_pos) * valid                  # (B,)
    g_neg = _g(0.0, f_neg) * valid[:, None]         # (B, K)

    if compute_loss:
        loss = -jnp.sum(valid * jnp.log(jax.nn.sigmoid(f_pos) + EPS)) \
            - jnp.sum(valid[:, None]
                      * jnp.log(1.0 - jax.nn.sigmoid(f_neg) + EPS))
    else:
        loss = jnp.zeros((), jnp.float32)

    # Sum-accumulated scatter updates with a per-row step-norm cap
    # (``max_step_norm`` option; 0 disables).  In the sequential
    # hogwild reference a frequent word's updates interleave with
    # sigmoid saturation; a megabatch stacks them uncapped, which
    # diverges geometrically once lr * count > 1.  Capping each row's
    # step norm keeps the update self-limiting while preserving
    # full-magnitude steps for rare words.  A/B on the synthetic
    # analogy gate (benchmark/accuracy.md): capped >= uncapped at the
    # default lr and strictly safer at high lr, so capped is default.
    step_cap = max_step_norm
    dL1 = jnp.zeros_like(L1)
    dL1 = dL1.at[targets].add(lr * g_pos[:, None] * l0, mode="drop")
    dL1 = dL1.at[negs.reshape(-1)].add(
        (lr * g_neg[..., None] * l0[:, None, :]).reshape(-1, d),
        mode="drop")
    if axis_name is not None:
        dL1 = jax.lax.psum(dL1, axis_name)
    L1 = _clipped_apply(L1, dL1, step_cap)

    work = g_pos[:, None] * lt + jnp.einsum(
        "bk,bkd->bd", g_neg, ln, preferred_element_type=jnp.float32)
    dL0 = jnp.zeros_like(L0)
    dL0 = dL0.at[inputs].add(lr * work, mode="drop")
    if axis_name is not None:
        dL0 = jax.lax.psum(dL0, axis_name)
    L0 = _clipped_apply(L0, dL0, step_cap)
    return L0, L1, loss, jnp.sum(valid)
