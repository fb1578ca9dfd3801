"""WARP / CML megabatch kernels.

Counterpart of ``lib/algo_impl/warp/warp.cc``: per positive, search for
a margin-violating negative, weight the gradient by the rank estimate
``Phi = log(max(1, (|I| - |seen| - 1) / trials))`` (warp.cc:137-152),
support ``dot`` and ``l2`` (CML) score functions (warp.cc:21-52), and
after every epoch project all factor rows onto the unit L2 ball
(warp.cc:192-201).

The reference's unbounded rejection loop (up to ``max_trials``
sequential draws per positive) becomes a fixed-K candidate tensor: all
K scores come from one batched matmul, the first violating non-seen
candidate is selected, and its 1-based try index reproduces the
reference's trial counter (two increments per non-violating candidate,
one for the violator — warp.cc:137-150) so the rank weight statistics
match.  Positives whose K candidates contain no violator are skipped,
as the reference skips after ``max_trials`` — with K trials the skipped
tail carries the smallest Phi weights.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from buffalo_tpu.ops.sgd_kernels import bloom_contains


def _scores(p, q, score_func: str):
    """p: (..., d), q: (..., d) -> (...)."""
    if score_func == "l2":
        diff = p - q
        return -jnp.sum(diff * diff, axis=-1)
    return jnp.sum(p * q, axis=-1)


_LAZY_PROBES = 4


def _select_violator_lazy(cand, seen_of, ui, uj, threshold):
    """Pick each sample's first non-seen margin violator, probing the
    bloom filter ONLY at margin-violating candidates.

    The all-candidates probe was measured at 61% of the WARP epoch on
    the v5e (1.28B probes/epoch at ML-20M K=64; microbench_warp r4
    ablations: 18.1 s -> 7.0 s with probes removed).  Violators are
    what the probes are FOR, and per sample only the first few matter:
    probing the first ``_LAZY_PROBES`` margin violators cuts probe
    volume K/J = 16x with two semantic deltas vs the exact path, both
    negligible and both bounded by the filter's ~3% seen rate:

    - a SEEN NON-violating candidate counts toward the trial rank
      (the reference skips it uncounted, warp.cc:139-141), inflating
      ``trial`` by ~0.5% in expectation — Phi shifts by log(1.005);
    - a sample whose first ``_LAZY_PROBES`` margin violators are ALL
      seen is skipped (p ~ seen_rate^4 ~ 1e-6 per sample with more
      than 4 violators).

    With NO seen candidates among the draws the selection and trial
    counts are BIT-IDENTICAL to the all-probe path (parity-tested).

    ``seen_of(cands_1d) -> bool[N]`` probes the filter for one column.
    Returns (any_v bool[N], f int32[N] column of the chosen violator,
    trial int32[N]).
    """
    N, K = cand.shape
    J = min(_LAZY_PROBES, K)
    viol = (ui[:, None] - uj) < threshold              # (N, K)
    r = jnp.cumsum(viol.astype(jnp.int32), axis=1)     # violator rank
    cols, found = [], []
    for j in range(1, J + 1):
        m = viol & (r == j)
        cols.append(jnp.argmax(m, axis=1))
        found.append(jnp.any(m, axis=1))
    cols = jnp.stack(cols, axis=1)                     # (N, J)
    found = jnp.stack(found, axis=1)                   # (N, J)
    cand_j = jnp.take_along_axis(cand, cols, axis=1)   # (N, J)
    seen_j = jax.vmap(seen_of, in_axes=1, out_axes=1)(cand_j)
    ok = found & ~seen_j
    any_v = jnp.any(ok, axis=1)
    jstar = jnp.argmax(ok, axis=1)                     # first ok probe
    f = jnp.take_along_axis(cols, jstar[:, None], axis=1)[:, 0]
    # trial rank = candidates tried up to the violator, minus the
    # probed-seen violators before it (their seen status is known)
    seen_before = jnp.cumsum((seen_j & found).astype(jnp.int32), axis=1)
    sb = jnp.where(
        jstar > 0,
        jnp.take_along_axis(seen_before,
                            jnp.maximum(jstar - 1, 0)[:, None],
                            axis=1)[:, 0],
        0)
    v = f + 1 - sb
    trial = jnp.maximum(2 * v, 1)
    return any_v, f, trial


@partial(jax.jit, static_argnames=(
    "num_items", "num_candidates", "score_func", "threshold",
    "reg_u", "reg_i", "reg_j", "update_i", "update_j",
    "per_coordinate_normalize", "bloom_log2", "probe"),
    donate_argnums=(2, 3, 4, 5))
def warp_accumulate_step(P, Q, gradP, gradQ, countP, countQ,
                         users, positives, indptr, bloom_words, rng_key,
                         *, num_items, num_candidates, score_func,
                         threshold, reg_u, reg_i, reg_j, update_i,
                         update_j, per_coordinate_normalize, bloom_log2,
                         probe="lazy"):
    """One WARP megabatch: adaptive negative search + weighted grads."""
    B = users.shape[0]
    p = jnp.take(P, users, axis=0)              # (B, d)
    qi = jnp.take(Q, positives, axis=0)
    ui = _scores(p, qi, score_func)             # (B,)

    cand = jax.random.randint(rng_key, (B, num_candidates), 0, num_items,
                              dtype=jnp.int32)
    qc = jnp.take(Q, cand, axis=0)              # (B, K, d)
    uj = _scores(p[:, None, :], qc, score_func)  # (B, K)

    if probe == "lazy":
        any_v, f, trial = _select_violator_lazy(
            cand,
            lambda c: bloom_contains(bloom_words, bloom_log2, users, c),
            ui, uj, threshold)
    else:
        seen = jax.vmap(lambda c: bloom_contains(
            bloom_words, bloom_log2, users, c),
                        in_axes=1, out_axes=1)(cand)   # (B, K)
        violating = (~seen) & ((ui[:, None] - uj) < threshold)
        any_v = jnp.any(violating, axis=1)
        f = jnp.argmax(violating, axis=1)       # first violator index

        # reference trial counter: 2 per non-violating non-seen try,
        # 1 for the violator, starting from 1 => trial = 2 * v where v
        # is the violator's 1-based rank among non-seen candidates
        tried = jnp.cumsum((~seen).astype(jnp.int32), axis=1)
        v = jnp.take_along_axis(tried, f[:, None], axis=1)[:, 0]
        trial = jnp.maximum(2 * v, 1)

    seen_size = (indptr[users + 1] - indptr[users]).astype(jnp.int32)
    avail = jnp.maximum(num_items - seen_size - 1, 0)
    phi = jnp.log(jnp.maximum(1, (avail // trial)).astype(jnp.float32))
    w = jnp.where(any_v, phi, 0.0)              # (B,)

    neg = jnp.take_along_axis(cand, f[:, None], axis=1)[:, 0]
    qj = jnp.take_along_axis(qc, f[:, None, None], axis=1)[:, 0, :]

    if score_func == "l2":
        u_deriv = (2.0 * w)[:, None] * (qi - qj)
        i_deriv = w[:, None] * (p - qi)
        j_deriv = -w[:, None] * (p - qj)
    else:
        u_deriv = w[:, None] * (qi - qj)
        i_deriv = w[:, None] * p
        j_deriv = -i_deriv

    # per-sample regularization folded into the accumulated gradient
    # (warp.cc:155-157), applied only for contributing samples
    m = any_v[:, None].astype(jnp.float32)
    gradP = gradP.at[users].add(m * (u_deriv - reg_u * p))
    if update_i:
        gradQ = gradQ.at[positives].add(m * (i_deriv - reg_i * qi))
    if update_j:
        gradQ = gradQ.at[neg].add(m * (j_deriv - reg_j * qj))
    if per_coordinate_normalize:
        mv = any_v.astype(jnp.float32)
        countP = countP.at[users].add(mv)
        countQ = countQ.at[positives].add(mv)
        countQ = countQ.at[neg].add(mv)
    return gradP, gradQ, countP, countQ


@partial(jax.jit, static_argnames=("num_items", "num_candidates",
                                   "bloom_log2"))
def warp_probe_epoch(users, bloom_words, rng_key, *, num_items,
                     num_candidates, bloom_log2):
    """Dispatch 1 of the split WARP epoch: packed candidate seen-bits.

    Draws each chunk's (N, K) candidate tensor with the exact
    ``fold_in(rng_key, chunk)`` stream ``warp_epoch`` uses and probes
    the bloom filter, emitting one uint32 bitmask word per 32
    candidates.  The update program redraws the candidates from the
    same key (deterministic PRNG), so only K bits per sample — not the
    K int32 candidates — cross the program boundary, and the bloom
    gathers never share an XLA program with the gradient scatter-adds.
    """
    nchunks, N = users.shape
    nwords = -(-num_candidates // 32)
    bits = jnp.arange(32, dtype=jnp.uint32)

    def body(carry, xs):
        u_chunk, cidx = xs
        key = jax.random.fold_in(rng_key, cidx)
        cand = jax.random.randint(key, (N, num_candidates), 0, num_items,
                                  dtype=jnp.int32)
        seen = jax.vmap(lambda c: bloom_contains(
            bloom_words, bloom_log2, u_chunk, c),
                        in_axes=1, out_axes=1)(cand)
        pad = nwords * 32 - num_candidates
        if pad:
            seen = jnp.pad(seen, ((0, 0), (0, pad)))
        words = jnp.sum(
            seen.reshape(N, nwords, 32).astype(jnp.uint32) << bits,
            axis=-1, dtype=jnp.uint32)
        return carry, words

    _, seen_bits = jax.lax.scan(body, None,
                                (users, jnp.arange(nchunks)))
    return seen_bits  # (nchunks, N, ceil(K/32)) uint32


def _unpack_seen_bits(words, num_candidates):
    """Inverse of the packing in ``warp_probe_epoch``: (N, K) bool."""
    N, nwords = words.shape
    bits = jnp.arange(32, dtype=jnp.uint32)
    seen = ((words[:, :, None] >> bits) & jnp.uint32(1)).astype(jnp.bool_)
    return seen.reshape(N, nwords * 32)[:, :num_candidates]


@partial(jax.jit, static_argnames=(
    "optimizer", "num_items", "num_candidates", "score_func", "threshold",
    "reg_u", "reg_i", "reg_j", "update_i", "update_j",
    "per_coordinate_normalize", "lr", "beta1", "beta2", "num_valid",
    "bloom_log2", "precomputed_probe", "probe"),
    donate_argnums=(0, 1, 2))
def warp_epoch(P, Q, opt_state, users, positives, indptr, bloom_words,
               rng_key, step, seen_bits=None, *, optimizer, num_items,
               num_candidates, score_func, threshold, reg_u, reg_i,
               reg_j, update_i, update_j, per_coordinate_normalize, lr,
               beta1, beta2, num_valid, bloom_log2,
               precomputed_probe=False, probe="lazy"):
    """One full WARP epoch in ONE dispatch.

    lax.scan over device-resident (nchunks, N) positive chunks
    accumulating deferred gradients, then the epoch-barrier
    adam/adagrad step (``algo.cc:382-465``) and the unit-ball
    projection (``warp.cc:192-201``) — all in the same XLA program.

    ``probe="lazy"`` (default) bloom-probes only each sample's first
    few margin violators (``_select_violator_lazy`` — measured 2.3x
    epoch win, the all-candidates probe was 61% of the epoch);
    ``probe="all"`` keeps the exact trial-rank semantics and is forced
    by ``precomputed_probe`` (the split dispatch ships all-K bits).
    """
    from buffalo_tpu.ops.sgd_kernels import adagrad_update, adam_update

    nchunks, N = users.shape
    if precomputed_probe:
        xs_all = (users, positives, seen_bits, jnp.arange(nchunks))
    else:
        xs_all = (users, positives, jnp.arange(nchunks))

    def body(carry, xs):
        gP, gQ, cP, cQ, found, possible = carry
        if precomputed_probe:
            u_chunk, pos_chunk, bits_chunk, cidx = xs
        else:
            (u_chunk, pos_chunk, cidx), bits_chunk = xs, None
        key = jax.random.fold_in(rng_key, cidx)
        base = cidx * N
        valid = ((base + jnp.arange(N, dtype=jnp.int32))
                 < num_valid).astype(jnp.float32)

        p = jnp.take(P, u_chunk, axis=0)
        qi = jnp.take(Q, pos_chunk, axis=0)
        ui = _scores(p, qi, score_func)
        cand = jax.random.randint(key, (N, num_candidates), 0, num_items,
                                  dtype=jnp.int32)
        qc = jnp.take(Q, cand, axis=0)
        uj = _scores(p[:, None, :], qc, score_func)
        if probe == "lazy" and not precomputed_probe:
            any_v, f, trial = _select_violator_lazy(
                cand,
                lambda c: bloom_contains(bloom_words, bloom_log2,
                                         u_chunk, c),
                ui, uj, threshold)
        else:
            if precomputed_probe:
                seen = _unpack_seen_bits(bits_chunk, num_candidates)
            else:
                seen = jax.vmap(lambda c: bloom_contains(
                    bloom_words, bloom_log2, u_chunk, c),
                                in_axes=1, out_axes=1)(cand)
            violating = (~seen) & ((ui[:, None] - uj) < threshold)
            any_v = jnp.any(violating, axis=1)
            f = jnp.argmax(violating, axis=1)
            tried = jnp.cumsum((~seen).astype(jnp.int32), axis=1)
            v = jnp.take_along_axis(tried, f[:, None], axis=1)[:, 0]
            trial = jnp.maximum(2 * v, 1)
        seen_size = (indptr[u_chunk + 1] - indptr[u_chunk]).astype(jnp.int32)
        avail = jnp.maximum(num_items - seen_size - 1, 0)
        phi = jnp.log(jnp.maximum(1, (avail // trial)).astype(jnp.float32))
        w = jnp.where(any_v, phi, 0.0) * valid

        neg = jnp.take_along_axis(cand, f[:, None], axis=1)[:, 0]
        qj = jnp.take_along_axis(qc, f[:, None, None], axis=1)[:, 0, :]
        if score_func == "l2":
            u_deriv = (2.0 * w)[:, None] * (qi - qj)
            i_deriv = w[:, None] * (p - qi)
            j_deriv = -w[:, None] * (p - qj)
        else:
            u_deriv = w[:, None] * (qi - qj)
            i_deriv = w[:, None] * p
            j_deriv = -i_deriv
        m = (any_v.astype(jnp.float32) * valid)[:, None]
        gP = gP.at[u_chunk].add(u_deriv - m * reg_u * p)
        if update_i:
            gQ = gQ.at[pos_chunk].add(i_deriv - m * reg_i * qi)
        if update_j:
            gQ = gQ.at[neg].add(j_deriv - m * reg_j * qj)
        if per_coordinate_normalize:
            mv = any_v.astype(jnp.float32) * valid
            cP = cP.at[u_chunk].add(mv)
            cQ = cQ.at[pos_chunk].add(mv)
            cQ = cQ.at[neg].add(mv)
        found = found + jnp.sum(any_v.astype(jnp.float32) * valid)
        possible = possible + jnp.sum(valid)
        return (gP, gQ, cP, cQ, found, possible), None

    init = (jnp.zeros_like(P), jnp.zeros_like(Q),
            jnp.zeros(P.shape[0], jnp.float32),
            jnp.zeros(Q.shape[0], jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0))
    (gP, gQ, cP, cQ, found, possible), _ = jax.lax.scan(body, init,
                                                        xs_all)

    def apply(param, grad, m, v, counts, reg):
        if per_coordinate_normalize:
            c = jnp.maximum(counts, 1.0)
            grad = grad / c[:, None]
        grad = grad - 2.0 * reg * param
        if optimizer == "adam":
            delta, m, v = adam_update(grad, m, v, step, lr, beta1, beta2)
        else:
            delta, v = adagrad_update(grad, v, lr)
        return param + delta, m, v

    P, opt_state["mP"], opt_state["vP"] = apply(
        P, gP, opt_state["mP"], opt_state["vP"], cP, reg_u)
    Q, opt_state["mQ"], opt_state["vQ"] = apply(
        Q, gQ, opt_state["mQ"], opt_state["vQ"], cQ, reg_i)
    P = project_unit_ball(P)
    Q = project_unit_ball(Q)
    # found-violator fraction: the driver's adaptive trial schedule
    # grows num_candidates as violations get rarer (the analog of the
    # reference's rising average trial count, warp.cc:118-136)
    found_frac = found / jnp.maximum(possible, 1.0)
    return P, Q, opt_state, found_frac


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "optimizer", "num_items", "num_candidates",
    "score_func", "threshold", "reg_u", "reg_i", "reg_j", "update_i",
    "update_j", "per_coordinate_normalize", "lr", "beta1", "beta2",
    "num_valid", "bloom_log2", "probe"),
    donate_argnums=(0, 1, 2))
def warp_epoch_dp(P, Q, opt_state, users, positives, indptr, bloom_words,
                  rng_key, step, *, mesh, axis_name="d", optimizer,
                  num_items, num_candidates, score_func, threshold,
                  reg_u, reg_i, reg_j, update_i, update_j,
                  per_coordinate_normalize, lr, beta1, beta2, num_valid,
                  bloom_log2, probe="lazy"):
    """One WARP epoch over a device mesh (dp).

    Chunks shard on the batch axis; tables replicate.  The candidate
    tensor is drawn GLOBALLY from the chunk key on every device
    (bit-identical to ``warp_epoch``) and row-sliced locally, so the
    bloom probes, candidate scoring matmuls, and gradient math shard
    while the trial-rank statistics match the single-device epoch
    exactly.  WARP is fully deferred (``algo.cc:382-465``), so the
    accumulated gradients psum ONCE at the epoch barrier, then the
    optimizer step and unit-ball projection (``warp.cc:192-201``) run
    replicated.
    """
    from jax.sharding import PartitionSpec as PS

    from buffalo_tpu.ops.sgd_kernels import adagrad_update, adam_update

    nchunks, N = users.shape
    D = mesh.size
    assert N % D == 0, (N, D)
    N_loc = N // D

    def body_fn(P, Q, opt_state, users_s, positives_s, indptr_, bloom_w):
        idx = jax.lax.axis_index(axis_name)

        def body(carry, xs):
            gP, gQ, cP, cQ, found, possible = carry
            u_chunk, pos_chunk, cidx = xs
            key = jax.random.fold_in(rng_key, cidx)
            gpos = (cidx * N + idx * N_loc
                    + jnp.arange(N_loc, dtype=jnp.int32))
            valid = (gpos < num_valid).astype(jnp.float32)

            p = jnp.take(P, u_chunk, axis=0)
            qi = jnp.take(Q, pos_chunk, axis=0)
            ui = _scores(p, qi, score_func)
            cand_g = jax.random.randint(key, (N, num_candidates), 0,
                                        num_items, dtype=jnp.int32)
            cand = jax.lax.dynamic_slice_in_dim(cand_g, idx * N_loc,
                                                N_loc, axis=0)
            qc = jnp.take(Q, cand, axis=0)
            uj = _scores(p[:, None, :], qc, score_func)
            if probe == "lazy":
                any_v, f, trial = _select_violator_lazy(
                    cand,
                    lambda c: bloom_contains(bloom_w, bloom_log2,
                                             u_chunk, c),
                    ui, uj, threshold)
            else:
                seen = jax.vmap(lambda c: bloom_contains(
                    bloom_w, bloom_log2, u_chunk, c),
                                in_axes=1, out_axes=1)(cand)
                violating = (~seen) & ((ui[:, None] - uj) < threshold)
                any_v = jnp.any(violating, axis=1)
                f = jnp.argmax(violating, axis=1)
                tried = jnp.cumsum((~seen).astype(jnp.int32), axis=1)
                v = jnp.take_along_axis(tried, f[:, None],
                                        axis=1)[:, 0]
                trial = jnp.maximum(2 * v, 1)
            seen_size = (indptr_[u_chunk + 1]
                         - indptr_[u_chunk]).astype(jnp.int32)
            avail = jnp.maximum(num_items - seen_size - 1, 0)
            phi = jnp.log(jnp.maximum(
                1, (avail // trial)).astype(jnp.float32))
            w = jnp.where(any_v, phi, 0.0) * valid

            neg = jnp.take_along_axis(cand, f[:, None], axis=1)[:, 0]
            qj = jnp.take_along_axis(qc, f[:, None, None],
                                     axis=1)[:, 0, :]
            if score_func == "l2":
                u_deriv = (2.0 * w)[:, None] * (qi - qj)
                i_deriv = w[:, None] * (p - qi)
                j_deriv = -w[:, None] * (p - qj)
            else:
                u_deriv = w[:, None] * (qi - qj)
                i_deriv = w[:, None] * p
                j_deriv = -i_deriv
            m = (any_v.astype(jnp.float32) * valid)[:, None]
            gP = gP.at[u_chunk].add(u_deriv - m * reg_u * p)
            if update_i:
                gQ = gQ.at[pos_chunk].add(i_deriv - m * reg_i * qi)
            if update_j:
                gQ = gQ.at[neg].add(j_deriv - m * reg_j * qj)
            if per_coordinate_normalize:
                mv = any_v.astype(jnp.float32) * valid
                cP = cP.at[u_chunk].add(mv)
                cQ = cQ.at[pos_chunk].add(mv)
                cQ = cQ.at[neg].add(mv)
            found = found + jnp.sum(any_v.astype(jnp.float32) * valid)
            possible = possible + jnp.sum(valid)
            return (gP, gQ, cP, cQ, found, possible), None

        init = (jnp.zeros_like(P), jnp.zeros_like(Q),
                jnp.zeros(P.shape[0], jnp.float32),
                jnp.zeros(Q.shape[0], jnp.float32),
                jnp.float32(0.0), jnp.float32(0.0))
        (gP, gQ, cP, cQ, found, possible), _ = jax.lax.scan(
            body, init, (users_s, positives_s, jnp.arange(nchunks)))
        gP = jax.lax.psum(gP, axis_name)
        gQ = jax.lax.psum(gQ, axis_name)
        cP = jax.lax.psum(cP, axis_name)
        cQ = jax.lax.psum(cQ, axis_name)
        found = jax.lax.psum(found, axis_name)
        possible = jax.lax.psum(possible, axis_name)

        def apply(param, grad, m, v, counts, reg):
            if per_coordinate_normalize:
                c = jnp.maximum(counts, 1.0)
                grad = grad / c[:, None]
            grad = grad - 2.0 * reg * param
            if optimizer == "adam":
                delta, m, v = adam_update(grad, m, v, step, lr, beta1,
                                          beta2)
            else:
                delta, v = adagrad_update(grad, v, lr)
            return param + delta, m, v

        Po, mP, vP = apply(P, gP, opt_state["mP"], opt_state["vP"],
                           cP, reg_u)
        Qo, mQ, vQ = apply(Q, gQ, opt_state["mQ"], opt_state["vQ"],
                           cQ, reg_i)
        new_state = dict(opt_state, mP=mP, vP=vP, mQ=mQ, vQ=vQ)
        found_frac = found / jnp.maximum(possible, 1.0)
        return (project_unit_ball(Po), project_unit_ball(Qo), new_state,
                found_frac)

    state_spec = jax.tree.map(lambda _: PS(), opt_state)
    run = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(PS(), PS(), state_spec, PS(None, axis_name),
                  PS(None, axis_name), PS(), PS()),
        out_specs=(PS(), PS(), state_spec, PS()), check_vma=False)
    return run(P, Q, opt_state, users, positives, indptr, bloom_words)


@jax.jit
def project_unit_ball(X):
    """Row-wise projection onto the unit L2 ball (warp.cc:192-201)."""
    norms = jnp.sqrt(jnp.sum(X * X, axis=-1, keepdims=True))
    return X / jnp.maximum(1.0, norms)


@partial(jax.jit, static_argnames=("score_func", "threshold"))
def warp_loss(P, Q, users, positives, negatives, *, score_func, threshold):
    """Violation rate over fixed triplets (warp.cc:205-226)."""
    p = jnp.take(P, users, axis=0)
    ui = _scores(p, jnp.take(Q, positives, axis=0), score_func)
    uj = _scores(p, jnp.take(Q, negatives, axis=0), score_func)
    return jnp.mean(((ui - uj) < threshold).astype(jnp.float32))
