"""Vectorized negative-sampling SGD: the TPU replacement for hogwild.

The reference trains BPR/WARP with a std::thread producer-consumer pool
doing lock-free in-place updates (``lib/algo.cc:133-493``,
``lib/algo_impl/bpr/bpr.cc:72-188``).  On TPU that hazard class
disappears: a megabatch of (user, positive) pairs is drawn, negatives
are sampled vectorized (uniform or popularity^power via cumulative
table, ``bpr.cc:105-117``), rejection of seen items becomes a fixed-K
oversample + first-valid select backed by a bloom-filter membership
probe (``verify_neg`` — never false-negative, so a positive is never
accepted as a negative), and gradients land via deterministic
scatter-adds.  ``bpr_epoch`` runs a whole epoch as one XLA program
(lax.scan over device-resident chunks) — on a remote TPU the
per-dispatch round trip would otherwise dominate.  The deferred-gradient adam/adagrad barrier
(``algo.cc:382-465``: accumulate all epoch gradients, then one
optimizer step per epoch, with optional per-coordinate normalization)
is reproduced exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_EXP = 6.0
FEPS = 1e-8


# --------------------------------------------------------------- sampling
def build_alias_table(weights):
    """Walker/Vose alias tables for O(1) device-side categorical draws.

    The previous draw was ``jnp.searchsorted`` over a cumulative int32
    table — the direct analog of the reference's per-draw
    ``lower_bound`` (w2v.cc:250-254, bpr.cc:105-113).  On the TPU that
    binary search is pathological at large catalogs (measured at vocab
    262k: ~90% of the W2V epoch, a 140 s compile vs 3.3 s without it,
    and at the full 502k brunch vocab the compiled program crashed the
    TPU worker outright — ``benchmark/microbench_w2v_crash.py``).  The
    alias method replaces it with one uniform draw plus two gathers
    from N-row tables; the sampled distribution is exact for the given
    weights (float64 setup arithmetic).

    Host-side, O(N).  Returns (prob float32[N], alias int32[N]).
    """
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    n = int(w.shape[0])
    assert n > 0 and (w >= 0).all(), "weights must be non-negative"
    total = w.sum()
    assert total > 0, "weights must not all be zero"
    p = w * (n / total)
    alias = np.arange(n, dtype=np.int32)
    prob = np.ones(n, dtype=np.float32)
    small = list(np.nonzero(p < 1.0)[0][::-1])
    large = list(np.nonzero(p >= 1.0)[0][::-1])
    while small and large:
        s = int(small.pop())
        big = int(large.pop())
        prob[s] = p[s]
        alias[s] = big
        p[big] -= 1.0 - p[s]
        (large if p[big] >= 1.0 else small).append(big)
    # leftovers are 1.0 within rounding; prob already initialized to 1
    return prob, alias


def draw_from_alias(key: jax.Array, shape, prob: jax.Array,
                    alias: jax.Array) -> jax.Array:
    """Categorical draw via alias tables: bucket = uniform int, keep it
    with its stored probability else take its alias — two gathers, no
    search."""
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, shape, 0, prob.shape[0], dtype=jnp.int32)
    u = jax.random.uniform(k2, shape, dtype=jnp.float32)
    return jnp.where(u < jnp.take(prob, i, axis=0),
                     i, jnp.take(alias, i, axis=0)).astype(jnp.int32)


def draw_negatives(key: jax.Array, shape, num_items: int,
                   neg_table) -> jax.Array:
    """Uniform or popularity-weighted negative item draw (bpr.cc:105-113).

    ``neg_table`` is None for the uniform draw, or the ``(prob, alias)``
    pair from :func:`build_alias_table` over the popularity^power
    weights (the drivers build it from their reference-format int32 CDF,
    so the sampled distribution matches the reference's inverse-CDF
    lookup to CDF quantization)."""
    if neg_table is None:
        return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)
    prob, alias = neg_table
    return draw_from_alias(key, shape, prob, alias)


# ---------------------------------------------------------- bloom filter
import numpy as _np

_MIX_C1 = _np.uint32(0x7feb352d)
_MIX_C2 = _np.uint32(0x846ca68b)
_SEED_1 = _np.uint32(0x9e3779b9)
_SEED_2 = _np.uint32(0x85ebca6b)


def _mix32(x):
    """32-bit finalizer (splitmix-style avalanche), same math in
    numpy-uint32 (build) and jnp-uint32 (query)."""
    x = x ^ (x >> 16)
    x = x * _MIX_C1
    x = x ^ (x >> 15)
    x = x * _MIX_C2
    x = x ^ (x >> 16)
    return x


def _bloom_hashes(u, i, log2_bits):
    """Blocked-bloom coordinates for pair (u, i): one WORD index plus
    two bit positions inside that word.

    The classic layout (two independent global bit indices) costs two
    word-gathers per membership probe; with ~160M probes per BPR epoch
    at the ML-20M shape the probe gathers are the verify path's
    dominant term.  Putting both bits in one uint32 word (a blocked
    bloom filter with block = 1 word) halves the gather traffic at a
    modestly higher false-positive rate, which only causes a valid
    negative to be resampled — compensated by the wider default filter
    (``bits_per_entry=12``; see ``build_bloom``).
    """
    h1 = _mix32(u ^ _mix32(i ^ _SEED_1))
    h2 = _mix32(i ^ _mix32(u ^ _SEED_2))
    word = h1 & _np.uint32((1 << (log2_bits - 5)) - 1)
    b1 = h2 & _np.uint32(31)
    b2 = (h2 >> 5) & _np.uint32(31)
    return word, b1, b2


def resolve_stored_width(d: int, opt_value: int = 0) -> int:
    """Width at which the SGD-family factor tables are STORED on device.

    The gather -> elementwise -> scatter epoch pipeline degrades badly
    below 64 lanes: on the v5e a BPR KakaoBrunch epoch measured 4.2 /
    4.0 / 5.0 s at d = 10/20/40 stored at their own width vs a flat
    1.91 s stored zero-padded at width 64 (= the d = 80 epoch's time,
    factors identical to 6e-8; ``benchmark/microbench_bpr_width.py``).
    Zero columns are inert through the whole BPR/WARP/W2V update
    family: every gradient component is a product with a padded factor
    entry, the -reg * w term is zero at w = 0, and the row-norm
    clip/projection only ever shrinks rows.

    ``opt_value``: 0 = auto (pad sub-64 d up to 64 on TPU backends,
    no pad elsewhere — on CPU the extra columns are real work);
    -1 = never pad; >= 1 = store at exactly max(d, opt_value).
    """
    v = int(opt_value)
    if v < 0:
        return d
    import jax

    on_tpu = jax.default_backend() == "tpu"
    if v > 0:
        w = max(d, v)
        if w < 64 and on_tpu:
            import logging

            logging.getLogger("buffalo_tpu").warning(
                "stored_width=%d resolves to %d lanes on a TPU backend; "
                "sub-64-lane SGD epochs measured 2.2-2.7x slower (plus a "
                "pathological d=10 compile) — use stored_width=0 (auto) "
                "to pad to 64.", v, w)
        return w
    return 64 if (d < 64 and on_tpu) else d


def pad_cols(arr: "np.ndarray", width: int) -> "np.ndarray":
    """Zero-pad a host (N, d) table to (N, width); no-op if wide enough."""
    if width <= arr.shape[1]:
        return arr
    out = _np.zeros((arr.shape[0], width), arr.dtype)
    out[:, : arr.shape[1]] = arr
    return out


def build_bloom(indptr: "np.ndarray", keys: "np.ndarray",
                bits_per_entry: int = 12):
    """Host-side blocked bloom filter over all (user, item) positives.

    Replaces the per-sample CSR binary search of negative verification
    (the reference's per-thread ``unordered_set`` seen-test,
    ``bpr.cc:103,115``) with ONE word-gather per candidate: both bits
    of a pair live in the same uint32 word (``_bloom_hashes``).  Never
    false-negative — a true positive is always flagged seen; false
    positives only cause a valid negative to be resampled.  At the
    default 12 bits/entry the blocked layout's FP rate is ~3.2%:
    the two-bit term ((2*32/12 set bits per 32-bit word)^2 / 32^2
    ~ 2.8%) plus a same-bit collision term — b1 and b2 both derive
    from h2 (bits 0-4 and 5-9) and coincide with probability 1/32,
    degrading those pairs to a single-bit test (~ +0.4%).  Still
    comparable to the old two-gather layout at 8 bits/entry while
    gathering half the words from a table 1.5x its size (~30 MB at
    20M positives — inside the chip's fast-gather range, CLAUDE.md
    hardware facts), and well inside the 5% bound the tests assert.

    Returns (words uint32[M/32], log2_bits).
    """
    import numpy as np

    nnz = len(keys)
    log2_bits = max(16, int(np.ceil(np.log2(max(1, nnz * bits_per_entry)))))
    # uint32 hashing supports up to 2^27 words (512 MB of filter); warn
    # when the capped size degrades the false-positive rate materially
    log2_bits = min(log2_bits, 32)
    if nnz * bits_per_entry > (1 << 32):
        import logging
        logging.getLogger("buffalo_tpu.sgd_kernels").warning(
            "bloom filter capped at 2^32 bits for %d positives; "
            "false-positive rate ~%.1f%% (valid negatives get resampled "
            "and the K-attempt fallback may return unverified "
            "candidates)", nnz,
            100.0 * (2.0 * 32.0 * nnz / (1 << 32) / 32.0) ** 2)
    users = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.uint32),
        np.diff(np.asarray(indptr))).astype(np.uint32)
    items = np.asarray(keys, dtype=np.uint32)
    with np.errstate(over="ignore"):
        word, b1, b2 = _bloom_hashes(users, items, log2_bits)
    words = np.zeros(1 << (log2_bits - 5), dtype=np.uint32)
    wi = word.astype(np.int64)
    np.bitwise_or.at(words, wi, np.uint32(1) << b1)
    np.bitwise_or.at(words, wi, np.uint32(1) << b2)
    return words, log2_bits


def bloom_contains(words: jax.Array, log2_bits: int, u: jax.Array,
                   i: jax.Array) -> jax.Array:
    """Vectorized membership probe: ONE gather per (u, i) pair."""
    word, b1, b2 = _bloom_hashes(u.astype(jnp.uint32),
                                 i.astype(jnp.uint32), log2_bits)
    w = words[word.astype(jnp.int32)]
    return ((w >> b1) & (w >> b2) & jnp.uint32(1)) == 1


def sample_verified_negatives(key: jax.Array, users: jax.Array,
                              num_items: int, cum_table,
                              bloom_words, bloom_log2: int, verify: bool,
                              num_attempts: int = 4) -> jax.Array:
    """K-attempt rejection sampling: first candidate not seen by the user.

    Fixed-shape analog of the reference's unbounded
    ``while !verify_neg || seen.find(neg)==end`` loop (bpr.cc:107-117):
    draw ``num_attempts`` candidates per sample and pick the first whose
    bloom probe says "not a positive of the user".  When every attempt
    is flagged seen (probability (seen_frac + fp_rate)^K — relevant
    only for head users of dense catalogs), the sample returns the
    out-of-range sentinel ``num_items``: the forward masks its
    gradient and scatters drop it, so a true positive is NEVER trained
    as a negative.
    """
    B = users.shape[0]
    cand = draw_negatives(key, (num_attempts, B), num_items, cum_table)
    if not verify:
        return cand[0]
    seen = jax.vmap(lambda c: bloom_contains(bloom_words, bloom_log2,
                                             users, c))(cand)
    ok = ~seen  # (K, B)
    first = jnp.argmax(ok, axis=0)  # first valid attempt (0 if none)
    any_ok = jnp.any(ok, axis=0)
    picked = jnp.take_along_axis(cand, first[None, :], axis=0)[0]
    return jnp.where(any_ok, picked, num_items)


def clipped_logit(x: jax.Array) -> jax.Array:
    """1 - sigmoid(x) with the reference's hard +-MAX_EXP clamps
    (bpr.cc:123-131): >6 -> 0, <-6 -> 1."""
    base = jax.nn.sigmoid(-x)
    return jnp.where(x > MAX_EXP, 0.0, jnp.where(x < -MAX_EXP, 1.0, base))


# ------------------------------------------------------------- optimizers
def clip_row_norm(delta, cap):
    """Per-row L2 cap on an aggregated update table (cap 0 = off).

    The deterministic megabatch sums per-sample gradients taken from
    one stale factor snapshot; a popularity-skewed row can collect
    thousands of same-direction terms per chunk where the hogwild
    reference's sequential re-reads would have self-damped
    (bpr.cc:157-172).  Capping the aggregated row step bounds that
    (same remedy as W2V's max_step_norm, A/B-validated there)."""
    if delta.ndim == 1:
        return jnp.clip(delta, -cap, cap)
    n = jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True))
    return delta * jnp.minimum(1.0, cap / jnp.maximum(n, 1e-12))


def adam_update(grad, m, v, step, lr, beta1, beta2):
    """One deferred-gradient adam step (algo.cc:367-380, per-epoch)."""
    m = beta1 * m + (1.0 - beta1) * grad
    v = beta2 * v + (1.0 - beta2) * grad * grad
    m_hat = m / (1.0 - beta1 ** (step + 1))
    v_hat = v / (1.0 - beta2 ** (step + 1))
    delta = lr * m_hat / (jnp.sqrt(v_hat) + FEPS)
    return delta, m, v


def adagrad_update(grad, v, lr):
    """Deferred adagrad (algo.cc:382-386)."""
    v = v + grad * grad
    delta = lr * grad / (jnp.sqrt(v) + FEPS)
    return delta, v


@partial(jax.jit, static_argnames=("optimizer", "lr", "beta1", "beta2",
                                   "reg", "per_coordinate_normalize"),
         donate_argnums=(0, 1, 2, 3))
def apply_deferred_update(param, grad, m, v, counts, step, *, optimizer,
                          lr, beta1, beta2, reg, per_coordinate_normalize):
    """Epoch-barrier optimizer application (algo.cc:388-465).

    grad has the epoch's accumulated raw gradient; the L2 term
    ``-2*reg*param`` is added here (as in the reference), then
    adam/adagrad rescales and the table moves by ``lr * grad'``.
    """
    if per_coordinate_normalize:
        c = jnp.maximum(counts, 1.0)
        grad = grad / c[:, None] if grad.ndim == 2 else grad / c
    grad = grad - 2.0 * reg * param
    if optimizer == "adam":
        delta, m, v = adam_update(grad, m, v, step, lr, beta1, beta2)
    else:
        delta, v = adagrad_update(grad, v, lr)
    param = param + delta
    return param, jnp.zeros_like(grad), m, v


# ------------------------------------------------------------- BPR steps
def _bpr_forward(P, Q, Qb, u, pos, neg, use_bias):
    """Pairwise logit; a sentinel negative (>= num_items, from the
    exhausted verify fallback) zeroes the sample's gradient."""
    p = jnp.take(P, u, axis=0)
    qi = jnp.take(Q, pos, axis=0)
    neg_ok = neg < Q.shape[0]
    safe_neg = jnp.minimum(neg, Q.shape[0] - 1)
    qj = jnp.take(Q, safe_neg, axis=0)
    x = jnp.sum(p * (qi - qj), axis=-1)
    if use_bias:
        x = x + jnp.take(Qb, pos) - jnp.take(Qb, safe_neg)
    return p, qi, qj, clipped_logit(x) * neg_ok.astype(jnp.float32)


@partial(jax.jit, static_argnames=(
    "num_items", "num_negatives", "use_bias", "update_i", "update_j",
    "verify_neg", "use_cum_table", "per_coordinate_normalize",
    "bloom_log2"),
    donate_argnums=(3, 4, 5, 6, 7))
def bpr_accumulate_step(P, Q, Qb, gradP, gradQ, gradQb, countP, countQ,
                        users, positives, bloom_words, cum_table, rng_key,
                        *, num_items, num_negatives, use_bias, update_i,
                        update_j, verify_neg, use_cum_table, bloom_log2,
                        per_coordinate_normalize):
    """Deferred-gradient megabatch (adam/adagrad path, bpr.cc:138-156)."""
    u = jnp.repeat(users, num_negatives)
    pos = jnp.repeat(positives, num_negatives)
    neg = sample_verified_negatives(
        rng_key, u, num_items, cum_table if use_cum_table else None,
        bloom_words, bloom_log2, verify_neg)
    p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg, use_bias)

    gradP = gradP.at[u].add(logit[:, None] * (qi - qj))
    item_deriv = logit[:, None] * p
    if update_i:
        gradQ = gradQ.at[pos].add(item_deriv)
        if use_bias:
            gradQb = gradQb.at[pos].add(logit)
    if update_j:
        gradQ = gradQ.at[neg].add(-item_deriv, mode="drop")
        if use_bias:
            gradQb = gradQb.at[neg].add(-logit, mode="drop")
    if per_coordinate_normalize:
        countP = countP.at[users].add(1.0)
        countQ = countQ.at[positives].add(1.0)
        countQ = countQ.at[neg].add(1.0, mode="drop")
    return gradP, gradQ, gradQb, countP, countQ


@partial(jax.jit, static_argnames=(
    "num_items", "num_negatives", "use_bias", "update_i", "update_j",
    "verify_neg", "use_cum_table", "reg_u", "reg_i", "reg_j", "reg_b",
    "bloom_log2", "max_step_norm"),
    donate_argnums=(0, 1, 2))
def bpr_sgd_step(P, Q, Qb, users, positives, bloom_words, cum_table,
                 rng_key, lr, *, num_items, num_negatives, use_bias,
                 update_i, update_j, verify_neg, use_cum_table,
                 bloom_log2, reg_u, reg_i, reg_j, reg_b,
                 max_step_norm=0.0):
    """Plain-SGD megabatch: the deterministic stand-in for hogwild
    in-place updates (bpr.cc:157-172), with per-sample L2 terms."""
    u = jnp.repeat(users, num_negatives)
    pos = jnp.repeat(positives, num_negatives)
    neg = sample_verified_negatives(
        rng_key, u, num_items, cum_table if use_cum_table else None,
        bloom_words, bloom_log2, verify_neg)
    p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg, use_bias)

    gp = logit[:, None] * (qi - qj) - reg_u * p
    item_deriv = logit[:, None] * p
    if max_step_norm:
        dP = jnp.zeros_like(P).at[u].add(lr * gp)
        P = P + clip_row_norm(dP, max_step_norm)
        dQ = jnp.zeros_like(Q)
        if update_i:
            dQ = dQ.at[pos].add(lr * (item_deriv - reg_i * qi))
            if use_bias:
                dQb = jnp.zeros_like(Qb).at[pos].add(
                    lr * (logit - reg_b * jnp.take(Qb, pos)))
                Qb = Qb + clip_row_norm(dQb, max_step_norm)
        if update_j:
            dQ = dQ.at[neg].add(lr * (-item_deriv - reg_j * qj),
                                mode="drop")
            if use_bias:
                dQb = jnp.zeros_like(Qb).at[neg].add(
                    lr * (-logit - reg_b * jnp.take(
                        Qb, jnp.minimum(neg, Qb.shape[0] - 1))),
                    mode="drop")
                Qb = Qb + clip_row_norm(dQb, max_step_norm)
        Q = Q + clip_row_norm(dQ, max_step_norm)
        return P, Q, Qb
    P = P.at[u].add(lr * gp)
    if update_i:
        Q = Q.at[pos].add(lr * (item_deriv - reg_i * qi))
        if use_bias:
            Qb = Qb.at[pos].add(lr * (logit - reg_b * jnp.take(Qb, pos)))
    if update_j:
        Q = Q.at[neg].add(lr * (-item_deriv - reg_j * qj), mode="drop")
        if use_bias:
            Qb = Qb.at[neg].add(
                lr * (-logit - reg_b * jnp.take(
                    Qb, jnp.minimum(neg, Qb.shape[0] - 1))),
                mode="drop")
    return P, Q, Qb


@partial(jax.jit, static_argnames=(
    "num_items", "num_negatives", "verify_neg", "use_cum_table",
    "bloom_log2"))
def bpr_sample_negatives_epoch(users, bloom_words, cum_table, rng_key, *,
                               num_items, num_negatives, verify_neg,
                               use_cum_table, bloom_log2):
    """Dispatch 1 of the split epoch: every chunk's verified negatives.

    Key derivation matches ``bpr_epoch``'s fused path exactly
    (``fold_in(rng_key, chunk_index)``), so feeding the result back via
    ``bpr_epoch(..., negatives=..., precomputed_neg=True)`` reproduces
    the fused epoch bit-for-bit.  The point of the split: this program
    is pure gather/probe (bloom verification, no scatter-add), and the
    consumer program is pure update (scatter-add, no verification) —
    the two never coexist in one XLA program.
    """
    nchunks, _ = users.shape
    ct = cum_table if use_cum_table else None

    def body(carry, xs):
        u_chunk, cidx = xs
        key = jax.random.fold_in(rng_key, cidx)
        u = jnp.repeat(u_chunk, num_negatives)
        neg = sample_verified_negatives(key, u, num_items, ct,
                                       bloom_words, bloom_log2,
                                       verify_neg)
        return carry, neg

    _, negs = jax.lax.scan(body, None,
                           (users, jnp.arange(nchunks)))
    return negs  # (nchunks, N * num_negatives) int32


@partial(jax.jit, static_argnames=(
    "optimizer", "num_items", "num_negatives", "use_bias", "update_i",
    "update_j", "verify_neg", "use_cum_table", "per_coordinate_normalize",
    "lr", "min_lr", "beta1", "beta2", "reg_u", "reg_i", "reg_j", "reg_b",
    "num_valid", "total_samples", "bloom_log2", "random_positive",
    "precomputed_neg", "max_step_norm"),
    donate_argnums=(0, 1, 2, 3))
def bpr_epoch(P, Q, Qb, opt_state, users, positives, bloom_words,
              cum_table, rng_key, step, pos_indptr=None, pos_keys=None,
              negatives=None, *, optimizer, num_items,
              num_negatives, use_bias, update_i, update_j, verify_neg,
              use_cum_table, bloom_log2, per_coordinate_normalize, lr,
              min_lr, beta1, beta2, reg_u, reg_i, reg_j, reg_b, num_valid,
              total_samples, random_positive=False,
              precomputed_neg=False, max_step_norm=0.0):
    """One full BPR epoch in ONE dispatch: lax.scan over resident chunks.

    ``users``/``positives`` are the epoch's positives pre-reshaped to
    (nchunks, N) on device (CSR order — the reference's job queue also
    walks rows in order, ``algo.cc:308-362``); entries beyond
    ``num_valid`` are padding and masked out.  For sgd the learning
    rate decays linearly with global progress inside the scan
    (``algo.cc:283-287``); for adam/adagrad gradients accumulate across
    the whole scan and one deferred optimizer step applies at the
    epoch barrier (``algo.cc:382-465``).
    """
    nchunks, N = users.shape
    deferred = optimizer != "sgd"
    ct = cum_table if use_cum_table else None

    def chunk_forward(P, Q, Qb, u_chunk, pos_chunk, neg_chunk, cidx, key):
        base = cidx * N
        valid = (base + jnp.arange(N, dtype=jnp.int32)) < num_valid
        if random_positive:
            # draw each slot's positive uniformly from the user's list
            # instead of walking CSR order (bpr.cu:53; the reference
            # implements this on its accelerator path only)
            lo = jnp.take(pos_indptr, u_chunk).astype(jnp.int32)
            deg = jnp.take(pos_indptr, u_chunk + 1).astype(jnp.int32) - lo
            r = jax.random.randint(jax.random.fold_in(key, 0x9e3779b1),
                                   u_chunk.shape, 0, 1 << 30,
                                   dtype=jnp.int32)
            pos_chunk = jnp.take(
                pos_keys, lo + r % jnp.maximum(deg, 1)).astype(
                    pos_chunk.dtype)
        u = jnp.repeat(u_chunk, num_negatives)
        pos = jnp.repeat(pos_chunk, num_negatives)
        mask = jnp.repeat(valid, num_negatives).astype(jnp.float32)
        if neg_chunk is None:
            neg = sample_verified_negatives(key, u, num_items, ct,
                                            bloom_words, bloom_log2,
                                            verify_neg)
        else:
            neg = neg_chunk
        p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg, use_bias)
        return u, pos, neg, mask, p, qi, qj, logit * mask

    if precomputed_neg:
        xs_all = (users, positives, negatives, jnp.arange(nchunks))
    else:
        xs_all = (users, positives, jnp.arange(nchunks))

    def unpack(xs):
        if precomputed_neg:
            u_chunk, pos_chunk, neg_chunk, cidx = xs
        else:
            (u_chunk, pos_chunk, cidx), neg_chunk = xs, None
        return u_chunk, pos_chunk, neg_chunk, cidx

    if deferred:
        def body(carry, xs):
            gP, gQ, gQb, cP, cQ = carry
            u_chunk, pos_chunk, neg_chunk, cidx = unpack(xs)
            key = jax.random.fold_in(rng_key, cidx)
            u, pos, neg, mask, p, qi, qj, logit = chunk_forward(
                P, Q, Qb, u_chunk, pos_chunk, neg_chunk, cidx, key)
            gP = gP.at[u].add(logit[:, None] * (qi - qj))
            item_deriv = logit[:, None] * p
            if update_i:
                gQ = gQ.at[pos].add(item_deriv)
                if use_bias:
                    gQb = gQb.at[pos].add(logit)
            if update_j:
                gQ = gQ.at[neg].add(-item_deriv, mode="drop")
                if use_bias:
                    gQb = gQb.at[neg].add(-logit, mode="drop")
            if per_coordinate_normalize:
                # reference counting (bpr.cc:175-182): P and the
                # positive item once per PAIR, the negative once per
                # (pair x negative) — u/pos here are repeated per
                # negative, so count the unrepeated slots
                valid1 = mask.reshape(-1, num_negatives)[:, 0]
                u1 = u.reshape(-1, num_negatives)[:, 0]
                p1 = pos.reshape(-1, num_negatives)[:, 0]
                cP = cP.at[u1].add(valid1)
                cQ = cQ.at[p1].add(valid1)
                cQ = cQ.at[neg].add(mask, mode="drop")
            return (gP, gQ, gQb, cP, cQ), None

        init = (jnp.zeros_like(P), jnp.zeros_like(Q), jnp.zeros_like(Qb),
                jnp.zeros(P.shape[0], jnp.float32),
                jnp.zeros(Q.shape[0], jnp.float32))
        (gP, gQ, gQb, cP, cQ), _ = jax.lax.scan(body, init, xs_all)

        def apply(param, grad, m, v, counts, reg):
            if per_coordinate_normalize:
                c = jnp.maximum(counts, 1.0)
                grad = grad / (c[:, None] if grad.ndim == 2 else c)
            grad = grad - 2.0 * reg * param
            if optimizer == "adam":
                delta, m, v = adam_update(grad, m, v, step, lr, beta1,
                                          beta2)
            else:
                delta, v = adagrad_update(grad, v, lr)
            return param + delta, m, v

        P, opt_state["mP"], opt_state["vP"] = apply(
            P, gP, opt_state["mP"], opt_state["vP"], cP, reg_u)
        Q, opt_state["mQ"], opt_state["vQ"] = apply(
            Q, gQ, opt_state["mQ"], opt_state["vQ"], cQ, reg_i)
        if use_bias:
            Qb, opt_state["mQb"], opt_state["vQb"] = apply(
                Qb, gQb, opt_state["mQb"], opt_state["vQb"], cQ, reg_b)
        return P, Q, Qb, opt_state

    def body(carry, xs):
        P, Q, Qb = carry
        u_chunk, pos_chunk, neg_chunk, cidx = unpack(xs)
        key = jax.random.fold_in(rng_key, cidx)
        u, pos, neg, mask, p, qi, qj, logit = chunk_forward(
            P, Q, Qb, u_chunk, pos_chunk, neg_chunk, cidx, key)
        progress = (step.astype(jnp.float32) * num_valid
                    + cidx.astype(jnp.float32) * N) / total_samples
        lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)
        m = mask[:, None]
        item_deriv = logit[:, None] * p
        if max_step_norm:
            # aggregated per-chunk deltas with a per-row step cap (see
            # clip_row_norm; groupings match bpr_epoch_dp so fused and
            # dp stay fp-equivalent: one combined dQ, Qb pos applied
            # before the negative side reads Qb for its reg term)
            dP = jnp.zeros_like(P).at[u].add(
                lr_t * m * (logit[:, None] * (qi - qj) - reg_u * p))
            P = P + clip_row_norm(dP, max_step_norm)
            dQ = jnp.zeros_like(Q)
            if update_i:
                dQ = dQ.at[pos].add(lr_t * m * (item_deriv - reg_i * qi))
                if use_bias:
                    dQb = jnp.zeros_like(Qb).at[pos].add(
                        lr_t * mask * (logit - reg_b * jnp.take(Qb, pos)))
                    Qb = Qb + clip_row_norm(dQb, max_step_norm)
            if update_j:
                dQ = dQ.at[neg].add(
                    lr_t * m * (-item_deriv - reg_j * qj), mode="drop")
                if use_bias:
                    dQb = jnp.zeros_like(Qb).at[neg].add(
                        lr_t * mask * (-logit - reg_b * jnp.take(
                            Qb, jnp.minimum(neg, Qb.shape[0] - 1))),
                        mode="drop")
                    Qb = Qb + clip_row_norm(dQb, max_step_norm)
            Q = Q + clip_row_norm(dQ, max_step_norm)
            return (P, Q, Qb), None
        P = P.at[u].add(lr_t * m * (logit[:, None] * (qi - qj) - reg_u * p))
        if update_i:
            Q = Q.at[pos].add(lr_t * m * (item_deriv - reg_i * qi))
            if use_bias:
                Qb = Qb.at[pos].add(
                    lr_t * mask * (logit - reg_b * jnp.take(Qb, pos)))
        if update_j:
            Q = Q.at[neg].add(lr_t * m * (-item_deriv - reg_j * qj),
                              mode="drop")
            if use_bias:
                Qb = Qb.at[neg].add(
                    lr_t * mask * (-logit - reg_b * jnp.take(
                        Qb, jnp.minimum(neg, Qb.shape[0] - 1))),
                    mode="drop")
        return (P, Q, Qb), None

    (P, Q, Qb), _ = jax.lax.scan(body, (P, Q, Qb), xs_all)
    return P, Q, Qb, opt_state


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "optimizer", "num_items", "num_negatives",
    "use_bias", "update_i", "update_j", "verify_neg", "use_cum_table",
    "per_coordinate_normalize", "lr", "min_lr", "beta1", "beta2",
    "reg_u", "reg_i", "reg_j", "reg_b", "num_valid", "total_samples",
    "bloom_log2", "random_positive", "max_step_norm"),
    donate_argnums=(0, 1, 2, 3))
def bpr_epoch_dp(P, Q, Qb, opt_state, users, positives, bloom_words,
                 cum_table, rng_key, step, pos_indptr, pos_keys, *,
                 mesh, axis_name="d", optimizer, num_items, num_negatives,
                 use_bias, update_i, update_j, verify_neg, use_cum_table,
                 bloom_log2, per_coordinate_normalize, lr, min_lr, beta1,
                 beta2, reg_u, reg_i, reg_j, reg_b, num_valid,
                 total_samples, random_positive=False, max_step_norm=0.0):
    """One BPR epoch over a device mesh (dp): the TPU-native analog of
    the reference's hogwild thread pool (``algo.cc:211-219``) at
    multi-chip scale.

    Chunks are sharded on the batch axis (``users``/``positives`` are
    (nchunks, N) with N divisible by ``mesh.size``); factor tables are
    replicated.  Sampling stays BIT-IDENTICAL to the single-device
    fused epoch: every device draws the full global candidate tensor
    from the same ``fold_in(rng_key, chunk)`` key (counter-based PRNG —
    the draw is cheap VPU work) and slices its local window, so only
    the bloom probes, gathers, and gradient math shard.  Updates are
    dense per-table deltas psum-reduced over ICI — for sgd once per
    chunk (the carry must stay replicated), for adam/adagrad once per
    epoch at the deferred barrier (``algo.cc:382-465``).  Factors match
    the fused epoch up to scatter-reduction fp ordering.
    """
    from jax.sharding import PartitionSpec as PS

    nchunks, N = users.shape
    D = mesh.size
    assert N % D == 0, (N, D)
    N_loc = N // D
    B_loc = N_loc * num_negatives
    B_glob = N * num_negatives
    deferred = optimizer != "sgd"

    def body_fn(P, Q, Qb, opt_state, users_s, positives_s, bloom_w,
                cum_t, pos_ip, pos_k):
        idx = jax.lax.axis_index(axis_name)
        ct = cum_t if use_cum_table else None

        def local_negatives(key, u_loc, lo):
            # global-consistent draw: full candidate tensor from the
            # chunk key (identical bits on every device), local slice
            # for the bloom probes
            cand_g = draw_negatives(key, (4, B_glob), num_items, ct)
            cand = jax.lax.dynamic_slice_in_dim(cand_g, lo, B_loc, axis=1)
            if not verify_neg:
                return cand[0]
            seen = jax.vmap(lambda c: bloom_contains(
                bloom_w, bloom_log2, u_loc, c))(cand)
            ok = ~seen
            first = jnp.argmax(ok, axis=0)
            any_ok = jnp.any(ok, axis=0)
            picked = jnp.take_along_axis(cand, first[None, :], axis=0)[0]
            return jnp.where(any_ok, picked, num_items)

        def fwd(P, Q, Qb, u_chunk, pos_chunk, cidx):
            key = jax.random.fold_in(rng_key, cidx)
            gpos = (cidx * N + idx * N_loc
                    + jnp.arange(N_loc, dtype=jnp.int32))
            valid = gpos < num_valid
            if random_positive:
                r_g = jax.random.randint(
                    jax.random.fold_in(key, 0x9e3779b1), (N,), 0,
                    1 << 30, dtype=jnp.int32)
                r = jax.lax.dynamic_slice_in_dim(r_g, idx * N_loc, N_loc)
                lo_ = jnp.take(pos_ip, u_chunk).astype(jnp.int32)
                deg = jnp.take(pos_ip, u_chunk + 1).astype(jnp.int32) - lo_
                pos_chunk = jnp.take(
                    pos_k, lo_ + r % jnp.maximum(deg, 1)).astype(
                        pos_chunk.dtype)
            u = jnp.repeat(u_chunk, num_negatives)
            pos = jnp.repeat(pos_chunk, num_negatives)
            mask = jnp.repeat(valid, num_negatives).astype(jnp.float32)
            neg = local_negatives(key, u, idx * B_loc)
            p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg,
                                            use_bias)
            return u, pos, neg, mask, p, qi, qj, logit * mask

        if deferred:
            def body(carry, xs):
                gP, gQ, gQb, cP, cQ = carry
                u_chunk, pos_chunk, cidx = xs
                u, pos, neg, mask, p, qi, qj, logit = fwd(
                    P, Q, Qb, u_chunk, pos_chunk, cidx)
                gP = gP.at[u].add(logit[:, None] * (qi - qj))
                item_deriv = logit[:, None] * p
                if update_i:
                    gQ = gQ.at[pos].add(item_deriv)
                    if use_bias:
                        gQb = gQb.at[pos].add(logit)
                if update_j:
                    gQ = gQ.at[neg].add(-item_deriv, mode="drop")
                    if use_bias:
                        gQb = gQb.at[neg].add(-logit, mode="drop")
                if per_coordinate_normalize:
                    valid1 = mask.reshape(-1, num_negatives)[:, 0]
                    u1 = u.reshape(-1, num_negatives)[:, 0]
                    p1 = pos.reshape(-1, num_negatives)[:, 0]
                    cP = cP.at[u1].add(valid1)
                    cQ = cQ.at[p1].add(valid1)
                    cQ = cQ.at[neg].add(mask, mode="drop")
                return (gP, gQ, gQb, cP, cQ), None

            init = (jnp.zeros_like(P), jnp.zeros_like(Q),
                    jnp.zeros_like(Qb),
                    jnp.zeros(P.shape[0], jnp.float32),
                    jnp.zeros(Q.shape[0], jnp.float32))
            (gP, gQ, gQb, cP, cQ), _ = jax.lax.scan(
                body, init,
                (users_s, positives_s, jnp.arange(nchunks)))
            gP = jax.lax.psum(gP, axis_name)
            gQ = jax.lax.psum(gQ, axis_name)
            gQb = jax.lax.psum(gQb, axis_name)
            cP = jax.lax.psum(cP, axis_name)
            cQ = jax.lax.psum(cQ, axis_name)

            def apply(param, grad, m, v, counts, reg):
                if per_coordinate_normalize:
                    c = jnp.maximum(counts, 1.0)
                    grad = grad / (c[:, None] if grad.ndim == 2 else c)
                grad = grad - 2.0 * reg * param
                if optimizer == "adam":
                    delta, m, v = adam_update(grad, m, v, step, lr,
                                              beta1, beta2)
                else:
                    delta, v = adagrad_update(grad, v, lr)
                return param + delta, m, v

            Po, mP, vP = apply(P, gP, opt_state["mP"], opt_state["vP"],
                               cP, reg_u)
            Qo, mQ, vQ = apply(Q, gQ, opt_state["mQ"], opt_state["vQ"],
                               cQ, reg_i)
            new_state = dict(opt_state, mP=mP, vP=vP, mQ=mQ, vQ=vQ)
            Qbo = Qb
            if use_bias:
                Qbo, mQb, vQb = apply(Qb, gQb, opt_state["mQb"],
                                      opt_state["vQb"], cQ, reg_b)
                new_state["mQb"] = mQb
                new_state["vQb"] = vQb
            return Po, Qo, Qbo, new_state

        def body(carry, xs):
            P, Q, Qb = carry
            u_chunk, pos_chunk, cidx = xs
            u, pos, neg, mask, p, qi, qj, logit = fwd(
                P, Q, Qb, u_chunk, pos_chunk, cidx)
            progress = (step.astype(jnp.float32) * num_valid
                        + cidx.astype(jnp.float32) * N) / total_samples
            lr_t = jnp.maximum(lr - (lr - min_lr) * progress, min_lr)
            m = mask[:, None]
            def capped(d):
                return clip_row_norm(d, max_step_norm) if max_step_norm \
                    else d

            dP = jnp.zeros_like(P).at[u].add(
                lr_t * m * (logit[:, None] * (qi - qj) - reg_u * p))
            item_deriv = logit[:, None] * p
            dQ = jnp.zeros_like(Q)
            if update_i:
                dQ = dQ.at[pos].add(lr_t * m * (item_deriv - reg_i * qi))
                if use_bias:
                    # the fused epoch applies the positive-side bias
                    # update before the negative side READS Qb for its
                    # reg term — keep that sequencing (one extra tiny
                    # psum of the bias vector)
                    dQb = jnp.zeros_like(Qb).at[pos].add(
                        lr_t * mask * (logit - reg_b * jnp.take(Qb, pos)))
                    Qb = Qb + capped(jax.lax.psum(dQb, axis_name))
            if update_j:
                dQ = dQ.at[neg].add(
                    lr_t * m * (-item_deriv - reg_j * qj), mode="drop")
                if use_bias:
                    dQb = jnp.zeros_like(Qb).at[neg].add(
                        lr_t * mask * (-logit - reg_b * jnp.take(
                            Qb, jnp.minimum(neg, Qb.shape[0] - 1))),
                        mode="drop")
                    Qb = Qb + capped(jax.lax.psum(dQb, axis_name))
            P = P + capped(jax.lax.psum(dP, axis_name))
            Q = Q + capped(jax.lax.psum(dQ, axis_name))
            return (P, Q, Qb), None

        (Po, Qo, Qbo), _ = jax.lax.scan(
            body, (P, Q, Qb), (users_s, positives_s, jnp.arange(nchunks)))
        return Po, Qo, Qbo, opt_state

    state_spec = jax.tree.map(lambda _: PS(), opt_state)
    run = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(PS(), PS(), PS(), state_spec, PS(None, axis_name),
                  PS(None, axis_name), PS(), PS(), PS(), PS()),
        out_specs=(PS(), PS(), PS(), state_spec), check_vma=False)
    return run(P, Q, Qb, opt_state, users, positives, bloom_words,
               cum_table, pos_indptr, pos_keys)


@partial(jax.jit, static_argnames=("use_bias",))
def bpr_loss(P, Q, Qb, users, positives, negatives, *, use_bias):
    """Mean log(1 + exp(-x_uij)) over fixed triplets (bpr.cc:227-244)."""
    p = jnp.take(P, users, axis=0)
    x = jnp.sum(p * (jnp.take(Q, positives, axis=0)
                     - jnp.take(Q, negatives, axis=0)), axis=-1)
    if use_bias:
        x = x + jnp.take(Qb, positives) - jnp.take(Qb, negatives)
    return jnp.mean(jnp.logaddexp(0.0, -x))
