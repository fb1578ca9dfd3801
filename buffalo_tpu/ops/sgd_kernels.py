"""Vectorized negative-sampling SGD: the TPU replacement for hogwild.

The reference trains BPR/WARP with a std::thread producer-consumer pool
doing lock-free in-place updates (``lib/algo.cc:133-493``,
``lib/algo_impl/bpr/bpr.cc:72-188``).  On TPU that hazard class
disappears: a megabatch of (user, positive) pairs is drawn, negatives
are sampled vectorized (uniform or popularity^power via cumulative
table, ``bpr.cc:105-117``), rejection of seen items becomes a fixed-K
oversample + first-valid select backed by a batched binary search over
the CSR row (``verify_neg``), and gradients land via deterministic
scatter-adds.  The deferred-gradient adam/adagrad barrier
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
def draw_negatives(key: jax.Array, shape, num_items: int,
                   cum_table: jax.Array | None) -> jax.Array:
    """Uniform or popularity-weighted negative item draw (bpr.cc:105-113)."""
    if cum_table is None:
        return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)
    r = jax.random.uniform(key, shape) * cum_table[-1]
    return jnp.searchsorted(cum_table, r, side="right").astype(jnp.int32)


def row_contains(items: jax.Array, rows: jax.Array, indptr: jax.Array,
                 keys: jax.Array, n_steps: int = 25) -> jax.Array:
    """Batched membership test: is items[b] among keys[indptr[r]:indptr[r+1])?

    The CSR row is column-sorted (database build sorts by (row, col)),
    so a fixed-depth binary search per sample replaces the reference's
    per-thread ``unordered_set`` lookup (bpr.cc:103,115).
    """
    lo = indptr[rows].astype(jnp.int32)
    hi0 = indptr[rows + 1].astype(jnp.int32)

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) // 2
        km = keys[jnp.minimum(mid, keys.shape[0] - 1)]
        go_right = km < items
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, n_steps, body, (lo, hi0))
    at = keys[jnp.minimum(lo, keys.shape[0] - 1)]
    return (lo < hi0) & (at == items)


def sample_verified_negatives(key: jax.Array, users: jax.Array,
                              num_items: int, cum_table,
                              indptr, keys, verify: bool,
                              num_attempts: int = 4) -> jax.Array:
    """K-attempt rejection sampling: first candidate not seen by the user.

    Fixed-shape analog of the reference's unbounded
    ``while !verify_neg || seen.find(neg)==end`` loop (bpr.cc:107-117):
    draw ``num_attempts`` candidates per sample and pick the first that
    is not a positive of the user (falling back to the last candidate —
    at ML sparsity the miss probability is (nnz/users/items)^K ~ 0).
    """
    B = users.shape[0]
    cand = draw_negatives(key, (num_attempts, B), num_items, cum_table)
    if not verify:
        return cand[0]
    seen = jax.vmap(lambda c: row_contains(c, users, indptr, keys))(cand)
    ok = ~seen  # (K, B)
    first = jnp.argmax(ok, axis=0)  # first valid attempt (0 if none)
    any_ok = jnp.any(ok, axis=0)
    idx = jnp.where(any_ok, first, num_attempts - 1)
    return jnp.take_along_axis(cand, idx[None, :], axis=0)[0]


def clipped_logit(x: jax.Array) -> jax.Array:
    """1 - sigmoid(x) with the reference's hard +-MAX_EXP clamps
    (bpr.cc:123-131): >6 -> 0, <-6 -> 1."""
    base = jax.nn.sigmoid(-x)
    return jnp.where(x > MAX_EXP, 0.0, jnp.where(x < -MAX_EXP, 1.0, base))


# ------------------------------------------------------------- optimizers
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
    p = jnp.take(P, u, axis=0)
    qi = jnp.take(Q, pos, axis=0)
    qj = jnp.take(Q, neg, axis=0)
    x = jnp.sum(p * (qi - qj), axis=-1)
    if use_bias:
        x = x + jnp.take(Qb, pos) - jnp.take(Qb, neg)
    return p, qi, qj, clipped_logit(x)


@partial(jax.jit, static_argnames=(
    "num_items", "num_negatives", "use_bias", "update_i", "update_j",
    "verify_neg", "use_cum_table", "per_coordinate_normalize"),
    donate_argnums=(3, 4, 5, 6, 7))
def bpr_accumulate_step(P, Q, Qb, gradP, gradQ, gradQb, countP, countQ,
                        users, positives, indptr, keys, cum_table, rng_key,
                        *, num_items, num_negatives, use_bias, update_i,
                        update_j, verify_neg, use_cum_table,
                        per_coordinate_normalize):
    """Deferred-gradient megabatch (adam/adagrad path, bpr.cc:138-156)."""
    u = jnp.repeat(users, num_negatives)
    pos = jnp.repeat(positives, num_negatives)
    neg = sample_verified_negatives(
        rng_key, u, num_items, cum_table if use_cum_table else None,
        indptr, keys, verify_neg)
    p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg, use_bias)

    gradP = gradP.at[u].add(logit[:, None] * (qi - qj))
    item_deriv = logit[:, None] * p
    if update_i:
        gradQ = gradQ.at[pos].add(item_deriv)
        if use_bias:
            gradQb = gradQb.at[pos].add(logit)
    if update_j:
        gradQ = gradQ.at[neg].add(-item_deriv)
        if use_bias:
            gradQb = gradQb.at[neg].add(-logit)
    if per_coordinate_normalize:
        countP = countP.at[users].add(1.0)
        countQ = countQ.at[positives].add(1.0)
        countQ = countQ.at[neg].add(1.0)
    return gradP, gradQ, gradQb, countP, countQ


@partial(jax.jit, static_argnames=(
    "num_items", "num_negatives", "use_bias", "update_i", "update_j",
    "verify_neg", "use_cum_table", "reg_u", "reg_i", "reg_j", "reg_b"),
    donate_argnums=(0, 1, 2))
def bpr_sgd_step(P, Q, Qb, users, positives, indptr, keys, cum_table,
                 rng_key, lr, *, num_items, num_negatives, use_bias,
                 update_i, update_j, verify_neg, use_cum_table,
                 reg_u, reg_i, reg_j, reg_b):
    """Plain-SGD megabatch: the deterministic stand-in for hogwild
    in-place updates (bpr.cc:157-172), with per-sample L2 terms."""
    u = jnp.repeat(users, num_negatives)
    pos = jnp.repeat(positives, num_negatives)
    neg = sample_verified_negatives(
        rng_key, u, num_items, cum_table if use_cum_table else None,
        indptr, keys, verify_neg)
    p, qi, qj, logit = _bpr_forward(P, Q, Qb, u, pos, neg, use_bias)

    gp = logit[:, None] * (qi - qj) - reg_u * p
    P = P.at[u].add(lr * gp)
    item_deriv = logit[:, None] * p
    if update_i:
        Q = Q.at[pos].add(lr * (item_deriv - reg_i * qi))
        if use_bias:
            Qb = Qb.at[pos].add(lr * (logit - reg_b * jnp.take(Qb, pos)))
    if update_j:
        Q = Q.at[neg].add(lr * (-item_deriv - reg_j * qj))
        if use_bias:
            Qb = Qb.at[neg].add(lr * (-logit - reg_b * jnp.take(Qb, neg)))
    return P, Q, Qb


@partial(jax.jit, static_argnames=("use_bias",))
def bpr_loss(P, Q, Qb, users, positives, negatives, *, use_bias):
    """Mean log(1 + exp(-x_uij)) over fixed triplets (bpr.cc:227-244)."""
    p = jnp.take(P, users, axis=0)
    x = jnp.sum(p * (jnp.take(Q, positives, axis=0)
                     - jnp.take(Q, negatives, axis=0)), axis=-1)
    if use_bias:
        x = x + jnp.take(Qb, positives) - jnp.take(Qb, negatives)
    return jnp.mean(jnp.logaddexp(0.0, -x))
