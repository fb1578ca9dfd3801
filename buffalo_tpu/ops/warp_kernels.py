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

from buffalo_tpu.ops.sgd_kernels import row_contains


def _scores(p, q, score_func: str):
    """p: (..., d), q: (..., d) -> (...)."""
    if score_func == "l2":
        diff = p - q
        return -jnp.sum(diff * diff, axis=-1)
    return jnp.sum(p * q, axis=-1)


@partial(jax.jit, static_argnames=(
    "num_items", "num_candidates", "score_func", "threshold",
    "reg_u", "reg_i", "reg_j", "update_i", "update_j",
    "per_coordinate_normalize"),
    donate_argnums=(2, 3, 4, 5))
def warp_accumulate_step(P, Q, gradP, gradQ, countP, countQ,
                         users, positives, indptr, keys, rng_key,
                         *, num_items, num_candidates, score_func,
                         threshold, reg_u, reg_i, reg_j, update_i,
                         update_j, per_coordinate_normalize):
    """One WARP megabatch: adaptive negative search + weighted grads."""
    B = users.shape[0]
    p = jnp.take(P, users, axis=0)              # (B, d)
    qi = jnp.take(Q, positives, axis=0)
    ui = _scores(p, qi, score_func)             # (B,)

    cand = jax.random.randint(rng_key, (B, num_candidates), 0, num_items,
                              dtype=jnp.int32)
    seen = jax.vmap(row_contains, in_axes=(1, None, None, None),
                    out_axes=1)(cand, users, indptr, keys)   # (B, K)
    qc = jnp.take(Q, cand, axis=0)              # (B, K, d)
    uj = _scores(p[:, None, :], qc, score_func)  # (B, K)

    violating = (~seen) & ((ui[:, None] - uj) < threshold)
    any_v = jnp.any(violating, axis=1)
    f = jnp.argmax(violating, axis=1)           # first violator index

    # reference trial counter: 2 per non-violating non-seen try,
    # 1 for the violator, starting from 1 => trial = 2 * v where v is
    # the violator's 1-based rank among non-seen candidates
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
