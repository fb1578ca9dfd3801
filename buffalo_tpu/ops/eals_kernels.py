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
