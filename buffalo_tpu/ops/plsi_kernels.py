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


@partial(jax.jit, static_argnames=("alpha1", "alpha2"))
def plsi_normalize_swap(Pn, Qn, *, alpha1, alpha2):
    """M-step smoothing + normalization (plsi.cc:108-125)."""
    d = Pn.shape[1]
    num_items = Qn.shape[0]
    Pn = Pn + alpha1 / d
    Pn = Pn / jnp.sum(Pn, axis=1, keepdims=True)
    Qn = Qn + alpha2 / num_items
    Qn = Qn / jnp.sum(Qn, axis=0, keepdims=True)
    return Pn, Qn
