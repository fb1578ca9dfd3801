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
