"""Batched scoring + top-k retrieval ops.

TPU-native counterpart of the reference's OpenMP ``quickselect`` and
``dot_topn`` kernels (``buffalo/parallel/_core.hpp:69-142``): scores
are one MXU matmul, selection is ``jax.lax.top_k``.  Sharded variant:
each table shard computes a local top-k and the (k * n_shards)
candidates are merged — the cross-shard merge is O(k), not O(items).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "with_scores"))
def _topk_from_scores(scores: jax.Array, k: int, with_scores: bool = True):
    vals, idx = jax.lax.top_k(scores, k)
    return (vals, idx) if with_scores else idx


@partial(jax.jit, static_argnames=("k",))
def matmul_topk(p: jax.Array, Q: jax.Array, k: int,
                pb=None, Qb=None):
    """scores = p @ Q^T (+ biases) then top-k.  p: (B, d), Q: (N, d)."""
    scores = jnp.dot(p, Q.T, preferred_element_type=jnp.float32)
    if pb is not None:
        scores = scores + pb[:, None]
    if Qb is not None:
        scores = scores + Qb[None, :]
    return jax.lax.top_k(scores, k)


def batch_topn(p, Q, topk: int, pool=None, Qb=None, chunk: int = 2048):
    """Bulk MIPS retrieval: top-k of ``p @ Q^T (+ Qb)`` per query row.

    The device analog of ``parallel::dot_topn`` (``_core.hpp:88-142``):
    queries are processed in fixed chunks (one matmul + top_k each);
    a ``pool`` restricts the candidate set (indices are mapped back);
    results are ``-1``-padded when the pool is smaller than ``topk``,
    matching the reference's padding semantics.

    Returns (keys int32[B, topk], scores float32[B, topk]).
    """
    p = np.ascontiguousarray(np.asarray(p, dtype=np.float32))
    Q = np.asarray(Q, dtype=np.float32)
    if pool is not None and len(pool):
        Q = Q[pool]
        if Qb is not None:
            Qb = np.asarray(Qb)[pool]
    n_items = Q.shape[0]
    k_eff = min(topk, n_items)
    B = p.shape[0]
    out_keys = np.full((B, topk), -1, dtype=np.int32)
    out_scores = np.zeros((B, topk), dtype=np.float32)
    import jax

    # stage the candidate table once; every chunk (including small
    # query sets) is padded to the fixed `chunk` rows so all calls hit
    # one compiled executable per (chunk, d, N, k) signature
    Q_d = jax.device_put(Q)
    Qb_d = None if Qb is None else jax.device_put(np.asarray(Qb))
    for beg in range(0, B, chunk):
        pc = p[beg:beg + chunk]
        n = pc.shape[0]
        if n < chunk:
            pc = np.vstack([pc, np.zeros((chunk - n, p.shape[1]),
                                         np.float32)])
        vals, idx = matmul_topk(pc, Q_d, k_eff, Qb=Qb_d)
        out_keys[beg:beg + n, :k_eff] = np.asarray(idx)[:n]
        out_scores[beg:beg + n, :k_eff] = np.asarray(vals)[:n]
    if pool is not None and len(pool):
        mapped = np.asarray(pool)[np.maximum(out_keys, 0)]
        out_keys = np.where(out_keys >= 0, mapped, -1).astype(np.int32)
    return out_keys, out_scores


def topk(scores, k: int, sorted: bool = True, num_threads: int = 0
         ) -> np.ndarray:
    """Row-parallel top-k over a host score matrix (quickselect analog).

    Keeps the reference's ``Evaluable.get_topk`` contract
    (``evaluate/base.py:31-42``); ``num_threads`` is accepted for API
    parity and ignored (parallelism comes from the device).
    """
    scores = jnp.asarray(scores)
    squeeze = scores.ndim == 1
    if squeeze:
        scores = scores[None, :]
    k = min(k, scores.shape[1])
    assert k > 0, f"k({k}) should be greater than 0"
    _, idx = _topk_from_scores(scores, k)
    idx = np.asarray(idx, dtype=np.int32)
    return idx[0] if squeeze else idx
