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


def _select_topk(scores: jax.Array, k: int, approx: bool = False):
    """Row-wise top-k of a score matrix.

    Exact selection is a single ``lax.top_k`` on EVERY backend.  A
    hand-written two-stage rewrite (per-segment top-k + survivor merge)
    was tried for wide catalogs and measured SLOWER on both backends —
    2.6x on CPU and 16.6x on a v5e chip (42.9 ms vs 713.9 ms for
    2048 x 505840, ``benchmark/microbench_topk.py``; its compile also
    wedged the remote TPU compiler for >45 min) — so it was removed.

    ``approx=True`` selects ``lax.approx_max_k`` (TPU-optimized partial
    reduction, 2.1x faster than exact at the same shape) at measured
    recall@10 0.98 vs exact; callers must surface that accuracy cost.
    """
    if approx:
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "with_scores"))
def _topk_from_scores(scores: jax.Array, k: int, with_scores: bool = True):
    vals, idx = _select_topk(scores, k)
    return (vals, idx) if with_scores else idx


@partial(jax.jit, static_argnames=("k",))
def matmul_topk(p: jax.Array, Q: jax.Array, k: int,
                pb=None, Qb=None):
    """scores = p @ Q^T (+ biases) then top-k.  p: (B, d), Q: (N, d).

    ``k`` is clamped to the candidate count (the reference's
    ``get_topk`` clamps too, ``evaluate/base.py:38``): a validation
    request of ``topk + max_seen`` can exceed a small catalog."""
    scores = jnp.dot(p, Q.T, preferred_element_type=jnp.float32)
    if pb is not None:
        scores = scores + pb[:, None]
    if Qb is not None:
        scores = scores + Qb[None, :]
    return _select_topk(scores, min(k, Q.shape[0]))


_stage_cache: "OrderedDict" = None  # lazy OrderedDict[key -> (host, dev)]


def _fingerprint(arr: np.ndarray) -> bytes:
    """Exact positional checksum reading every element once: the raw
    buffer split into 64 contiguous int64-word ranges, each
    wrap-around-summed (tail bytes into the last chunk).  Integer sums
    are exact, so ANY in-place bit change lands in some chunk and
    changes its sum; only an exact same-chunk cancellation (two
    compensating edits) escapes.

    The hot path is the OpenMP kernel (``fileio_checksum``) running at
    memory bandwidth across threads; the former single-threaded
    float64 numpy pass cost ~120 ms on a 202 MB brunch-scale factor
    table — 34% of a warm 10k-query approx retrieval call.  The numpy
    fallback below computes the identical sums single-threaded.
    """
    from buffalo_tpu.data.native import checksum_native

    a = np.ascontiguousarray(arr)
    sums = checksum_native(a)
    if sums is not None:
        return sums.tobytes()
    b = a.reshape(-1).view(np.uint8)
    n = b.shape[0]
    words = b[: (n // 8) * 8].view(np.uint64)
    out = np.zeros(64, dtype=np.uint64)
    n_words = words.shape[0]
    with np.errstate(over="ignore"):    # uint64 wrap IS the checksum
        if n_words >= 64:
            per = n_words // 64
            out += words[: per * 64].reshape(64, per).sum(
                axis=1, dtype=np.uint64)
            out[63] += words[per * 64:].sum(dtype=np.uint64)
        elif n_words:
            out[63] += words.sum(dtype=np.uint64)
        tail = b[(n // 8) * 8:]
        if tail.shape[0]:
            out[63] += tail.sum(dtype=np.uint64)
    return out.tobytes()


def _stage(arr: np.ndarray) -> jax.Array:
    """device_put with a small host-side cache.

    Retrieval is called repeatedly against the same factor table;
    re-transferring a multi-100MB table per call costs more than the
    scan itself over the tunneled link.  The cache key is (buffer
    address, shape, dtype, full positional checksum): in-place
    mutations (e.g. ``Algo.normalize``) change the checksum and
    re-stage.  The host array is kept referenced by the cache entry so
    its buffer address cannot be recycled while the key is live.
    """
    global _stage_cache
    if isinstance(arr, jax.Array):
        return arr
    from collections import OrderedDict
    if _stage_cache is None:
        _stage_cache = OrderedDict()
    key = (arr.__array_interface__["data"][0], arr.shape, arr.dtype.str,
           _fingerprint(arr))
    hit = _stage_cache.get(key)
    if hit is not None:
        _stage_cache.move_to_end(key)
        return hit[1]
    staged = jax.device_put(arr)
    _stage_cache[key] = (arr, staged)
    while len(_stage_cache) > 4:        # bound device-memory footprint
        _stage_cache.popitem(last=False)
    return staged


def _bucket_chunk_count(nc: int) -> int:
    """Round a chunk count up to a bounded grid: exact through 8, then
    ~1.25-geometric multiples of 4 (8, 12, 16, 20, 24, 32, 40, ...).

    The former power-of-two bucketing padded a 10k-query call (5
    chunks of 2048) up to 8 chunks — 64% wasted scan FLOPs on the
    headline retrieval shape.  This grid caps padding waste at ~25%
    while still bounding distinct compiled scan lengths (16 values up
    to 64 chunks vs pow2's 7; the persistent compile cache amortizes
    them across processes)."""
    if nc <= 8:
        return nc
    b = 8
    while b < nc:
        b = max(b + 4, -(-int(b * 1.25) // 4) * 4)
    return b


def _bucketed_chunks(p: np.ndarray, chunk: int) -> np.ndarray:
    """Pad queries into (nc_pad, chunk, d) blocks with the chunk count
    bucketed (see ``_bucket_chunk_count``) to bound recompiles across
    query-set sizes.  Shared by the single-device and sharded retrieval
    paths — keep their bucketing/padding policy identical."""
    B, d = p.shape
    nc_pad = _bucket_chunk_count(max(1, -(-B // chunk)))
    p_pad = np.zeros((nc_pad * chunk, d), dtype=np.float32)
    p_pad[:B] = p
    return p_pad.reshape(nc_pad, chunk, d)


def _assemble_topn(vals, idx, B: int, topk: int, k_eff: int):
    """(nc, chunk, k_eff) device results -> (B, topk) -1/0-padded."""
    out_keys = np.full((B, topk), -1, dtype=np.int32)
    out_scores = np.zeros((B, topk), dtype=np.float32)
    out_keys[:, :k_eff] = np.asarray(idx).reshape(-1, k_eff)[:B]
    out_scores[:, :k_eff] = np.asarray(vals).reshape(-1, k_eff)[:B]
    return out_keys, out_scores


@partial(jax.jit, static_argnames=("k", "with_bias", "approx"))
def _chunked_topn(p_chunks, Q, Qb, *, k, with_bias, approx=False):
    """All query chunks under one lax.scan: one dispatch per call."""
    def body(_, pc):
        scores = jnp.dot(pc, Q.T, preferred_element_type=jnp.float32)
        if with_bias:
            scores = scores + Qb[None, :]
        return None, _select_topk(scores, k, approx=approx)

    _, (vals, idx) = jax.lax.scan(body, None, p_chunks)
    return vals, idx


# the flat (chunk, n_items) score matrix OOMs past this many bytes;
# the tiled fallback below takes over.  Calibration points (v5e,
# 16 GB): 505k items x 2048 queries (4.1 GB nominal) runs FINE flat —
# XLA fuses scoring into top_k so the matrix never fully materializes
# (a 2 GB gate mistakenly routed the brunch catalog to the 16.6x
# slower tiled path: retrieval 0.36 -> 4.27 s, stream_w2v_u8.log);
# 5M x 2048 (40 GB) OOMs (ivf_5m_tpu.log).  8 GB splits the measured
# points with headroom.
_FLAT_SCORES_BYTES = 8 << 30


@partial(jax.jit, static_argnames=("k", "approx"))
def _chunked_topn_tiled(p_chunks, Q_tiles, Qb_tiles, *, k,
                        approx=False):
    """Catalog-axis tiled variant for multi-million-item tables.

    The flat scan materializes (chunk, n_items) scores per step —
    40 GB at a 5M x 2048 call (measured OOM, `ivf_5m_tpu.log`).  Here
    the items axis is tiled and each query chunk keeps a running
    (vals, idx) top-k merged per tile with one O(k) concat+top_k.
    NOTE: the always-on "two-stage top-k" was measured 16.6x SLOWER
    than the flat scan at 505k items and deleted (r3); this variant
    exists ONLY behind the memory gate — correctness over speed when
    the flat path cannot fit.  Qb_tiles carries -inf on padded rows,
    so padding can never enter the top-k.
    """
    ntiles, tile, d = Q_tiles.shape

    def body(_, pc):
        def tile_body(carry, xs):
            vals_c, idx_c = carry
            Qt, Qbt, t = xs
            scores = jnp.dot(pc, Qt.T,
                             preferred_element_type=jnp.float32)
            scores = scores + Qbt[None, :]
            tv, ti = _select_topk(scores, k, approx=approx)
            ti = ti + t * tile
            merged_v = jnp.concatenate([vals_c, tv], axis=1)
            merged_i = jnp.concatenate([idx_c, ti], axis=1)
            mv, sel = jax.lax.top_k(merged_v, k)
            mi = jnp.take_along_axis(merged_i, sel, axis=1)
            return (mv, mi), None

        B = pc.shape[0]
        init = (jnp.full((B, k), -jnp.inf, jnp.float32),
                jnp.full((B, k), -1, jnp.int32))
        (vals, idx), _ = jax.lax.scan(
            tile_body, init,
            (Q_tiles, Qb_tiles, jnp.arange(ntiles)))
        return None, (vals, idx)

    _, (vals, idx) = jax.lax.scan(body, None, p_chunks)
    return vals, idx


def batch_topn(p, Q, topk: int, pool=None, Qb=None, chunk: int = 2048,
               approx: bool = False, query_dtype=None):
    """Bulk MIPS retrieval: top-k of ``p @ Q^T (+ Qb)`` per query row.

    The device analog of ``parallel::dot_topn`` (``_core.hpp:88-142``):
    queries are padded into fixed (chunk, d) blocks and ALL blocks are
    scored under one ``lax.scan`` — one XLA dispatch per call instead
    of one per chunk (dispatch round trip is ~20-30 ms on the tunneled
    chip).  The chunk count is bucketed to a power of two so query-set
    size changes rarely recompile.  A ``pool`` restricts the candidate
    set (indices are mapped back); results are ``-1``-padded when the
    pool is smaller than ``topk``, matching the reference's padding
    semantics.

    ``approx=True`` swaps the exact per-chunk selection for
    ``lax.approx_max_k`` (measured 2.1x faster at 505k-wide rows on a
    v5e chip, recall@10 0.98 vs exact — see ``_select_topk``).

    ``query_dtype="bfloat16"`` uploads the query chunks at half width:
    on the tunneled chip the host->device query transfer measured
    106 ms of a 174 ms warm 10k-query approx call (the link is
    ~40 MB/s), so halving it is the single biggest remaining lever.
    Scores still accumulate in f32 (``preferred_element_type``); only
    the query operand is quantized (~3 significant digits).  The
    Parallel facade turns this on together with ``approx=True``.

    Returns (keys int32[B, topk], scores float32[B, topk]).
    """
    p = np.ascontiguousarray(np.asarray(p, dtype=np.float32))
    Q = np.asarray(Q, dtype=np.float32)
    if pool is not None:
        if len(pool) == 0:
            # an empty candidate set yields no recommendations — NOT
            # the full catalog
            return (np.full((p.shape[0], topk), -1, dtype=np.int32),
                    np.zeros((p.shape[0], topk), dtype=np.float32))
        Q = Q[pool]
        if Qb is not None:
            Qb = np.asarray(Qb)[pool]
    n_items = Q.shape[0]
    k_eff = min(topk, n_items)
    B, d = p.shape

    tiled = chunk * n_items * 4 > _FLAT_SCORES_BYTES
    # cache only the caller's stable full table; pool-sliced tables and
    # biases are per-call temporaries — caching them would churn the
    # 4-slot LRU with dead addresses and evict the big table.  The
    # tiled path stages its own padded copy, so the flat table must
    # NOT be uploaded (or pinned in the LRU) when the gate triggers.
    Q_d = None if tiled else (
        _stage(Q) if pool is None else jax.device_put(Q))
    with_bias = Qb is not None
    Qb_d = jax.device_put(
        np.ascontiguousarray(np.asarray(Qb, np.float32))) \
        if (with_bias and not tiled) else jnp.zeros((), jnp.float32)

    chunks = _bucketed_chunks(p, chunk)
    if query_dtype is not None and np.dtype(query_dtype).name != "float32":
        import ml_dtypes

        assert np.dtype(query_dtype) == np.dtype(ml_dtypes.bfloat16), \
            f"query_dtype must be float32 or bfloat16, got {query_dtype}"
        chunks = chunks.astype(ml_dtypes.bfloat16)
    if tiled:
        # multi-million-item catalogs: the flat (chunk, n_items) score
        # matrix would OOM — tile the items axis (see
        # _chunked_topn_tiled; gated because the tiled merge measured
        # 16.6x slower than the flat scan where both fit)
        tile = max(1, _FLAT_SCORES_BYTES // (chunk * 4))
        tile = min(n_items, -(-tile // 1024) * 1024)
        ntiles = -(-n_items // tile)
        Q_t = np.zeros((ntiles * tile, d), np.float32)
        Q_t[:n_items] = Q
        Qb_t = np.full(ntiles * tile, -np.inf, np.float32)
        Qb_t[:n_items] = np.asarray(Qb, np.float32) if with_bias \
            else 0.0
        vals, idx = _chunked_topn_tiled(
            chunks, jax.device_put(Q_t.reshape(ntiles, tile, d)),
            jax.device_put(Qb_t.reshape(ntiles, tile)), k=k_eff,
            approx=approx)
    else:
        vals, idx = _chunked_topn(chunks, Q_d,
                                  Qb_d, k=k_eff, with_bias=with_bias,
                                  approx=approx)
    out_keys, out_scores = _assemble_topn(vals, idx, B, topk, k_eff)
    if pool is not None:
        mapped = np.asarray(pool)[np.maximum(out_keys, 0)]
        out_keys = np.where(out_keys >= 0, mapped, -1).astype(np.int32)
    return out_keys, out_scores


@partial(jax.jit, static_argnames=("k", "mesh", "axis_name", "approx"))
def sharded_matmul_topk(p, Q, Qb, k: int, *, mesh, axis_name: str = "d",
                        approx: bool = False):
    """Distributed MIPS top-k: per-shard local top-k + O(k) merge.

    The mesh analog of ``parallel::dot_topn`` (``_core.hpp:88-142``):
    ``Q`` (and ``Qb``) are row-sharded over the mesh; each shard scores
    its slice with one MXU matmul and keeps a local top-k with global
    indices, then the ``(n_shards * k)`` candidates are all-gathered
    and merged with one more ``top_k`` — O(k) cross-shard traffic per
    query instead of O(items).  ``Q`` must be padded to a multiple of
    the mesh size with ``Qb = -inf`` rows so padding never wins.

    ``approx=True`` swaps the per-shard LOCAL selection for
    ``lax.approx_max_k`` (see ``_select_topk``); the O(k) cross-shard
    merge stays exact, so recall matches the single-device approx path.

    Returns (scores f32[B, k], indices int32[B, k]) replicated.
    """
    from jax.sharding import PartitionSpec as PS

    n_shards = mesh.shape[axis_name]

    def body(p, Q_loc, Qb_loc):
        scores = jnp.dot(p, Q_loc.T, preferred_element_type=jnp.float32) \
            + Qb_loc[None, :]
        S = Q_loc.shape[0]
        k_loc = min(k, S)
        v, i = _select_topk(scores, k_loc, approx=approx)
        gi = i + jax.lax.axis_index(axis_name) * S
        vg = jax.lax.all_gather(v, axis_name, axis=0)   # (D, B, k_loc)
        ig = jax.lax.all_gather(gi, axis_name, axis=0)
        B = p.shape[0]
        vg = jnp.transpose(vg, (1, 0, 2)).reshape(B, n_shards * k_loc)
        ig = jnp.transpose(ig, (1, 0, 2)).reshape(B, n_shards * k_loc)
        vm, sel = jax.lax.top_k(vg, min(k, n_shards * k_loc))
        im = jnp.take_along_axis(ig, sel, axis=1)
        return vm, im.astype(jnp.int32)

    # check_vma=False: the all_gather makes both outputs factually
    # replicated, but the static checker cannot infer it through the
    # enclosing lax.scan (same limitation as the sharded epochs,
    # CLAUDE.md gotchas)
    run = jax.shard_map(
        body, mesh=mesh,
        in_specs=(PS(), PS(axis_name), PS(axis_name)),
        out_specs=(PS(), PS()), check_vma=False)
    return run(p, Q, Qb)


@partial(jax.jit, static_argnames=("k", "mesh", "axis_name", "approx"))
def _sharded_scan_topn(p_chunks, Q, Qb, k: int, *, mesh,
                       axis_name: str = "d", approx: bool = False):
    """All query chunks through the sharded local-top-k + merge kernel
    under one lax.scan — one dispatch per call."""
    def step(_, pc):
        return None, sharded_matmul_topk(pc, Q, Qb, k, mesh=mesh,
                                         axis_name=axis_name,
                                         approx=approx)

    _, (vals, idx) = jax.lax.scan(step, None, p_chunks)
    return vals, idx


def batch_topn_sharded(p, Q, topk: int, mesh, Qb=None, chunk: int = 2048,
                       axis_name: str = "d", approx: bool = False):
    """Bulk sharded MIPS retrieval over a device mesh.

    Mesh variant of ``batch_topn``: the candidate table is row-sharded
    once (padded to a mesh multiple with -inf bias) and every query
    chunk runs the local-top-k + O(k)-merge kernel.
    """
    from jax.sharding import NamedSharding, PartitionSpec as PS

    p = np.ascontiguousarray(np.asarray(p, dtype=np.float32))
    Q = np.asarray(Q, dtype=np.float32)
    n_items, d = Q.shape
    D = mesh.shape[axis_name]
    pad = (-n_items) % D
    Qb_full = np.zeros(n_items, np.float32) if Qb is None \
        else np.asarray(Qb, dtype=np.float32)
    if pad:
        Q = np.vstack([Q, np.zeros((pad, d), np.float32)])
        Qb_full = np.concatenate(
            [Qb_full, np.full(pad, -np.inf, np.float32)])
    row_shard = NamedSharding(mesh, PS(axis_name))
    repl = NamedSharding(mesh, PS())
    Q_d = jax.device_put(Q, row_shard)
    Qb_d = jax.device_put(Qb_full, row_shard)

    k_eff = min(topk, n_items)
    B = p.shape[0]
    # one dispatch for all chunks (cf. batch_topn): scan over fixed
    # (chunk, d) query blocks, chunk count bucketed to a power of two
    vals, idx = _sharded_scan_topn(
        jax.device_put(_bucketed_chunks(p, chunk), repl),
        Q_d, Qb_d, k_eff, mesh=mesh, axis_name=axis_name, approx=approx)
    return _assemble_topn(vals, idx, B, topk, k_eff)


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
