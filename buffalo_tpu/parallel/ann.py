"""Approximate nearest-neighbor retrieval: an IVF (inverted-file) index.

The reference wires an optional external HNSW library (n2) for
sublinear ``most_similar`` (``examples/example_als.py:56-76``,
0.098-0.22 s for 10k queries vs 21-64 s exact on its CPU box).  Here
the ANN hook is backed by a TPU-native IVF index instead: spherical
k-means partitions the item vectors into ``n_clusters`` cells (a few
jitted Lloyd iterations — one matmul + argmax + segment-sum each), and
a query scores only the ``n_probe`` nearest cells.  Both phases are
MXU matmuls, so the index needs no native library, serializes with
numpy, and the accuracy/speed trade is the standard IVF recall curve
(probing all cells is exact).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def _score_topk(queries, table, cand, mask, *, k):
    import jax
    import jax.numpy as jnp

    gathered = jnp.take(table, cand, axis=0)          # (B, W, d)
    s = jnp.einsum("bd,bwd->bw", queries, gathered,
                   preferred_element_type=jnp.float32)
    s = jnp.where(mask, s, -jnp.inf)
    # top-k on device: only (B, k) crosses back to the host, not the
    # full (B, W) score matrix
    vals, idx = jax.lax.top_k(s, k)
    return vals, jnp.take_along_axis(cand, idx, axis=1)


_score_topk_jit = None  # module-level jit: one trace cache for all searches


class IVFIndex:
    """Inverted-file MIPS index over a (N, d) float32 table.

    Build with :meth:`build`; query with :meth:`search` (the
    ``Parallel.set_ann_index`` contract: ``search(queries, topk) ->
    (ids int32[B, topk] (-1 padded), scores f32[B, topk])``).
    """

    def __init__(self, centroids: np.ndarray, assignments: np.ndarray,
                 table: np.ndarray, n_probe: int = 8):
        """``assignments`` is (N,) for single-cell assignment or (N, s)
        for spill assignment (each row indexed in its ``s`` best cells;
        raises recall at the cost of an s-times-larger inverted file)."""
        self.centroids = np.asarray(centroids, dtype=np.float32)
        assignments = np.asarray(assignments)
        if assignments.ndim == 1:
            assignments = assignments[:, None]
        n_rows, self.spill = assignments.shape
        item = np.repeat(np.arange(n_rows, dtype=np.int64), self.spill)
        cells = assignments.ravel()
        order = np.argsort(cells, kind="stable")
        self.ids = item[order].astype(np.int32)     # rows grouped by cell
        counts = np.bincount(cells, minlength=len(centroids))
        self.cell_ptr = np.zeros(len(centroids) + 1, dtype=np.int64)
        np.cumsum(counts, out=self.cell_ptr[1:])
        self.table = np.ascontiguousarray(
            np.asarray(table, dtype=np.float32)[item[order]])
        self.n_probe = int(n_probe)

    # ----------------------------------------------------------------- build
    @classmethod
    def build(cls, table: np.ndarray, n_clusters: Optional[int] = None,
              n_probe: int = 8, n_iters: int = 10, seed: int = 0,
              spill: int = 1) -> "IVFIndex":
        """Spherical k-means over the (normalized) table rows.

        ``spill > 1`` indexes every row in its ``spill`` nearest cells
        (duplicates are removed at search time), trading index memory
        for recall — the IVF analog of HNSW's multi-edge redundancy.
        """
        import jax
        import jax.numpy as jnp

        table = np.asarray(table, dtype=np.float32)
        N, d = table.shape
        if n_clusters is None:
            n_clusters = max(1, int(np.sqrt(N)))
        n_clusters = min(n_clusters, N)
        rng = np.random.default_rng(seed)
        norms = np.linalg.norm(table, axis=1, keepdims=True)
        unit = table / np.maximum(norms, 1e-12)
        cent = unit[rng.choice(N, n_clusters, replace=False)]

        @jax.jit
        def lloyd(cent, unit):
            assign = jnp.argmax(
                jnp.dot(unit, cent.T,
                        preferred_element_type=jnp.float32), axis=1)
            sums = jax.ops.segment_sum(unit, assign,
                                       num_segments=cent.shape[0])
            cnt = jax.ops.segment_sum(jnp.ones(unit.shape[0]), assign,
                                      num_segments=cent.shape[0])
            new = jnp.where(cnt[:, None] > 0,
                            sums / jnp.maximum(cnt[:, None], 1.0), cent)
            return new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12), assign

        unit_d = jax.device_put(unit)
        cent_d = jax.device_put(cent)
        assign = None
        for _ in range(n_iters):
            cent_d, assign = lloyd(cent_d, unit_d)
        spill = max(1, min(int(spill), n_clusters))
        if spill > 1:
            scores = jnp.dot(unit_d, cent_d.T,
                             preferred_element_type=jnp.float32)
            _, assign = jax.lax.top_k(scores, spill)
        return cls(np.asarray(cent_d), np.asarray(assign), table,
                   n_probe=n_probe)

    # ------------------------------------------------------------- serialize
    def save(self, path: str) -> None:
        """Persist as a single .npz (the analog of the reference's
        ``ann.save_index(path)`` in examples/example_als.py:62-66)."""
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 centroids=self.centroids, ids=self.ids,
                 cell_ptr=self.cell_ptr, table=self.table,
                 n_probe=np.int64(self.n_probe),
                 spill=np.int64(self.spill))

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with np.load(path if path.endswith(".npz")
                     else path + ".npz") as z:
            idx = cls.__new__(cls)
            idx.centroids = z["centroids"]
            idx.ids = z["ids"]
            idx.cell_ptr = z["cell_ptr"]
            idx.table = z["table"]
            idx.n_probe = int(z["n_probe"])
            idx.spill = int(z["spill"]) if "spill" in z else 1
        return idx

    # ---------------------------------------------------------------- search
    def search(self, queries: np.ndarray, topk: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe the ``n_probe`` nearest cells per query, exact-scan
        their members, return global top-k (ids -1-padded)."""
        import jax

        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        B = queries.shape[0]
        n_probe = min(self.n_probe, len(self.centroids))

        qn = queries / np.maximum(
            np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        cell_scores = qn @ self.centroids.T
        if n_probe < cell_scores.shape[1]:
            # probe order is irrelevant (every candidate is exact-
            # scored), so an O(C) partition beats a full argsort
            probes = np.argpartition(-cell_scores, n_probe - 1,
                                     axis=1)[:, :n_probe]
        else:
            probes = np.argsort(-cell_scores, axis=1)[:, :n_probe]

        # fixed candidate width keeps the scoring shape static: pad
        # each query's candidate list to the max probed population,
        # rounded up to a power of two so the jitted scorer compiles
        # once per bucket instead of once per data-dependent width
        lo = self.cell_ptr[probes]                    # (B, P)
        lens = self.cell_ptr[probes + 1] - lo         # (B, P)
        cand_counts = lens.sum(axis=1)
        width = int(max(cand_counts.max(), topk))
        width = 1 << max(0, int(np.ceil(np.log2(max(width, 1)))))
        # ragged fill, fully vectorized: enumerate every (query, probe)
        # span element once — O(total candidates), no Python loop
        flat_lens = lens.ravel()
        total = int(flat_lens.sum())
        span_ends = np.cumsum(flat_lens)
        span_starts = span_ends - flat_lens
        pos_in_span = np.arange(total, dtype=np.int64) - np.repeat(
            span_starts, flat_lens)
        vals = np.repeat(lo.ravel(), flat_lens) + pos_in_span
        row_ends = np.cumsum(cand_counts)
        row_starts = row_ends - cand_counts
        row = np.repeat(np.arange(B, dtype=np.int64), cand_counts)
        col = np.arange(total, dtype=np.int64) - np.repeat(
            row_starts, cand_counts)
        cand = np.zeros((B, width), dtype=np.int64)  # positions in table
        mask = np.zeros((B, width), dtype=bool)
        cand[row, col] = vals
        mask[row, col] = True

        global _score_topk_jit
        if _score_topk_jit is None:
            _score_topk_jit = partial(jax.jit, static_argnames="k")(
                _score_topk)
        if getattr(self, "_table_dev", None) is None:
            # transfer the item table once; every search reuses it
            self._table_dev = jax.device_put(self.table)

        spill = getattr(self, "spill", 1)
        # with spill an item can sit in several probed cells; over-fetch
        # so dedup can still fill topk slots (each id repeats <= spill)
        k = min(topk * spill, width)
        top_scores, top_pos = _score_topk_jit(queries, self._table_dev,
                                              cand, mask, k=k)
        top_scores = np.asarray(top_scores)
        top_pos = np.asarray(top_pos)
        cand_ids = np.where(np.isfinite(top_scores),
                            self.ids[top_pos], -1).astype(np.int32)

        ids = np.full((B, topk), -1, dtype=np.int32)
        out_scores = np.zeros((B, topk), dtype=np.float32)
        if spill > 1:
            # keep the first (= highest-scoring: top_k output is score-
            # descending and the id-sort below is stable) occurrence of
            # every id, then compact the keepers left into topk columns
            order = np.argsort(cand_ids, axis=1, kind="stable")
            sorted_ids = np.take_along_axis(cand_ids, order, axis=1)
            first_sorted = np.ones_like(sorted_ids, dtype=bool)
            first_sorted[:, 1:] = sorted_ids[:, 1:] != sorted_ids[:, :-1]
            first = np.empty_like(first_sorted)
            np.put_along_axis(first, order, first_sorted, axis=1)
            keep = first & (cand_ids >= 0)
            rank = np.cumsum(keep, axis=1) - 1
            keep &= rank < topk
            rows = np.nonzero(keep)[0]
            ids[rows, rank[keep]] = cand_ids[keep]
            out_scores[rows, rank[keep]] = top_scores[keep]
        else:
            ids[:, :k] = cand_ids[:, :k]
            out_scores[:, :k] = np.where(cand_ids[:, :k] >= 0,
                                         top_scores[:, :k], 0.0)
        return ids, out_scores
