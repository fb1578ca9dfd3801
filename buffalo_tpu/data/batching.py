"""Fixed-shape device batching of CSR interaction data.

TPU-native replacement for the reference's bounded-memory HDF5 chunk
iterator (``buffalo/data/buffered_data.py:27-266``).  XLA compiles one
program per input shape, so instead of "as many rows as fit in
``batch_mb``" we build **degree-bucketed padded batches**: rows are
grouped by ceil-power-of-two degree ``L``; a bucket's batch holds ``B``
rows padded to ``(B, L)`` with ``B*L`` bounded by the ``batch_mb``
entry budget.  The number of distinct ``(B, L)`` shapes — and hence
XLA recompiles — is bounded by the number of power-of-two buckets
(~20) for any dataset.

Batches are host numpy; ``DeviceBatcher`` double-buffers them onto the
device (``jax.device_put`` is async) and can pin the whole epoch
on-device ("resident" mode) when it fits the HBM budget, which is the
common case for MovieLens/KakaoBrunch-scale data and removes all
host↔device traffic after the first epoch.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

from buffalo_tpu.utils import log

MIN_L = 8
MIN_B = 8
# rows longer than this are split into fixed-width chunks and their
# normal-equation statistics accumulated by segment-sum (SegmentBatch)
# instead of one giant padded row: a power-law head item at 730M-nnz
# scale would otherwise need a multi-GB (1, deg, d) gather
DEFAULT_MAX_L = 8192
# buckets at or below this padded length are solved matrix-free (no
# (B, d, d) system in HBM), so the per-batch row cap only applies to
# longer buckets (ops/als_kernels.MATRIX_FREE_MAX_L uses this value)
MATRIX_FREE_MAX_L = 96


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(math.ceil(math.log2(max(1, x)))))


def _bucket_lengths(max_len: int) -> np.ndarray:
    """~1.25-geometric row-length grid, multiples of 8.

    The gather of fixed-side rows costs per *padded* entry, so finer
    buckets than pow2 (worst-case 2x waste) directly cut epoch time;
    1.25 steps bound padding waste at ~25% while keeping the number
    of distinct XLA shapes small (~30 for any dataset).
    """
    out = [MIN_L]
    while out[-1] < max_len:
        nxt = min(max_len, int(math.ceil(out[-1] * 1.25 / 8) * 8))
        out.append(max(nxt, out[-1] + 8))
    return np.unique(np.asarray(out, dtype=np.int64))


class PaddedBatch(NamedTuple):
    """One fixed-shape batch of rows from a CSR orientation.

    rows: int32[B] original row ids (padding rows carry the out-of-range
          id num_rows with len 0 so device scatters drop them)
    lens: int32[B] true row lengths (0 for padding rows)
    cols: int32[B, L] neighbor ids, padded with 0
    vals: float32[B, L] values, padded with 0

    A NamedTuple so batches are jax pytrees: they can be staged onto a
    device with one ``jax.device_put`` and passed whole into jitted
    epoch steps.
    """
    rows: np.ndarray
    lens: np.ndarray
    cols: np.ndarray
    vals: np.ndarray

    @property
    def shape(self):
        return self.cols.shape

    @property
    def num_real_rows(self) -> int:
        return int((self.lens > 0).sum())


class SegmentBatch(NamedTuple):
    """Long rows, split into fixed-width chunks for segment-sum stats.

    rows:       int32[R]  global row ids (padding rows -> num_rows)
    lens:       int32[R]  true total row lengths (0 for padding)
    seg_ids:    int32[Nc] local row index of each chunk (padding -> R)
    chunk_lens: int32[Nc] valid entries per chunk
    cols:       int32[Nc, C] neighbor ids
    vals:       float32[Nc, C] values

    All chunks of one row live in the same batch, so per-row statistics
    are exact after a segment-sum over ``seg_ids``.
    """
    rows: np.ndarray
    lens: np.ndarray
    seg_ids: np.ndarray
    chunk_lens: np.ndarray
    cols: np.ndarray
    vals: np.ndarray

    @property
    def shape(self):
        return self.cols.shape

    @property
    def num_real_rows(self) -> int:
        return int((self.lens > 0).sum())


class RangeBatch(NamedTuple):
    """A padded batch whose rows are a CONTIGUOUS range of a permuted
    factor table: [row_start, row_start + B).

    Scatter into a 21.9M-row table costs ~133 ns/row on TPU (hardware
    floor, index hints change nothing); after permuting the table into
    bucket order once per training run, the update becomes a
    dynamic_update_slice (pure bandwidth) and the current-row read a
    dynamic_slice.  ``row_start`` is an int32 scalar array so stacked
    groups can scan over it.
    """
    row_start: np.ndarray    # int32 () — first row of the range
    lens: np.ndarray         # int32[B] true row lengths (0 padding)
    cols: np.ndarray         # int32[B, L] (ids in the OTHER table's
    vals: np.ndarray         # float32[B, L]         permuted order)

    @property
    def shape(self):
        return self.cols.shape

    @property
    def num_real_rows(self) -> int:
        return int((self.lens > 0).sum())


def _gather_remapped(indptr, key, val, rows, B, L, other_newpos,
                     vals_dtype=np.float32):
    """Gather CSR rows into a padded (B, L) block.

    The one ragged-CSR gather used by both the range-layout builders
    and ``BatchPlanner.iter_batches``.  ``rows`` may be shorter than B
    (the rest is padding with len 0); ``other_newpos``, when given,
    maps the raw neighbor ids into the permuted other table's
    positions.
    """
    n = len(rows)
    if n:
        from buffalo_tpu.data import native
        got = native.gather_remapped_native(
            np.asarray(indptr), np.asarray(key),
            None if val is None else np.asarray(val),
            np.asarray(rows), B, L, other_newpos, vals_dtype)
        if got is not None:
            return got
    out_lens = np.zeros(B, dtype=np.int32)
    pad_cols = np.zeros((B, L), dtype=np.int32)
    pad_vals = np.zeros((B, L), dtype=vals_dtype)
    if n:
        key = np.asarray(key)
        beg = indptr[rows]
        lens = (indptr[rows + 1] - beg).astype(np.int32)
        offs = np.arange(L, dtype=np.int64)[None, :]
        idx = beg[:, None] + np.minimum(offs,
                                        np.maximum(lens[:, None] - 1, 0))
        mask = offs < lens[:, None]
        raw = key[idx]
        cols = np.where(mask,
                        raw if other_newpos is None else other_newpos[raw],
                        0)
        if val is not None:
            vals = np.where(mask, np.asarray(val, np.float32)[idx], 0.0)
        else:
            vals = mask.astype(np.float32)
        out_lens[:n] = lens
        pad_cols[:n] = cols
        pad_vals[:n] = vals.astype(vals_dtype)
    return out_lens, pad_cols, pad_vals


def build_range_layout(row_planner: "BatchPlanner",
                       col_planner: "BatchPlanner",
                       row_key, row_val, col_key, col_val,
                       vals_dtype=np.float32):
    """Permute both orientations into bucket order and emit RangeBatches.

    Returns (row_batches, col_batches, u_newpos, i_newpos, u_rows_padded,
    i_rows_padded): ``*_newpos[old_id] -> position`` in the permuted
    (and padded) table; every real row gets a position (degree-0 rows
    at the tail, untouched by training).  Cross-references are
    remapped: rowwise ``cols`` carry item positions, colwise ``cols``
    user positions.  Long rows (SegmentBatch) keep scatter semantics
    with remapped ids.
    """
    def positions(planner):
        num = planner.num_rows
        newpos = np.full(num, -1, dtype=np.int64)
        plan = []  # (row_ids, start, B) per batch
        pos = 0
        bmult = planner.batch_rows_multiple
        for bucket in planner.buckets:
            ids = bucket.row_ids
            for beg in range(0, len(ids), bucket.B):
                rows = ids[beg:beg + bucket.B]
                n = len(rows)
                B = min(bucket.B, -(-n // bmult) * bmult)
                newpos[rows] = pos + np.arange(n)
                plan.append((rows, pos, B, int(bucket.L)))
                pos += B
        seg = np.asarray(
            [r for p in planner.segment_plans for r in p], dtype=np.int64)
        first_free = pos
        # segment rows then degree-0 rows at the tail
        deg0 = np.nonzero(newpos < 0)[0]
        if len(seg):
            deg0 = deg0[~np.isin(deg0, seg)]
        tail = np.concatenate([seg, deg0])
        newpos[tail] = first_free + np.arange(len(tail))
        total = first_free + len(tail)
        padded = -(-total // MIN_B) * MIN_B
        return newpos, plan, padded

    u_newpos, u_plan, u_padded = positions(row_planner)
    i_newpos, i_plan, i_padded = positions(col_planner)

    def emit(planner, plan, key, val, self_newpos, other_newpos):
        out = []
        indptr = planner.indptr
        key = np.asarray(key)  # native gather takes int32/int64 as-is
        for rows, pos, B, L in plan:
            out_lens, pad_cols, pad_vals = _gather_remapped(
                indptr, key, val, rows, B, L, other_newpos, vals_dtype)
            out.append(RangeBatch(row_start=np.int32(pos),
                                  lens=out_lens, cols=pad_cols,
                                  vals=pad_vals))
        # segment batches: remap both the row ids and the col ids
        for plan_rows in planner.segment_plans:
            out.append(_remap_segment(planner, plan_rows, key, val,
                                      self_newpos, other_newpos, vals_dtype))
        return out

    row_batches = emit(row_planner, u_plan, row_key, row_val,
                       u_newpos, i_newpos)
    col_batches = emit(col_planner, i_plan, col_key, col_val,
                       i_newpos, u_newpos)
    return (row_batches, col_batches, u_newpos, i_newpos,
            int(u_padded), int(i_padded))


def _remap_segment(planner, plan_rows, key, val, self_newpos, other_newpos,
                   vals_dtype=np.float32):
    """Build one SegmentBatch with row/col ids remapped into permuted
    table positions (padding rows point out of range so device scatters
    drop them)."""
    sb = planner._build_segment_batch(plan_rows, key, val)
    rows = np.where(sb.lens > 0,
                    np.take(np.concatenate([self_newpos,
                                            np.array([1 << 30])]),
                            np.minimum(sb.rows, len(self_newpos))),
                    1 << 30).astype(np.int32)
    cols = other_newpos[sb.cols.astype(np.int64)].astype(np.int32)
    return SegmentBatch(rows=rows, lens=sb.lens, seg_ids=sb.seg_ids,
                        chunk_lens=sb.chunk_lens, cols=cols,
                        vals=sb.vals.astype(vals_dtype))


def build_sharded_range_layout(row_planner: "BatchPlanner",
                               col_planner: "BatchPlanner",
                               row_key, row_val, col_key, col_val,
                               num_shards: int, vals_dtype=np.float32):
    """Permute both tables into PER-SHARD bucket order for shard_map.

    Mesh-aware variant of ``build_range_layout``: shard k of the
    permuted table is the contiguous block ``[k*S, (k+1)*S)``; within a
    shard, rows sit in bucket order so every batch updates a contiguous
    LOCAL range (``dynamic_update_slice`` on the shard, never a scatter
    into the full table).  Every shard carries an IDENTICAL batch
    schedule — uneven bucket splits are filled with padding rows — so
    the stacked groups gain a leading mesh axis and ride straight into
    ``shard_map`` (the TPU replacement for the reference's OpenMP row
    loop, ``als.cc:148-152``, that also row-shards the tables).

    Returns ``(row_groups, col_groups, row_segments, col_segments,
    u_newpos, i_newpos, S_u, S_i)``:

    * groups: stacked ``RangeBatch`` pytrees, leading axis = shard
      (``row_start (D, n)``, ``lens (D, n, B)``, ``cols/vals
      (D, n, B, L)``); the local ``row_start`` schedule is identical
      across shards.
    * segments: ``SegmentBatch`` list with GLOBAL remapped ids — long
      rows keep scatter semantics and run outside shard_map.
    * ``*_newpos[old_id] -> global position``; padded table height is
      ``num_shards * S``.
    """
    D = int(num_shards)

    def positions(planner):
        num = planner.num_rows
        local = np.full(num, -1, dtype=np.int64)
        shard = np.zeros(num, dtype=np.int64)
        plan = []  # (parts per shard, local_start, n_pad, B, L)
        pos = 0
        for bucket in planner.buckets:
            parts = np.array_split(bucket.row_ids, D)
            n_pad = -(-max(len(p) for p in parts) // MIN_B) * MIN_B
            B = min(int(bucket.B), n_pad)
            for k, part in enumerate(parts):
                shard[part] = k
                local[part] = pos + np.arange(len(part))
            plan.append((parts, pos, n_pad, B, int(bucket.L)))
            pos += n_pad
        # tail: long (segment) rows then degree-0 rows, round-robin
        seg = np.asarray([r for p in planner.segment_plans for r in p],
                         dtype=np.int64)
        deg0 = np.nonzero(local < 0)[0]
        if len(seg):
            deg0 = deg0[~np.isin(deg0, seg)]
        tail = np.concatenate([seg, deg0])
        for k in range(D):
            mine = tail[k::D]
            shard[mine] = k
            local[mine] = pos + np.arange(len(mine))
        S = pos + (-(-len(tail) // D) if len(tail) else 0)
        S = -(-max(S, MIN_B) // MIN_B) * MIN_B
        return (shard * S + local), plan, int(S)

    u_newpos, u_plan, S_u = positions(row_planner)
    i_newpos, i_plan, S_i = positions(col_planner)

    def emit(planner, plan, key, val, self_newpos, other_newpos):
        from buffalo_tpu.data import native
        key = np.asarray(key)  # native gather takes int32/int64 as-is
        val_a = None if val is None else np.asarray(val)
        indptr = planner.indptr
        # batch slots in per-shard append order; grouping by shape in
        # first-appearance order matches stack_batches exactly
        slot_groups: Dict[tuple, list] = {}
        order: List[tuple] = []
        for parts, start, n_pad, B, L in plan:
            for lo in range(0, n_pad, B):
                Bj = min(B, n_pad - lo)
                shape = (Bj, L)
                if shape not in slot_groups:
                    slot_groups[shape] = []
                    order.append(shape)
                slot_groups[shape].append((parts, start + lo, lo, Bj, L))

        def direct_fill():
            # native gather writes each (shard, batch) block of the
            # final stacked group arrays in place: no per-batch
            # allocations and no double np.stack copy afterwards
            groups = []
            for shape in order:
                slots = slot_groups[shape]
                n = len(slots)
                Bj, L = shape
                row_start = np.empty((D, n), dtype=np.int32)
                lens = np.zeros((D, n, Bj), dtype=np.int32)
                cols = np.zeros((D, n, Bj, L), dtype=np.int32)
                vals = np.zeros((D, n, Bj, L), dtype=vals_dtype)
                for j, (parts, rs, lo, Bj, L) in enumerate(slots):
                    row_start[:, j] = rs
                    for k in range(D):
                        rows = parts[k][lo:lo + Bj]
                        if not len(rows):
                            continue
                        got = native.gather_remapped_native(
                            indptr, key, val_a, rows, Bj, L,
                            other_newpos, vals_dtype,
                            out=(lens[k, j], cols[k, j], vals[k, j]))
                        if got is None:
                            return None
                groups.append(RangeBatch(row_start=row_start, lens=lens,
                                         cols=cols, vals=vals))
            return groups

        groups = direct_fill() if native.get_lib() is not None else None
        if groups is None:
            per_shard: List[List[RangeBatch]] = [[] for _ in range(D)]
            for parts, start, n_pad, B, L in plan:
                for lo in range(0, n_pad, B):
                    Bj = min(B, n_pad - lo)
                    for k in range(D):
                        rows = parts[k][lo:lo + Bj]
                        lens, cols, vals = _gather_remapped(
                            indptr, key, val, rows, Bj, L, other_newpos,
                            vals_dtype)
                        per_shard[k].append(RangeBatch(
                            row_start=np.int32(start + lo), lens=lens,
                            cols=cols, vals=vals))
            # same-shape stacking within each shard is aligned across
            # shards by construction; add the shard axis in front
            stacked = [stack_batches(bs) for bs in per_shard]
            groups = []
            for i, g0 in enumerate(stacked[0]):
                groups.append(type(g0)(*[
                    np.stack([np.asarray(getattr(s[i], f))
                              for s in stacked])
                    for f in g0._fields]))
        segments = [_remap_segment(planner, p, key, val, self_newpos,
                                   other_newpos, vals_dtype)
                    for p in planner.segment_plans]
        return groups, segments

    row_groups, row_segments = emit(row_planner, u_plan, row_key, row_val,
                                    u_newpos, i_newpos)
    col_groups, col_segments = emit(col_planner, i_plan, col_key, col_val,
                                    i_newpos, u_newpos)
    return (row_groups, col_groups, row_segments, col_segments,
            u_newpos, i_newpos, S_u, S_i)


@dataclass
class _BucketPlan:
    L: int                    # padded row length
    B: int                    # rows per batch
    row_ids: np.ndarray       # all row ids in this bucket (int64)


class BatchPlanner:
    """Plan fixed-shape batches for one CSR orientation."""

    def __init__(self, indptr: np.ndarray, batch_mb: int = 1024,
                 entries_per_batch: Optional[int] = None,
                 row_multiple: int = 1, max_len: int = DEFAULT_MAX_L,
                 max_rows: Optional[int] = None,
                 matrix_free: bool = True):
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.num_rows = len(self.indptr) - 1
        degrees = np.diff(self.indptr)
        # 16 bytes/entry mirrors the reference's budget math
        # (buffered_data.py:47): batch_mb MB / 16 entries
        if entries_per_batch is None:
            entries_per_batch = max(int(batch_mb) * 1024 * 1024 // 16, 4096)
        self.entries_per_batch = entries_per_batch
        self.row_multiple = max(1, int(row_multiple))
        # round up to a multiple of 8 so the bucket grid lands exactly
        # on max_len; otherwise rows just below a non-multiple cap get
        # an L above it and are misrouted to the segment/scatter path
        self.max_len = -(-max(MIN_L, int(max_len)) // 8) * 8

        buckets: Dict[int, List[int]] = {}
        nonzero = np.nonzero(degrees)[0]
        grid = _bucket_lengths(self.max_len)
        if len(nonzero):
            d_nz = degrees[nonzero]
            Ls = np.where(
                d_nz > self.max_len, _next_pow2(self.max_len) * 2,
                grid[np.minimum(np.searchsorted(grid, d_nz), len(grid) - 1)])
        else:
            Ls = np.array([], dtype=np.int64)
        long_mask = Ls > self.max_len
        long_rows = nonzero[long_mask] if len(nonzero) else nonzero
        short = nonzero[~long_mask] if len(nonzero) else nonzero
        short_Ls = Ls[~long_mask] if len(nonzero) else Ls
        for L in np.unique(short_Ls):
            buckets[int(L)] = short[short_Ls == L]
        self.buckets: List[_BucketPlan] = []
        # B is a multiple of 8 (f32 sublane tile) and of row_multiple —
        # NOT pow2: padding rows still gather L fixed-side rows each, so
        # over-rounding B costs real epoch time
        bmult = MIN_B * self.row_multiple // math.gcd(MIN_B,
                                                      self.row_multiple)
        for L, row_ids in sorted(buckets.items()):
            B = max(bmult, entries_per_batch // L // bmult * bmult)
            if max_rows is not None and (not matrix_free
                                         or L > MATRIX_FREE_MAX_L):
                # the direct solve materializes a lane-padded (B, d, d)
                # system; bound rows per batch independently of the
                # entry budget.  Matrix-free CG buckets skip the cap
                # below MATRIX_FREE_MAX_L, but a consumer on a direct
                # solver (llt/ldlt) materializes the system at EVERY L,
                # so it passes matrix_free=False to cap all buckets.
                B = min(B, max(bmult, max_rows // bmult * bmult))
            # don't overshoot tiny buckets: one batch is enough
            B = min(B, -(-len(row_ids) // bmult) * bmult)
            self.buckets.append(_BucketPlan(L=L, B=B,
                                            row_ids=np.asarray(row_ids)))
        self.batch_rows_multiple = bmult
        self.segment_plans = self._plan_segments(long_rows, degrees)
        self.num_batches = sum(int(math.ceil(len(b.row_ids) / b.B))
                               for b in self.buckets) + len(self.segment_plans)

    def _plan_segments(self, long_rows: np.ndarray, degrees: np.ndarray
                       ) -> List[List[int]]:
        """Pack long rows into batches of <= entries_per_batch chunk entries.

        All chunks of a row stay in one batch (per-row stats must be
        complete within the batch); a single row always fits because
        its degree is bounded by the other axis' size.
        """
        if len(long_rows) == 0:
            return []
        C = self.max_len
        chunk_budget = max(1, self.entries_per_batch // C)
        plans: List[List[int]] = []
        cur: List[int] = []
        cur_chunks = 0
        # process big rows first so batches pack tightly
        order = np.argsort(-degrees[long_rows], kind="stable")
        for r in long_rows[order]:
            n_chunks = int(math.ceil(degrees[r] / C))
            if cur and cur_chunks + n_chunks > chunk_budget:
                plans.append(cur)
                cur, cur_chunks = [], 0
            cur.append(int(r))
            cur_chunks += n_chunks
        if cur:
            plans.append(cur)
        return plans

    def shapes(self) -> List[tuple]:
        return [(b.B, b.L) for b in self.buckets]

    def padded_entries(self) -> int:
        """Exact padded (cols) entry count of the planned epoch —
        buckets plus segment chunks.  The one number the resident /
        group-dispatch / vals-dtype budget decisions should share
        (a final partial batch is counted at full B: a tight upper
        bound)."""
        total = sum(b.B * b.L * int(math.ceil(len(b.row_ids) / b.B))
                    for b in self.buckets)
        if self.segment_plans:
            deg = np.diff(self.indptr)
            for plan in self.segment_plans:
                total += int(np.ceil(
                    deg[plan] / self.max_len).sum()) * self.max_len
        return total

    def iter_batches(self, key: np.ndarray, val: Optional[np.ndarray]
                     ) -> Iterator[PaddedBatch]:
        """Materialize padded batches from flat CSR key/val arrays."""
        indptr = self.indptr
        bmult = getattr(self, "batch_rows_multiple", MIN_B)
        key = np.asarray(key, dtype=np.int32)
        for bucket in self.buckets:
            ids = bucket.row_ids
            for start in range(0, len(ids), bucket.B):
                rows = ids[start:start + bucket.B]
                n = len(rows)
                # shrink the (always-partial) final batch of the bucket
                B = min(bucket.B, -(-n // bmult) * bmult)
                out_lens, cols, vals = _gather_remapped(
                    indptr, key, val, rows, B, bucket.L, None)
                # padding rows carry the out-of-range id num_rows so that
                # device scatters with mode="drop" ignore them
                out_rows = np.full(B, self.num_rows, dtype=np.int32)
                out_rows[:n] = rows
                yield PaddedBatch(rows=out_rows, lens=out_lens,
                                  cols=cols, vals=vals)
        for plan in self.segment_plans:
            yield self._build_segment_batch(plan, key, val)

    def _build_segment_batch(self, plan: Sequence[int], key: np.ndarray,
                             val: Optional[np.ndarray]) -> SegmentBatch:
        return build_segment_batch(self.indptr, key, val, plan,
                                   self.max_len, self.num_rows)


def pad_rows(indptr: np.ndarray, key: np.ndarray, val: Optional[np.ndarray],
             rows: np.ndarray, L: Optional[int] = None):
    """Gather the given rows of a CSR into a padded (len(rows), L) block.

    Used when a second CSR group must be fetched for the same row set
    as an existing batch (CFR's synchronized colwise+sppmi item pass,
    reference ``buffered_data.py:120-160``).  ``L`` defaults to the
    next power of two of the max degree among ``rows``.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    rows = np.asarray(rows, dtype=np.int64)
    safe = np.clip(rows, 0, len(indptr) - 2)
    beg = indptr[safe]
    lens = (indptr[safe + 1] - beg).astype(np.int32)
    lens = np.where((rows >= 0) & (rows < len(indptr) - 1), lens, 0)
    if L is None:
        L = max(MIN_L, _next_pow2(int(lens.max()) if len(lens) else 1))
    offs = np.arange(L, dtype=np.int64)[None, :]
    idx = beg[:, None] + np.minimum(offs, np.maximum(lens[:, None] - 1, 0))
    mask = offs < lens[:, None]
    cols = np.where(mask, np.asarray(key, dtype=np.int32)[idx], 0)
    if val is not None:
        vals = np.where(mask, np.asarray(val, dtype=np.float32)[idx],
                        0.0).astype(np.float32)
    else:
        vals = mask.astype(np.float32)
    return lens, cols.astype(np.int32), vals


def build_segment_batch(indptr: np.ndarray, key: np.ndarray,
                        val: Optional[np.ndarray], plan: Sequence[int],
                        chunk_width: int, num_rows: int) -> SegmentBatch:
    """Pack the given rows of a CSR into a SegmentBatch of fixed-width
    chunks (see SegmentBatch docstring); padding rows point to
    ``num_rows`` so device scatters drop them."""
    indptr = np.asarray(indptr, dtype=np.int64)
    C = int(chunk_width)
    rows = np.asarray(plan, dtype=np.int64)
    lens = (indptr[rows + 1] - indptr[rows]).astype(np.int64)
    n_chunks = np.maximum(np.ceil(lens / C).astype(np.int64), 1)
    R = max(MIN_B, -(-len(rows) // MIN_B) * MIN_B)
    Nc = max(MIN_B, -(-int(n_chunks.sum()) // MIN_B) * MIN_B)

    out_rows = np.full(R, num_rows, dtype=np.int32)
    out_rows[:len(rows)] = rows
    out_lens = np.zeros(R, dtype=np.int32)
    out_lens[:len(rows)] = lens

    seg_ids = np.full(Nc, R, dtype=np.int32)  # padding chunks -> R
    chunk_lens = np.zeros(Nc, dtype=np.int32)
    cols = np.zeros((Nc, C), dtype=np.int32)
    vals = np.zeros((Nc, C), dtype=np.float32)
    key = np.asarray(key, dtype=np.int32)
    pos = 0
    for local, (r, dlen) in enumerate(zip(rows, lens)):
        beg = int(indptr[r])
        for off in range(0, max(int(dlen), 1), C):
            n = min(C, int(dlen) - off)
            seg_ids[pos] = local
            if n > 0:
                chunk_lens[pos] = n
                cols[pos, :n] = key[beg + off:beg + off + n]
                if val is not None:
                    vals[pos, :n] = np.asarray(
                        val[beg + off:beg + off + n], dtype=np.float32)
                else:
                    vals[pos, :n] = 1.0
            pos += 1
    return SegmentBatch(rows=out_rows, lens=out_lens, seg_ids=seg_ids,
                        chunk_lens=chunk_lens, cols=cols, vals=vals)


# past this many padded entries a single fused epoch program OOMs on
# XLA temporaries (730M lesson) — drivers switch to group dispatch
GROUP_DISPATCH_ENTRIES = 100 << 20


def padded_entry_count(batches: Sequence) -> int:
    """Total padded (cols) entries across a list of staged batches."""
    return sum(int(np.prod(np.asarray(b.cols).shape)) for b in batches)


def choose_group_dispatch(opt, padded_entries: int) -> bool:
    """Resolve the shared ``epoch_dispatch`` option (auto|fused|group)."""
    dispatch = str(opt.get("epoch_dispatch", "auto") or "auto")
    if dispatch not in ("auto", "fused", "group"):
        raise ValueError(
            f"epoch_dispatch must be auto|fused|group, got {dispatch!r}")
    return dispatch == "group" or (
        dispatch == "auto" and padded_entries > GROUP_DISPATCH_ENTRIES)


def permute_table(T: np.ndarray, pos: np.ndarray, padded_rows: int
                  ) -> np.ndarray:
    """Place table rows at their range-layout positions (zero padding)."""
    out = np.zeros((int(padded_rows), T.shape[1]), T.dtype)
    out[pos] = T
    return out


def stack_batches(batches: Sequence) -> List:
    """Group same-shape batches and stack each field (leading axis n).

    Fused epoch steps lax.scan over each stacked group, so XLA
    compiles ONE body per distinct shape instead of one per batch —
    at 21.9M-row scale that is ~30 bodies instead of ~400.
    Preserves first-appearance order between groups (batch order
    within a shape is preserved by the stack).
    """
    groups: Dict[tuple, list] = {}
    order: List[tuple] = []
    for b in batches:
        key = (type(b).__name__,) + tuple(a.shape for a in b)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(b)
    out = []
    for key in order:
        bs = groups[key]
        out.append(type(bs[0])(*[
            np.stack([np.asarray(getattr(b, f)) for b in bs])
            for f in bs[0]._fields]))
    return out


class DeviceBatcher:
    """Feeds padded batches to jitted steps, optionally device-resident.

    The counterpart of ``BufferedDataMatrix.fetch_batch``
    (``buffered_data.py:85-118``), but instead of reusing one pinned
    host buffer we pipeline ``jax.device_put`` (async) one batch ahead
    of compute, or — when the padded epoch fits ``resident_mb`` — keep
    every batch in HBM across epochs.
    """

    def __init__(self, data, axis: str = "rowwise", batch_mb: int = 1024,
                 resident_mb: int = 4096, row_multiple: int = 1,
                 sharding=None, max_len: int = DEFAULT_MAX_L,
                 d: Optional[int] = None, matrix_free: bool = True):
        self.logger = log.get_logger("DeviceBatcher")
        self.data = data
        self.axis = axis
        group = data.get_group(axis)
        self.key = np.asarray(group["key"])
        self.val = np.asarray(group["val"]) if "val" in group else None
        # per-entry working-set: cols+vals (8B) plus, when the factor
        # dimension is known, the gathered fixed-side rows F and one
        # weighted copy (2 * 4d B) — keeps peak HBM within batch_mb
        # regardless of d (the reference's batch_mb only has to cover
        # 16B/entry because its C++ loop never materializes F)
        bytes_per_entry = 16 if d is None else 8 + 8 * int(d)
        entries = max(int(batch_mb) * 1024 * 1024 // bytes_per_entry, 4096)
        # per-row (B, d, d) solve state is lane-padded to 128 on TPU:
        # ~2 * 4 * d * 128 bytes per row live through the CG loop
        max_rows = None if d is None else max(
            int(batch_mb) * 1024 * 1024 // (8 * int(d) * 128), 1024)
        self.planner = BatchPlanner(np.asarray(group["indptr"]),
                                    entries_per_batch=entries,
                                    row_multiple=row_multiple,
                                    max_len=max_len, max_rows=max_rows,
                                    matrix_free=matrix_free)
        self.padded_entries = self.planner.padded_entries()
        # 8 bytes per padded entry (int32 col + f32 val) on device
        self.resident = (self.padded_entries * 8) <= \
            resident_mb * 1024 * 1024
        self.sharding = sharding
        self._device_cache: Optional[List] = None

    def _to_device(self, batch):
        import jax
        if self.sharding is not None:
            shardings = type(batch)(*[self.sharding(a) for a in batch])
            return jax.device_put(batch, shardings)
        return jax.device_put(batch)

    def device_batches(self) -> List:
        """The full epoch staged on device as batch pytrees.

        Used by the fused one-dispatch epoch steps; requires resident
        mode (everything fits the HBM budget).
        """
        if self._device_cache is None:
            self._device_cache = [
                self._to_device(b)
                for b in self.planner.iter_batches(self.key, self.val)]
            self.logger.debug(
                f"{self.axis}: {len(self._device_cache)} batches resident "
                f"on device, shapes={self.planner.shapes()}")
        return self._device_cache

    def device_batches_stacked(self) -> List:
        """Same-shape batches stacked (host-side) then staged once.

        The fused epochs lax.scan over each stacked group — one
        compiled body per shape regardless of how many batches share
        it.  Single-batch groups keep the leading axis of size 1.
        """
        if getattr(self, "_device_cache_stacked", None) is None:
            stacked = stack_batches(
                self.planner.iter_batches(self.key, self.val))
            self._device_cache_stacked = [self._to_device(b)
                                          for b in stacked]
            self.logger.debug(
                f"{self.axis}: {len(self._device_cache_stacked)} stacked "
                f"groups resident on device")
        return self._device_cache_stacked

    def __iter__(self):
        """Yield (rows, lens, cols, vals) device tuples, prefetching one ahead."""
        if self.resident:
            yield from self.device_batches()
            return
        it = self.planner.iter_batches(self.key, self.val)
        pending = None
        for batch in it:
            nxt = self._to_device(batch)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    @property
    def num_batches(self) -> int:
        return self.planner.num_batches


class COOBatcher:
    """Flat (user, item, value) chunks of fixed size for SGD-family algos.

    Positives are drawn from the rowwise CSR expanded to COO; each chunk
    is a fixed ``N`` so the sampled-update step compiles once.  The tail
    chunk wraps around (samples from the epoch head) to keep shape —
    epoch semantics of the reference's job-queue batching
    (``algo.cc:308-362``) where sample count per epoch is ~nnz.
    """

    def __init__(self, data, chunk_size: int = 1 << 20, shuffle: bool = True,
                 seed: int = 0):
        group = data.get_group("rowwise")
        indptr = np.asarray(group["indptr"], dtype=np.int64)
        self.users = np.repeat(
            np.arange(len(indptr) - 1, dtype=np.int32), np.diff(indptr))
        self.items = np.asarray(group["key"], dtype=np.int32)
        self.vals = (np.asarray(group["val"], dtype=np.float32)
                     if "val" in group else np.ones(len(self.items), np.float32))
        self.chunk_size = int(chunk_size)
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.nnz = len(self.items)

    def __iter__(self):
        order = (self.rng.permutation(self.nnz) if self.shuffle
                 else np.arange(self.nnz))
        N = self.chunk_size
        for start in range(0, self.nnz, N):
            idx = order[start:start + N]
            if len(idx) < N:  # wrap tail to keep fixed shape
                idx = np.concatenate([idx, order[:N - len(idx)]])
            yield (self.users[idx], self.items[idx], self.vals[idx])

    @property
    def num_batches(self) -> int:
        return math.ceil(self.nnz / self.chunk_size)
