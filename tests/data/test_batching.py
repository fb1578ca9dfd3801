"""Batch planner tests: shape bounds, full coverage, padding semantics."""
import numpy as np
import pytest

from buffalo_tpu.data.batching import BatchPlanner, COOBatcher


def _csr_from_degrees(degrees, num_items=64, seed=0):
    rng = np.random.default_rng(seed)
    indptr = np.zeros(len(degrees) + 1, dtype=np.int64)
    np.cumsum(degrees, out=indptr[1:])
    key = rng.integers(0, num_items, int(indptr[-1])).astype(np.int32)
    val = rng.random(int(indptr[-1])).astype(np.float32)
    return indptr, key, val


def test_planner_covers_all_rows_once():
    degrees = [3, 0, 17, 5, 100, 1, 8, 64, 2, 9]
    indptr, key, val = _csr_from_degrees(degrees)
    planner = BatchPlanner(indptr, entries_per_batch=256)
    seen = {}
    for batch in planner.iter_batches(key, val):
        for r, ln in zip(batch.rows, batch.lens):
            if ln > 0:
                seen[int(r)] = int(ln)
    expected = {i: d for i, d in enumerate(degrees) if d > 0}
    assert seen == expected


def test_padded_contents_match_csr():
    degrees = [4, 9, 2, 33]
    indptr, key, val = _csr_from_degrees(degrees)
    planner = BatchPlanner(indptr, entries_per_batch=512)
    for batch in planner.iter_batches(key, val):
        B, L = batch.shape
        for b in range(B):
            ln = int(batch.lens[b])
            if ln == 0:
                assert np.all(batch.vals[b] == 0)
                continue
            r = int(batch.rows[b])
            beg, end = indptr[r], indptr[r + 1]
            assert batch.cols[b, :ln].tolist() == key[beg:end].tolist()
            np.testing.assert_allclose(batch.vals[b, :ln], val[beg:end])
            assert np.all(batch.vals[b, ln:] == 0)


def test_bounded_shape_count():
    rng = np.random.default_rng(1)
    degrees = rng.integers(1, 5000, size=2000)
    indptr, key, val = _csr_from_degrees(degrees, num_items=1000)
    planner = BatchPlanner(indptr, entries_per_batch=1 << 16)
    # ~1.25-geometric buckets: ~log1.25(5000/8) ~ 29 shapes
    assert len(planner.shapes()) <= 32
    for (B, L) in planner.shapes():
        assert B * L <= max(1 << 16, L * 8)


def test_row_multiple():
    degrees = [3] * 5
    indptr, key, val = _csr_from_degrees(degrees)
    planner = BatchPlanner(indptr, entries_per_batch=64, row_multiple=8)
    for (B, L) in planner.shapes():
        assert B % 8 == 0


def test_coo_batcher_fixed_shape(tmp_path):
    class FakeData:
        def get_group(self, g):
            indptr, key, val = _csr_from_degrees([5, 3, 7], num_items=16)
            return {"indptr": indptr, "key": key, "val": val}

    coo = COOBatcher(FakeData(), chunk_size=4, shuffle=True, seed=3)
    chunks = list(coo)
    assert all(len(u) == 4 for u, i, v in chunks)
    assert len(chunks) == 4  # ceil(15 / 4)


def test_sharded_range_layout_coverage():
    """Every real row of both orientations lands exactly once in a
    range batch (at its shard-local position) or a segment batch, and
    remapped cols reconstruct the original entries."""
    from buffalo_tpu.data.batching import build_sharded_range_layout

    rng = np.random.default_rng(9)
    U, I, D = 57, 33, 4
    # build a random matrix incl. one long row to force a segment batch
    mat = (rng.random((U, I)) < 0.25).astype(np.float32)
    mat[3, :] = 1.0
    mat *= rng.integers(1, 6, size=(U, I))

    def csr(m):
        indptr = np.zeros(m.shape[0] + 1, dtype=np.int64)
        np.cumsum((m > 0).sum(axis=1), out=indptr[1:])
        key = np.nonzero(m)[1].astype(np.int32)
        val = m[m > 0].astype(np.float32)
        return indptr, key, val

    r_indptr, r_key, r_val = csr(mat)
    c_indptr, c_key, c_val = csr(mat.T)
    rp = BatchPlanner(r_indptr, entries_per_batch=256, max_len=16)
    cp = BatchPlanner(c_indptr, entries_per_batch=256, max_len=16)
    (row_g, col_g, row_seg, col_seg, u_pos, i_pos, S_u,
     S_i) = build_sharded_range_layout(rp, cp, r_key, r_val, c_key, c_val, D)

    # the permutation is injective into [0, D*S)
    assert len(np.unique(u_pos)) == U and u_pos.max() < D * S_u
    assert len(np.unique(i_pos)) == I and i_pos.max() < D * S_i

    inv_u = np.empty(D * S_u, dtype=np.int64)
    inv_u[u_pos] = np.arange(U)
    inv_i = np.empty(D * S_i, dtype=np.int64)
    inv_i[i_pos] = np.arange(I)

    got = np.zeros_like(mat)
    for g in row_g:
        Dg, n = g.lens.shape[:2]
        assert Dg == D
        for k in range(D):
            for j in range(n):
                start = int(g.row_start[k, j])
                for b in range(g.lens.shape[2]):
                    ln = int(g.lens[k, j, b])
                    if ln == 0:
                        continue
                    u = inv_u[k * S_u + start + b]
                    items = inv_i[g.cols[k, j, b, :ln]]
                    got[u, items] += g.vals[k, j, b, :ln]
    for sb in row_seg:
        for ci in range(sb.seg_ids.shape[0]):
            local = int(sb.seg_ids[ci])
            if local >= len(sb.rows) or sb.rows[local] >= D * S_u:
                continue
            n = int(sb.chunk_lens[ci])
            u = inv_u[sb.rows[local]]
            items = inv_i[sb.cols[ci, :n]]
            got[u, items] += sb.vals[ci, :n]
    np.testing.assert_allclose(got, mat)

    # all shards carry identical batch schedules (shapes + row_start)
    for g in row_g + col_g:
        for k in range(1, D):
            np.testing.assert_array_equal(g.row_start[k], g.row_start[0])


def test_non_multiple_of_8_max_len_routes_to_buckets():
    """max_len is rounded up to a multiple of 8 so the grid covers it:
    rows with degree just under a hand-tuned cap must stay padded
    bucket rows (regression: degree 97-100 at max_len=100 got L=104 >
    max_len and was misrouted to the segment/scatter path)."""
    from buffalo_tpu.data.batching import BatchPlanner

    degs = [4, 97, 98, 100, 150]
    indptr = np.zeros(len(degs) + 1, dtype=np.int64)
    np.cumsum(degs, out=indptr[1:])
    planner = BatchPlanner(indptr, max_len=100)
    assert planner.max_len == 104
    bucket_rows = {int(r) for b in planner.buckets for r in b.row_ids}
    seg_rows = {r for p in planner.segment_plans for r in p}
    assert {1, 2, 3} <= bucket_rows
    assert seg_rows == {4}


def test_choose_group_dispatch_validates():
    from buffalo_tpu.data.batching import choose_group_dispatch

    assert choose_group_dispatch({"epoch_dispatch": "group"}, 1)
    assert not choose_group_dispatch({"epoch_dispatch": "fused"}, 1 << 40)
    with pytest.raises(ValueError):
        choose_group_dispatch({"epoch_dispatch": "split"}, 1)


def test_planner_padded_entries_counts_segments():
    from buffalo_tpu.data.batching import BatchPlanner

    degs = [8, 8, 50]  # one long row -> segment chunks
    indptr = np.zeros(len(degs) + 1, dtype=np.int64)
    np.cumsum(degs, out=indptr[1:])
    planner = BatchPlanner(indptr, max_len=16)
    bucket_total = sum(b.B * b.L for b in planner.buckets)
    # 50 wide at chunk 16 -> ceil(50/16)=4 chunks of 16
    assert planner.padded_entries() == bucket_total + 4 * 16
