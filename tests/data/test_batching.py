"""Batch planner tests: shape bounds, full coverage, padding semantics."""
import numpy as np

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
