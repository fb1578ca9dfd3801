"""Native C++ fileio kernels vs numpy reference implementations."""
import numpy as np
import pytest

from buffalo_tpu.data.native import (build_csr_native, get_lib,
                                     parse_triples_native)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def test_parse_matches_numpy(tmp_path):
    path = tmp_path / "t.txt"
    path.write_text("1 2 3.5\n4 5\n% comment\n\n6 7 -1.25e2\n10 11 0.125\n")
    rows, cols, vals = parse_triples_native(str(path), 0)
    assert rows.tolist() == [1, 4, 6, 10]
    assert cols.tolist() == [2, 5, 7, 11]
    np.testing.assert_allclose(vals, [3.5, 1.0, -125.0, 0.125])


def test_parse_with_offset(tmp_path):
    path = tmp_path / "t.txt"
    header = "%%MatrixMarket matrix coordinate real general\n3 3 2\n"
    path.write_text(header + "1 1 1.0\n2 2 2.0\n")
    rows, cols, vals = parse_triples_native(str(path), len(header))
    assert rows.tolist() == [1, 2]


def test_parse_empty(tmp_path):
    path = tmp_path / "e.txt"
    path.write_text("")
    rows, cols, vals = parse_triples_native(str(path), 0)
    assert len(rows) == 0


def test_csr_matches_lexsort():
    rng = np.random.default_rng(5)
    nnz, R, C = 50000, 400, 300
    rows = rng.integers(0, R, nnz)
    cols = rng.integers(0, C, nnz)
    vals = rng.random(nnz).astype(np.float32)
    indptr, key, val = build_csr_native(rows, cols, vals, R)
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(key, cols[order].astype(np.int32))
    np.testing.assert_allclose(val, vals[order])
    expected = np.zeros(R + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=R), out=expected[1:])
    np.testing.assert_array_equal(indptr, expected)


def test_csr_unsorted_option_preserves_order():
    rows = np.array([1, 0, 1, 0])
    cols = np.array([9, 5, 2, 7])
    vals = np.array([1, 2, 3, 4], dtype=np.float32)
    indptr, key, val = build_csr_native(rows, cols, vals, 2,
                                        sort_cols=False)
    # input order within each row preserved (stream semantics)
    assert key.tolist() == [5, 7, 9, 2]
    assert val.tolist() == [2.0, 4.0, 1.0, 3.0]


def test_sppmi_partitioned_matches_oracle():
    """Bounded-memory SPPMI (native + numpy fallback, forced into many
    head partitions) must match a brute-force per-pair oracle."""
    from collections import Counter

    from buffalo_tpu.data import native
    from buffalo_tpu.data.fileio import build_sppmi

    def oracle(indptr, keys, num_items, window, k):
        cnt = Counter()
        occ = np.zeros(num_items)
        d = 0
        for r in range(len(indptr) - 1):
            row = keys[indptr[r]:indptr[r + 1]]
            for i in range(len(row)):
                for j in range(i + 1, min(len(row), i + 1 + window)):
                    a, b = int(row[i]), int(row[j])
                    cnt[(a, b)] += 1
                    cnt[(b, a)] += 1
                    occ[a] += 1
                    occ[b] += 1
                    d += 2
        return {(a, b): np.log(c * d / (occ[a] * occ[b])) - np.log(k)
                for (a, b), c in cnt.items()
                if np.log(c * d / (occ[a] * occ[b])) - np.log(k) > 0}

    rng = np.random.default_rng(0)
    num_items = 37
    degs = rng.integers(2, 30, 60)
    indptr = np.zeros(61, np.int64)
    np.cumsum(degs, out=indptr[1:])
    keys = rng.integers(0, num_items, int(indptr[-1])).astype(np.int32)
    want = oracle(indptr, keys, num_items, 4, 2)

    for force_fallback in (False, True):
        saved = (native._lib, native._build_failed)
        if force_fallback:
            native._lib, native._build_failed = None, True
        try:
            res = build_sppmi(indptr, keys, num_items, window=4, k=2,
                              max_pairs_in_memory=64)
        finally:
            native._lib, native._build_failed = saved
        oi, okey, oval = res
        got = {(r, int(okey[p])): float(oval[p])
               for r in range(num_items)
               for p in range(oi[r], oi[r + 1])}
        assert set(got) == set(want)
        for pair, v in got.items():
            assert abs(v - want[pair]) < 1e-5


def test_parse_page_multiple_no_trailing_newline(tmp_path):
    """A file whose size is an exact page multiple and whose last byte
    is a digit: the bounded parser must stop at the mapping end
    (regression: strtoll scanned past the last page -> potential
    SIGSEGV) and still parse the final triple."""
    if get_lib() is None:
        pytest.skip("no native lib")
    page = 4096
    tail = "7 9 2.5"  # no trailing newline; last byte is a digit
    body = "1 2 1.0\n3 4\n"
    pad = page - len(body) - len(tail)
    assert pad > 3
    content = "%" + "x" * (pad - 2) + "\n" + body + tail
    path = tmp_path / "page.txt"
    path.write_text(content)
    assert path.stat().st_size == page
    rows, cols, vals = parse_triples_native(str(path), 0)
    np.testing.assert_array_equal(rows, [1, 3, 7])
    np.testing.assert_array_equal(cols, [2, 4, 9])
    np.testing.assert_allclose(vals, [1.0, 1.0, 2.5])


def test_build_csr_rejects_out_of_range_rows():
    """Out-of-range rows are corrupt input (wrong header): both the
    native kernel wrapper and the numpy fallback must fail loudly
    instead of silently dropping triples."""
    from buffalo_tpu.data.fileio import build_csr

    rows = np.array([0, 1, 5], dtype=np.int64)   # 5 >= num_rows=3
    cols = np.array([0, 1, 2], dtype=np.int64)
    vals = np.ones(3, dtype=np.float32)
    with pytest.raises(ValueError, match="outside"):
        build_csr(rows, cols, vals, num_rows=3)


def test_gather_remapped_native_parity():
    """The one-pass C++ padded gather must be bit-identical to the
    numpy fallback for every dtype combination the staging paths use:
    int32/int64 keys, explicit/implicit vals, with/without id remap,
    float32/bfloat16 output (bf16 = round-to-nearest-even cast)."""
    import buffalo_tpu.data.native as native
    from buffalo_tpu.data import batching

    if get_lib() is None:
        pytest.skip("no native lib")
    import ml_dtypes
    bf16 = np.dtype(ml_dtypes.bfloat16)

    rng = np.random.default_rng(7)
    U, I = 500, 90
    deg = rng.integers(0, 40, U)
    indptr = np.zeros(U + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])
    nnz = int(indptr[-1])
    key32 = rng.integers(0, I, nnz).astype(np.int32)
    val = rng.random(nnz, dtype=np.float32)
    newpos = rng.permutation(I).astype(np.int64)
    rows = rng.choice(U, 64, replace=False).astype(np.int64)

    def numpy_ref(*args):
        saved = native.gather_remapped_native
        native.gather_remapped_native = lambda *a, **k: None
        try:
            return batching._gather_remapped(*args)
        finally:
            native.gather_remapped_native = saved

    for key in (key32, key32.astype(np.int64)):
        for vv in (val, None):
            for npos in (newpos, None):
                for vd in (np.float32, bf16):
                    args = (indptr, key, vv, rows, 72, 48, npos, vd)
                    got = batching._gather_remapped(*args)
                    want = numpy_ref(*args)
                    for g, w, name in zip(got, want,
                                          ("lens", "cols", "vals")):
                        assert g.dtype == w.dtype, name
                        np.testing.assert_array_equal(
                            np.asarray(g, np.float32),
                            np.asarray(w, np.float32), err_msg=name)


def test_gather_remapped_native_row_longer_than_L():
    """Rows longer than L are truncated to their first L entries with
    the TRUE length reported (the segment path owns long rows; the
    numpy fallback has the same contract)."""
    if get_lib() is None:
        pytest.skip("no native lib")
    from buffalo_tpu.data import batching

    indptr = np.array([0, 10], dtype=np.int64)
    key = np.arange(10, dtype=np.int32)
    val = np.arange(10, dtype=np.float32)
    rows = np.array([0], dtype=np.int64)
    lens, cols, vals = batching._gather_remapped(
        indptr, key, val, rows, 8, 4, None)
    assert lens[0] == 10
    np.testing.assert_array_equal(cols[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(vals[0], [0.0, 1.0, 2.0, 3.0])


def test_sharded_direct_fill_matches_stacked_fallback():
    """build_sharded_range_layout's native direct-fill path (gather
    straight into the stacked group arrays) must produce a pytree
    bit-identical to the per-batch-then-np.stack fallback."""
    if get_lib() is None:
        pytest.skip("no native lib")
    import buffalo_tpu.data.native as native
    from buffalo_tpu.data.batching import (BatchPlanner,
                                           build_sharded_range_layout)

    rng = np.random.default_rng(5)
    U, I, NNZ = 2000, 500, 40_000
    deg = np.maximum(0, rng.poisson(NNZ // U, U)).astype(np.int64)
    indptr_u = np.zeros(U + 1, np.int64)
    np.cumsum(deg, out=indptr_u[1:])
    nnz = int(indptr_u[-1])
    key_u = rng.integers(0, I, nnz).astype(np.int32)
    val_u = rng.random(nnz, dtype=np.float32)
    order = np.argsort(key_u, kind="stable")
    key_i = np.repeat(np.arange(U, dtype=np.int32), deg)[order]
    val_i = val_u[order]
    cnt = np.bincount(key_u, minlength=I)
    indptr_i = np.zeros(I + 1, np.int64)
    np.cumsum(cnt, out=indptr_i[1:])
    rp = BatchPlanner(indptr_u, batch_mb=2)
    cp = BatchPlanner(indptr_i, batch_mb=2)

    a = build_sharded_range_layout(rp, cp, key_u, val_u, key_i, val_i, 4)
    saved = native.get_lib
    native.get_lib = lambda: None
    try:
        b = build_sharded_range_layout(rp, cp, key_u, val_u,
                                       key_i, val_i, 4)
    finally:
        native.get_lib = saved

    def cmp(x, y):
        if isinstance(x, (list, tuple)) and not isinstance(x, np.ndarray):
            assert len(x) == len(y)
            for xi, yi in zip(x, y):
                cmp(xi, yi)
        else:
            x, y = np.asarray(x), np.asarray(y)
            assert x.dtype == y.dtype and x.shape == y.shape
            np.testing.assert_array_equal(x, y)

    cmp(a, b)


def _numpy_pairs(words, sents, h, window):
    """The offset-major numpy path from models/w2v.py:_generate_pairs."""
    inputs, targets = [], []
    for off in range(1, window + 1):
        same = sents[:-off] == sents[off:]
        m = same & (off <= h[:-off])
        targets.append(words[:-off][m])
        inputs.append(words[off:][m])
        m2 = same & (off <= h[off:])
        targets.append(words[off:][m2])
        inputs.append(words[:-off][m2])
    return np.concatenate(inputs), np.concatenate(targets)


@pytest.mark.parametrize("window", [1, 3, 5, 8])
def test_w2v_pairs_native_multiset_parity(window):
    from buffalo_tpu.data.native import w2v_pairs_native

    rng = np.random.default_rng(7 + window)
    n = 5000
    words = rng.integers(0, 300, size=n).astype(np.int32)
    # ragged sentences incl. length-1 and empty-boundary cases
    lens = rng.integers(1, 20, size=600)
    sents = np.repeat(np.arange(len(lens)), lens)[:n]
    n = len(sents)
    words = words[:n]
    h = (window - rng.integers(0, window, size=n)).astype(np.int64)

    got = w2v_pairs_native(words, sents, h, window)
    assert got is not None
    gi, gt = got
    ei, et = _numpy_pairs(words, sents, h, window)
    assert len(gi) == len(ei)
    # same multiset of directed pairs, order-independent
    key_g = np.sort(gi.astype(np.int64) * 300 + gt)
    key_e = np.sort(ei.astype(np.int64) * 300 + et)
    np.testing.assert_array_equal(key_g, key_e)


def test_w2v_pairs_native_empty_and_tiny():
    from buffalo_tpu.data.native import w2v_pairs_native

    gi, gt = w2v_pairs_native(np.zeros(0, np.int32), np.zeros(0, np.int64),
                              np.zeros(0, np.int32), 5)
    assert len(gi) == 0 and len(gt) == 0
    # single token: no pairs
    gi, gt = w2v_pairs_native(np.array([3], np.int32),
                              np.array([0], np.int64),
                              np.array([5], np.int32), 5)
    assert len(gi) == 0
