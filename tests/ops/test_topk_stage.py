"""Regression for the staged-table cache: in-place mutations anywhere
in the table must invalidate the cached device copy."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
from buffalo_tpu.ops.topk import batch_topn


def test_stage_cache_detects_any_inplace_write():
    rng = np.random.default_rng(0)
    Q = rng.random((500, 8)).astype(np.float32)
    p = rng.random((4, 8)).astype(np.float32)
    batch_topn(p, Q, 3)
    # a write NOT touching column 0 / strided probe rows
    Q[1, 1] = 100.0
    keys, scores = batch_topn(p, Q, 3)
    expect = (p @ Q.T).argmax(axis=1)
    assert (keys[:, 0] == expect).all()
    np.testing.assert_allclose(scores[:, 0], (p @ Q.T).max(axis=1),
                               rtol=1e-5)


def test_stage_cache_pool_and_bias_not_cached():
    from buffalo_tpu.ops import topk as topk_mod
    rng = np.random.default_rng(1)
    Q = rng.random((100, 4)).astype(np.float32)
    p = rng.random((2, 4)).astype(np.float32)
    before = 0 if topk_mod._stage_cache is None else len(topk_mod._stage_cache)
    batch_topn(p, Q, 2, pool=np.arange(10, dtype=np.int32))
    batch_topn(p, Q, 2, Qb=np.ones(100, np.float32))
    after = len(topk_mod._stage_cache)
    assert after - before <= 1  # only the stable full table is cached


def test_fingerprint_native_matches_numpy_fallback(monkeypatch):
    """The OpenMP ``fileio_checksum`` and the numpy fallback must
    produce identical chunk sums (incl. non-multiple-of-8 tails and
    sub-64-word buffers), and a single-element in-place write must
    change the fingerprint through either path."""
    from buffalo_tpu.ops import topk as topk_mod
    import buffalo_tpu.data.native as native_mod

    rng = np.random.default_rng(3)
    for shape in [(5000, 100), (1000, 7), (63,), (129, 3), (2,)]:
        a = rng.standard_normal(int(np.prod(shape))).astype(
            np.float32).reshape(shape)
        fp = topk_mod._fingerprint(a)
        with monkeypatch.context() as m:
            m.setattr(native_mod, "checksum_native",
                      lambda arr, n_chunks=64: None)
            fp_fallback = topk_mod._fingerprint(a)
        assert fp == fp_fallback, shape
        flat = a.reshape(-1)
        mid = int(np.prod(shape)) // 2
        # nextafter guarantees a bit-level change (+=1e-7 can round
        # back to the same float32 when |x| >= 2)
        flat[mid] = np.nextafter(flat[mid], np.float32(np.inf),
                                 dtype=np.float32)
        assert topk_mod._fingerprint(a) != fp, shape


def test_chunk_count_grid_and_multi_chunk_correctness():
    """The chunk-count bucket grid must be exact through 8, never
    round down, and waste <= ~25% padding (the former pow2 bucketing
    wasted 64% on the 5-chunk 10k-query headline shape); results must
    stay exact across bucket boundaries."""
    from buffalo_tpu.ops.topk import _bucket_chunk_count

    got = [_bucket_chunk_count(n) for n in range(1, 70)]
    assert got[:8] == list(range(1, 9))
    assert all(g >= n for n, g in zip(range(1, 70), got))
    assert all((g - n) / g <= 0.34 for n, g in zip(range(1, 70), got))

    rng = np.random.default_rng(4)
    Q = rng.standard_normal((700, 16)).astype(np.float32)
    for B in [1, 300, 2048, 2049, 5 * 300 + 1]:   # 1..7-chunk shapes
        p = rng.standard_normal((B, 16)).astype(np.float32)
        keys, _ = batch_topn(p, Q, 5, chunk=300)
        exp = np.argsort(-(p @ Q.T), axis=1)[:, 0]
        assert (keys[:, 0] == exp).all(), B


def test_batch_topn_approx_mode_close_to_exact():
    """approx=True routes to lax.approx_max_k; on small catalogs the
    partial reduction degenerates to exact, so results must match."""
    rng = np.random.default_rng(2)
    Q = rng.random((400, 8)).astype(np.float32)
    p = rng.random((6, 8)).astype(np.float32)
    ek, es = batch_topn(p, Q, 5)
    ak, as_ = batch_topn(p, Q, 5, approx=True)
    # recall of the approximate set vs exact (1.0 at this size)
    rec = np.mean([len(set(a) & set(e)) / 5.0 for a, e in zip(ak, ek)])
    assert rec == 1.0
    np.testing.assert_allclose(np.sort(as_, axis=1),
                               np.sort(es, axis=1), rtol=1e-6)


def test_batch_topn_bf16_query_upload():
    """query_dtype="bfloat16" (the facade's approx mode) quantizes only
    the query operand: top-1 agreement with f32 must stay high and
    scores within bf16 tolerance."""
    rng = np.random.default_rng(5)
    Q = rng.standard_normal((800, 32)).astype(np.float32)
    p = rng.standard_normal((200, 32)).astype(np.float32)
    ek, es = batch_topn(p, Q, 10)
    bk, bs = batch_topn(p, Q, 10, query_dtype="bfloat16")
    rec = np.mean([len(set(a) & set(e)) / 10.0 for a, e in zip(bk, ek)])
    assert rec > 0.95, rec
    # scores of the agreed top-1 within bf16 relative tolerance
    agree = bk[:, 0] == ek[:, 0]
    assert agree.mean() > 0.9
    np.testing.assert_allclose(bs[agree, 0], es[agree, 0], rtol=2e-2)


def test_tiled_catalog_topn_matches_flat(monkeypatch):
    """The OOM-gated catalog-tiled path (multi-million-item tables)
    must reproduce the flat scan exactly (ties aside: scores are
    distinct here)."""
    import buffalo_tpu.ops.topk as T

    rng = np.random.default_rng(0)
    Q = rng.standard_normal((5000, 16)).astype(np.float32)
    p = rng.standard_normal((300, 16)).astype(np.float32)
    flat_k, flat_s = T.batch_topn(p, Q, topk=10)
    # force the gate: pretend the flat score matrix would OOM
    monkeypatch.setattr(T, "_FLAT_SCORES_BYTES", 2048 * 1024 * 4)
    tiled_k, tiled_s = T.batch_topn(p, Q, topk=10)
    np.testing.assert_array_equal(flat_k, tiled_k)
    np.testing.assert_allclose(flat_s, tiled_s, rtol=1e-6, atol=1e-6)

    # with a bias vector too
    Qb = rng.standard_normal(5000).astype(np.float32)
    tiled_kb, tiled_sb = T.batch_topn(p, Q, topk=10, Qb=Qb)
    monkeypatch.undo()
    flat_kb, flat_sb = T.batch_topn(p, Q, topk=10, Qb=Qb)
    np.testing.assert_array_equal(flat_kb, tiled_kb)
    np.testing.assert_allclose(flat_sb, tiled_sb, rtol=1e-6, atol=1e-6)
