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


def test_topk_wide_matches_lax_topk_including_ties(monkeypatch):
    import jax
    import jax.numpy as jnp
    from buffalo_tpu.ops import topk as topk_mod
    from buffalo_tpu.ops.topk import _topk_wide

    # the two-stage path is TPU-gated (CPU TopK is faster single-stage);
    # force it here so CPU CI still covers its correctness
    monkeypatch.setattr(topk_mod.jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(2)
    # wide row count with deliberate duplicate values to exercise ties
    scores = rng.integers(0, 50, size=(7, 40000)).astype(np.float32)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), 10)
    v, i = _topk_wide(jnp.asarray(scores), 10, seg=4096)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(v))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(i))
    # non-multiple-of-seg width and k near seg
    scores = rng.random((3, 10001)).astype(np.float32)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), 64)
    v, i = _topk_wide(jnp.asarray(scores), 64, seg=2048)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(i))


def test_topk_wide_inf_rows_stay_in_range(monkeypatch):
    """Rows with fewer than k finite scores (exclude-seen masking) must
    return in-range indices exactly like single-stage lax.top_k — pad
    slots may never leak into the result."""
    import jax
    import jax.numpy as jnp
    from buffalo_tpu.ops import topk as topk_mod
    from buffalo_tpu.ops.topk import _topk_wide

    monkeypatch.setattr(topk_mod.jax, "default_backend", lambda: "tpu")
    N = 5000  # not a multiple of seg -> pad slots exist
    scores = np.full((4, N), -np.inf, dtype=np.float32)
    scores[1, 17] = 1.0           # one finite entry
    scores[2, :3] = [3.0, 2.0, 1.0]
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), 10)
    v, i = _topk_wide(jnp.asarray(scores), 10, seg=1024)
    assert int(np.max(i)) < N
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(i))
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(v))
