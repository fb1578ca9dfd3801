"""WARP tests (reference tests/algo/test_warp.py analog)."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import WARP
from buffalo_tpu.models.options import WARPOption


@pytest.fixture(scope="module")
def ml_data(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("warp_data")
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = ml100k_like["path"]
    opt.input.uid = ml100k_like["uid"]
    opt.input.iid = ml100k_like["iid"]
    opt.data.path = str(root / "ml.bfo")
    opt.data.tmp_dir = str(root / "tmp")
    opt.data.validation = {"name": "sample", "p": 0.1, "max_samples": 300}
    data = load(opt)
    data.create()
    return data


def _train(ml_data, **kw):
    opt = WARPOption().get_default_option()
    opt.d = 16
    opt.num_iters = kw.pop("num_iters", 25)
    opt.validation = {"topk": 10}
    opt.evaluation_period = opt.num_iters
    for k, v in kw.items():
        opt[k] = v
    m = WARP(opt, data=ml_data)
    m.initialize()
    return m, m.train()


def test_default_option():
    opt = WARPOption().get_default_option()
    assert WARPOption().is_valid_option(opt)
    assert opt.score_func == "dot"
    assert opt.max_trials == 500


def test_accuracy_floor_dot(ml_data):
    _, r = _train(ml_data, num_iters=30)
    assert r["val_ndcg"] > 0.25
    assert r["val_map"] > 0.15


def test_probe_all_matches_floor(ml_data):
    """probe_mode="all" (reference-exact trial ranks) meets the same
    accuracy floor as the lazy default — the two differ only through
    seen candidates (~3% bloom rate) in trial counts and the 4-probe
    violator cap."""
    _, r = _train(ml_data, num_iters=30, probe_mode="all")
    assert r["val_ndcg"] > 0.25
    assert r["val_map"] > 0.15


def test_lazy_probe_bitwise_parity_when_nothing_seen():
    """With an all-zeros bloom filter (no candidate is ever seen) the
    lazy path's selection and trial ranks are BIT-IDENTICAL to the
    all-candidates probe — the semantic deltas exist only through
    seen candidates."""
    import jax
    import jax.numpy as jnp

    from buffalo_tpu.ops import warp_kernels as W

    rng = np.random.default_rng(0)
    N, K, d, U, I = 64, 8, 8, 50, 40
    P = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
    Q = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))
    users = jnp.asarray(rng.integers(0, U, (2, N)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, I, (2, N)).astype(np.int32))
    indptr = jnp.asarray(np.zeros(U + 1, np.int64))
    bloom = jnp.zeros(1 << 11, jnp.uint32)   # log2_bits=16 -> 2^11 words

    def run(probe):
        st = {"mP": jnp.zeros_like(P), "vP": jnp.zeros_like(P),
              "mQ": jnp.zeros_like(Q), "vQ": jnp.zeros_like(Q)}
        out = W.warp_epoch(
            jnp.array(P), jnp.array(Q), st, users, pos, indptr, bloom,
            jax.random.PRNGKey(3), jnp.int32(0), None,
            precomputed_probe=False, probe=probe, optimizer="adagrad",
            num_items=I, num_candidates=K, score_func="dot",
            threshold=1.0, reg_u=0.0, reg_i=0.0, reg_j=0.0,
            update_i=True, update_j=True,
            per_coordinate_normalize=False, lr=0.05, beta1=0.9,
            beta2=0.999, num_valid=2 * N, bloom_log2=16)
        return np.asarray(out[0]), np.asarray(out[1])

    P_lazy, Q_lazy = run("lazy")
    P_all, Q_all = run("all")
    np.testing.assert_array_equal(P_lazy, P_all)
    np.testing.assert_array_equal(Q_lazy, Q_all)


def test_l2_cml_variant(ml_data):
    m, r = _train(ml_data, score_func="l2", num_iters=25)
    assert r["val_ndcg"] > 0.06
    # CML factors live in the unit ball
    assert np.max(np.linalg.norm(m.P, axis=1)) <= 1.0 + 1e-4
    assert np.max(np.linalg.norm(m.Q, axis=1)) <= 1.0 + 1e-4


def test_violation_loss_decreases(ml_data):
    losses = []
    opt = WARPOption().get_default_option()
    opt.d = 16
    opt.num_iters = 20
    opt.validation = {}
    m = WARP(opt, data=ml_data)
    m.initialize()
    m.train(training_callback=None)
    # loss is the violation rate: must be below the random-start level
    users, positives, negatives = m._sub_samples
    from buffalo_tpu.ops.warp_kernels import warp_loss
    final = float(warp_loss(m.P, m.Q, users, positives, negatives,
                            score_func="dot", threshold=1.0))
    assert final < 1.0


def test_unit_ball_after_train(ml_data):
    m, _ = _train(ml_data, num_iters=5)
    assert np.max(np.linalg.norm(m.P, axis=1)) <= 1.0 + 1e-4


def test_serialization(ml_data, tmp_path):
    m, _ = _train(ml_data, num_iters=3)
    path = str(tmp_path / "warp.model")
    m.save(path)
    loaded = WARP.new(path)
    np.testing.assert_array_equal(loaded.Q, m.Q)


def test_l2_topk_path(ml_data):
    m, _ = _train(ml_data, score_func="l2", num_iters=5)
    recs = m.topk_recommendation("u1", topk=5)
    assert len(recs) == 5
    pool = ["i1", "i2", "i3", "i4", "i5", "i6"]
    recs2 = m.topk_recommendation("u1", topk=3, pool=pool)
    assert all(r in pool for r in recs2)


def test_l2_most_similar_ranks_by_distance(ml_data):
    """With score_func=l2, most_similar must rank by squared L2
    distance (reference warp.py:109-137), not cosine — and get_scores
    must return negative squared distances (warp.py:139-143)."""
    m, _ = _train(ml_data, score_func="l2", num_iters=5)
    m.build_itemid_map()
    key = m._idmanager.itemids[0]
    got = m.most_similar(key, topk=5)
    assert len(got) == 5
    qi = m.get_index(key, group="item")
    dist = ((m.Q - m.Q[qi]) ** 2).sum(axis=1)
    order = np.argsort(dist, kind="stable")
    expect = [i for i in order if i != qi][:5]
    got_idx = [m.get_index(k, group="item") for k, _ in got]
    assert set(got_idx) == set(int(i) for i in expect)
    # returned scores are the positive distances, ascending
    scores = [s for _, s in got]
    assert all(s >= 0 for s in scores)
    assert scores == sorted(scores)

    pairs = [(0, int(expect[0])), (1, int(expect[1]))]
    gs = m.get_scores(pairs)
    for (r, c), v in gs.items():
        np.testing.assert_allclose(
            v, -((m.P[r] - m.Q[c]) ** 2).sum(), rtol=1e-5)


def test_split_dispatch_parity(ml_data):
    """epoch_dispatch="split" probes the bloom filter in a separate
    program (packed seen bits) while the update program redraws the
    same candidates — factors must match the fused epoch exactly.
    split ships all-K probe bits, so both sides pin probe_mode="all"
    (the lazy default probes violators only)."""
    def run(dispatch):
        np.random.seed(11)
        m, _ = _train(ml_data, num_iters=4, epoch_dispatch=dispatch,
                      probe_mode="all")
        return m

    fused = run("fused")
    split = run("split")
    np.testing.assert_array_equal(fused.P, split.P)
    np.testing.assert_array_equal(fused.Q, split.Q)


def test_dp_mesh_training_parity(ml_data):
    """num_devices=8 dp (shard_map batch-sharded chunks, one psum at
    the deferred barrier) must match single-device training: the
    candidate draw is bit-identical by construction (global draw +
    local row slice), so factors agree to fp-reordering tolerance."""
    for kw in (dict(), dict(score_func="l2")):
        np.random.seed(23)
        a, ra = _train(ml_data, num_iters=4, **kw)
        np.random.seed(23)
        b, rb = _train(ml_data, num_iters=4, num_devices=8, **kw)
        np.testing.assert_allclose(a.P, b.P, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a.Q, b.Q, rtol=1e-3, atol=1e-4)
        assert abs(ra["train_loss"] - rb["train_loss"]) < 1e-3


def test_stored_width_parity(ml_data):
    """stored_width zero-padding is inert through the WARP update incl.
    the unit-ball projection (a zero column never changes a row norm);
    host factors keep the true d (cf. test_bpr.test_stored_width_parity)."""
    def run(width):
        np.random.seed(3)
        m, _ = _train(ml_data, num_iters=4, stored_width=width)
        return m

    base = run(-1)
    padded = run(64)
    assert padded.P.shape == base.P.shape
    np.testing.assert_allclose(padded.P, base.P, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(padded.Q, base.Q, rtol=2e-5, atol=2e-6)
