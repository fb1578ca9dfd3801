"""BPR-MF tests (reference tests/algo/test_bpr.py analog)."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import BPRMF
from buffalo_tpu.models.options import BPRMFOption


@pytest.fixture(scope="module")
def ml_data(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("bpr_data")
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
    opt = BPRMFOption().get_default_option()
    opt.d = 16
    opt.num_iters = kw.pop("num_iters", 30)
    opt.validation = {"topk": 10}
    opt.evaluation_period = opt.num_iters
    for k, v in kw.items():
        opt[k] = v
    m = BPRMF(opt, data=ml_data)
    m.initialize()
    return m, m.train()


def test_default_option():
    opt = BPRMFOption().get_default_option()
    assert BPRMFOption().is_valid_option(opt)
    assert opt.optimizer == "sgd"
    assert opt.use_bias


def test_factor_shapes(ml_data):
    m = BPRMF(BPRMFOption().get_default_option(), data=ml_data)
    m.initialize()
    header = ml_data.get_header()
    assert m.P.shape == (header["num_users"], 20)
    assert m.Q.shape == (header["num_items"], 20)
    assert m.Qb.shape == (header["num_items"],)


def test_accuracy_floor_adagrad(ml_data):
    _, r = _train(ml_data, optimizer="adagrad", lr=0.05, num_iters=40)
    assert r["val_ndcg"] > 0.25
    assert r["val_map"] > 0.15


def test_adam_trains(ml_data):
    _, r = _train(ml_data, optimizer="adam", lr=0.02, num_iters=20)
    assert r["train_loss"] < np.log(2.0)  # better than random pairs


def test_sgd_loss_decreases(ml_data):
    # small megabatches approximate the reference's per-sample updates
    m, r = _train(ml_data, optimizer="sgd", lr=0.1, num_iters=30,
                  batch_size=256)
    assert r["train_loss"] < np.log(2.0)


def test_sampling_power_table(ml_data):
    """Normalized int32 CDF: same distribution as the reference's raw
    cumulative counts, with full tail resolution at any scale."""
    m = BPRMF({**BPRMFOption().get_default_option(),
               "sampling_power": 1.0}, data=ml_data)
    m.initialize()
    assert m._cum_table is not None
    assert m._cum_table.dtype == np.int32
    assert m._cum_table[-1] == 0x7FFFFFFF
    counts = np.diff(np.asarray(ml_data.get_group("colwise")["indptr"]))
    expected = np.cumsum(counts) / counts.sum()
    np.testing.assert_allclose(m._cum_table / 0x7FFFFFFF, expected,
                               atol=1e-6)


def test_no_bias(ml_data):
    m, r = _train(ml_data, use_bias=False, optimizer="adagrad",
                  num_iters=5)
    assert np.all(m.Qb == 0)


def test_serialization(ml_data, tmp_path):
    m, _ = _train(ml_data, optimizer="adagrad", num_iters=3)
    path = str(tmp_path / "bpr.model")
    m.save(path)
    loaded = BPRMF.new(path)
    np.testing.assert_array_equal(loaded.P, m.P)
    np.testing.assert_array_equal(loaded.Qb, m.Qb)


def test_topk_includes_bias(ml_data):
    m, _ = _train(ml_data, optimizer="adagrad", num_iters=5)
    recs = m.topk_recommendation("u0", topk=5)
    assert len(recs) == 5


def test_split_dispatch_parity(ml_data):
    """epoch_dispatch="split" presamples negatives in a separate XLA
    program with the same fold_in(key, chunk) derivation — factors must
    match the fused epoch bit-for-bit (sgd and deferred paths)."""
    for optimizer in ("sgd", "adagrad"):
        def run(dispatch):
            np.random.seed(7)
            m, _ = _train(ml_data, optimizer=optimizer, num_iters=4,
                          epoch_dispatch=dispatch)
            return m

        fused = run("fused")
        split = run("split")
        np.testing.assert_array_equal(fused.P, split.P)
        np.testing.assert_array_equal(fused.Q, split.Q)
        np.testing.assert_array_equal(fused.Qb, split.Qb)


def test_random_positive(ml_data):
    """random_positive (bpr.cu:53): per-slot uniform positive draws on
    the fused path — trains to comparable accuracy, different factors."""
    def run(**kw):
        np.random.seed(13)
        opt = BPRMFOption().get_default_option()
        opt.d = 16
        opt.num_iters = 20
        opt.optimizer = "adagrad"
        opt.validation = {"topk": 10}
        opt.evaluation_period = 20
        for k, v in kw.items():
            opt[k] = v
        m = BPRMF(opt, data=ml_data)
        m.initialize()
        r = m.train()
        return m, r

    m_csr, r_csr = run()
    m_rnd, r_rnd = run(random_positive=True)
    assert r_rnd["val_ndcg"] > 0.2
    # the positive schedule really changed
    assert np.abs(m_csr.P - m_rnd.P).max() > 1e-4


def test_dp_mesh_training_parity(ml_data):
    """num_devices=8 dp (shard_map batch-sharded chunks, psum'd dense
    deltas) must match single-device training: negative sampling is
    bit-identical by construction (global candidate draw + local
    slice), so factors agree to scatter-reordering tolerance."""
    for optimizer in ("sgd", "adagrad"):
        np.random.seed(21)
        a, ra = _train(ml_data, optimizer=optimizer, num_iters=4)
        np.random.seed(21)
        b, rb = _train(ml_data, optimizer=optimizer, num_iters=4,
                       num_devices=8)
        np.testing.assert_allclose(a.P, b.P, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a.Q, b.Q, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a.Qb, b.Qb, rtol=1e-3, atol=1e-4)
        assert abs(ra["train_loss"] - rb["train_loss"]) < 1e-3


def test_stored_width_parity(ml_data):
    """stored_width pads the on-device tables with zero columns (the
    sub-64-lane XLA slow-path fix, ops/sgd_kernels.resolve_stored_width).
    Padded dims are inert: first-d factor columns match the unpadded run
    to float tolerance and the host-side factors keep the true d."""
    def run(width):
        np.random.seed(3)
        m, _ = _train(ml_data, optimizer="adagrad", num_iters=4,
                      stored_width=width)
        return m

    base = run(-1)
    padded = run(64)
    assert padded.P.shape == base.P.shape  # host factors at true d
    # a 64-wide dot sums the same 16 products in a different tree, so
    # parity is float-tolerance, not bit-exact (adagrad amplifies ulps)
    np.testing.assert_allclose(padded.P, base.P, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(padded.Q, base.Q, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(padded.Qb, base.Qb, rtol=2e-5, atol=2e-6)
