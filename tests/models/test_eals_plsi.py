"""eALS and pLSI tests (reference tests/algo/test_{eals,plsi}.py analog)."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import EALS, PLSI
from buffalo_tpu.models.options import EALSOption, PLSIOption


@pytest.fixture(scope="module")
def ml_data(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("ep_data")
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


def test_eals_negative_weights(ml_data):
    m = EALS(EALSOption().get_default_option(), data=ml_data)
    m.initialize()
    C = m._get_negative_weights()
    assert C.shape == (ml_data.get_header()["num_items"],)
    assert np.all(C >= 0)
    np.testing.assert_allclose(C.sum(), m.opt.c0, rtol=1e-4)


def test_eals_accuracy_floor(ml_data):
    opt = EALSOption().get_default_option()
    opt.d = 16
    opt.num_iters = 10
    opt.validation = {"topk": 10}
    opt.evaluation_period = 10
    m = EALS(opt, data=ml_data)
    m.initialize()
    r = m.train()
    assert r["val_ndcg"] > 0.25
    assert r["val_map"] > 0.15


def test_eals_rmse_decreases(ml_data):
    opt = EALSOption().get_default_option()
    opt.d = 16
    opt.num_iters = 8
    opt.validation = {}
    m = EALS(opt, data=ml_data)
    m.initialize()
    losses = []
    import buffalo_tpu.models.eals as _e
    orig = m.logger.info
    m.train(training_callback=lambda i, met: losses.append(met))
    # rely on train_loss of the returned dict being the final RMSE
    # plus monotone-ish decrease validated by a second shorter run
    opt2 = EALSOption().get_default_option()
    opt2.d = 16
    opt2.num_iters = 1
    opt2.validation = {}
    m2 = EALS(opt2, data=ml_data)
    m2.initialize()
    r1 = m2.train()["train_loss"]
    opt2.num_iters = 8
    m3 = EALS(opt2, data=ml_data)
    m3.initialize()
    r8 = m3.train()["train_loss"]
    assert r8 < r1


def test_eals_range_layout_parity(ml_data):
    """Range-layout coordinate descent == COO formulation (exact same
    math, different data layout)."""
    def run(**kw):
        np.random.seed(11)
        opt = EALSOption().get_default_option()
        opt.d = 8
        opt.num_iters = 4
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = EALS(opt, data=ml_data)
        m.initialize()
        r = m.train()
        return m, r

    m1, r1 = run()
    m2, r2 = run(range_layout=False)
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-5)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=1e-4, atol=1e-6)


def test_plsi_range_layout_parity(ml_data):
    def run(**kw):
        np.random.seed(11)
        opt = PLSIOption().get_default_option()
        opt.d = 8
        opt.num_iters = 4
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = PLSI(opt, data=ml_data)
        m.initialize()
        r = m.train()
        return m, r

    m1, r1 = run()
    m2, r2 = run(range_layout=False)
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-5)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=1e-4, atol=1e-6)


def test_eals_serialization(ml_data, tmp_path):
    opt = EALSOption().get_default_option()
    opt.d = 8
    opt.num_iters = 2
    opt.validation = {}
    m = EALS(opt, data=ml_data)
    m.initialize()
    m.train()
    m.save(str(tmp_path / "eals.model"))
    loaded = EALS.new(str(tmp_path / "eals.model"))
    np.testing.assert_array_equal(loaded.Q, m.Q)


def test_plsi_stochastic_matrices(ml_data):
    opt = PLSIOption().get_default_option()
    opt.d = 8
    opt.num_iters = 5
    opt.validation = {}
    m = PLSI(opt, data=ml_data)
    m.initialize()
    np.testing.assert_allclose(m.P.sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(m.Q.sum(axis=0), 1.0, rtol=1e-3)
    m.train()
    # EM preserves stochasticity
    np.testing.assert_allclose(m.P.sum(axis=1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(m.Q.sum(axis=0), 1.0, rtol=1e-2)


def test_plsi_loss_decreases(ml_data):
    opt = PLSIOption().get_default_option()
    opt.d = 8
    opt.num_iters = 10
    opt.validation = {}
    m = PLSI(opt, data=ml_data)
    m.initialize()
    losses = []

    class Grab:
        def __call__(self, i, metrics):
            losses.append(metrics["train_loss"])
    r = m.train()
    # negative log-likelihood decreases under EM
    opt1 = PLSIOption().get_default_option()
    opt1.d = 8
    opt1.num_iters = 1
    opt1.validation = {}
    m1 = PLSI(opt1, data=ml_data)
    m1.initialize()
    r1 = m1.train()["train_loss"]
    assert r["train_loss"] < r1


def test_plsi_accuracy_floor(ml_data):
    opt = PLSIOption().get_default_option()
    opt.d = 8
    opt.num_iters = 12
    opt.validation = {"topk": 10}
    opt.evaluation_period = 12
    m = PLSI(opt, data=ml_data)
    m.initialize()
    r = m.train()
    assert r["val_ndcg"] > 0.06


def test_plsi_inherit(ml_data, tmp_path):
    opt = PLSIOption().get_default_option()
    opt.d = 8
    opt.num_iters = 3
    opt.validation = {}
    m = PLSI(opt, data=ml_data)
    m.initialize()
    m.train()
    path = str(tmp_path / "plsi.model")
    m.save(path)

    opt2 = PLSIOption().get_default_option()
    opt2.d = 8
    opt2.validation = {}
    opt2.num_iters = 1
    opt2.inherit_opt = {"model_path": path, "inherit_user": True,
                        "inherit_item": True}
    m2 = PLSI(opt2, data=ml_data)
    m2.initialize()
    np.testing.assert_allclose(m2.P, m.P, rtol=1e-5)


def test_eals_group_dispatch_parity(ml_data):
    """epoch_dispatch='group' (the at-scale mode) == fused epoch."""
    def run(**kw):
        np.random.seed(11)
        opt = EALSOption().get_default_option()
        opt.d = 8
        opt.num_iters = 3
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = EALS(opt, data=ml_data)
        m.initialize()
        return m, m.train()

    m1, r1 = run()
    m2, r2 = run(epoch_dispatch="group")
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-5)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=1e-4, atol=1e-6)


def test_plsi_group_dispatch_parity(ml_data):
    def run(**kw):
        np.random.seed(11)
        opt = PLSIOption().get_default_option()
        opt.d = 8
        opt.num_iters = 3
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = PLSI(opt, data=ml_data)
        m.initialize()
        return m, m.train()

    m1, r1 = run()
    m2, r2 = run(epoch_dispatch="group")
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-5)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=1e-4, atol=1e-6)


def test_plsi_normalize_swap_guards_zero_sums():
    """alpha1=alpha2=0 with an empty row/column must not NaN (parity
    with _mstep's guard on the permuted-layout path)."""
    import jax.numpy as jnp
    from buffalo_tpu.ops.plsi_kernels import plsi_normalize_swap

    Pn = jnp.array([[0.2, 0.8], [0.0, 0.0]], jnp.float32)
    Qn = jnp.array([[0.5, 0.0], [0.5, 0.0]], jnp.float32)
    P, Q = plsi_normalize_swap(Pn, Qn, alpha1=0.0, alpha2=0.0)
    assert np.all(np.isfinite(np.asarray(P)))
    assert np.all(np.isfinite(np.asarray(Q)))
    np.testing.assert_allclose(np.asarray(P)[0], [0.2, 0.8], rtol=1e-6)
    assert np.all(np.asarray(P)[1] == 0)
    assert np.all(np.asarray(Q)[:, 1] == 0)


def test_plsi_mesh_training_parity(ml_data):
    """num_devices=8 sharded-range pLSI (shard_map EM over row-sharded
    tables) must match single-device training."""
    def run(**kw):
        np.random.seed(41)
        opt = PLSIOption().get_default_option()
        opt.d = 8
        opt.num_iters = 4
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = PLSI(opt, data=ml_data)
        m.initialize()
        r = m.train()
        return m, r

    m1, r1 = run()
    m2, r2 = run(num_devices=8)
    assert m2._mesh_range is None  # path ran and was cleaned up
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-4)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(m1.P, m2.P, rtol=1e-3, atol=1e-5)


def test_eals_mesh_training_parity(ml_data):
    """num_devices=8 sharded-range eALS (shard_map dimension sweeps
    over row-sharded tables) must match single-device training."""
    def run(**kw):
        np.random.seed(43)
        opt = EALSOption().get_default_option()
        opt.d = 8
        opt.num_iters = 4
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = EALS(opt, data=ml_data)
        m.initialize()
        r = m.train()
        return m, r

    m1, r1 = run()
    m2, r2 = run(num_devices=8)
    assert r1["train_loss"] == pytest.approx(r2["train_loss"], rel=1e-4)
    np.testing.assert_allclose(m1.Q, m2.Q, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(m1.P, m2.P, rtol=2e-3, atol=1e-3)
