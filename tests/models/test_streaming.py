"""Streaming (non-resident) fallbacks: forcing resident_mb=0 must give
the same training results as the device-resident fused epochs — the
reference's bounded-memory ``batch_mb`` contract
(``buffered_data.py:85-118``)."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, StreamOptions, load
from buffalo_tpu.models import ALS, BPRMF, PLSI
from buffalo_tpu.models.options import (ALSOption, BPRMFOption,
                                        PLSIOption)


@pytest.fixture(scope="module")
def ml_data(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_fallback")
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = ml100k_like["path"]
    opt.data.path = str(root / "ml.bfo")
    opt.data.tmp_dir = str(root / "tmp")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    return data


def test_als_streaming_parity(ml_data):
    def run(**kw):
        np.random.seed(31)
        opt = ALSOption().get_default_option()
        opt.d = 8
        opt.num_iters = 3
        opt.validation = {}
        opt.num_devices = 1
        for k, v in kw.items():
            opt[k] = v
        m = ALS(opt, data=ml_data)
        m.initialize()
        return m, m.train()

    m_res, r_res = run()
    m_str, r_str = run(resident_mb=0)
    assert r_res["train_loss"] == pytest.approx(r_str["train_loss"],
                                                rel=1e-4)
    np.testing.assert_allclose(m_res.Q, m_str.Q, rtol=1e-3, atol=1e-5)


def test_bpr_streaming_trains(ml_data):
    np.random.seed(32)
    opt = BPRMFOption().get_default_option()
    opt.d = 8
    opt.num_iters = 6
    opt.optimizer = "adagrad"
    opt.validation = {}
    opt.resident_mb = 0
    m = BPRMF(opt, data=ml_data)
    m.initialize()
    r1 = m.train()
    assert np.isfinite(r1["train_loss"]) and r1["train_loss"] < 0.7


def test_plsi_streaming_parity(ml_data):
    def run(**kw):
        np.random.seed(33)
        opt = PLSIOption().get_default_option()
        opt.d = 8
        opt.num_iters = 3
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = PLSI(opt, data=ml_data)
        m.initialize()
        return m, m.train()

    m_res, r_res = run()
    m_str, r_str = run(resident_mb=0)
    assert r_res["train_loss"] == pytest.approx(r_str["train_loss"],
                                                rel=1e-4)
    np.testing.assert_allclose(m_res.Q, m_str.Q, rtol=1e-3, atol=1e-5)


def test_warp_streaming_trains(ml_data):
    from buffalo_tpu.models import WARP
    from buffalo_tpu.models.options import WARPOption

    np.random.seed(34)
    opt = WARPOption().get_default_option()
    opt.d = 8
    opt.num_iters = 6
    opt.validation = {}
    opt.resident_mb = 0
    m = WARP(opt, data=ml_data)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"]) and r["train_loss"] <= 1.0


def test_als_dp_tp_streaming_fallback(ml_data):
    """dp+tp with non-resident data must fall back to mesh streaming
    with batch-sharded chunks (code-review r2 finding: the range-intent
    batchers lacked the mesh sharding and clashed with row-sharded
    tables)."""
    np.random.seed(35)
    opt = ALSOption().get_default_option()
    opt.d = 8
    opt.num_iters = 2
    opt.validation = {}
    opt.num_devices = 8
    opt.sharding = "dp+tp"
    opt.resident_mb = 0
    m = ALS(opt, data=ml_data)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"]) and r["train_loss"] < 1.0
    assert m._mesh_range is None


def test_w2v_streaming_trains(ml100k_like, tmp_path_factory):
    from buffalo_tpu.models import W2V
    from buffalo_tpu.models.options import W2VOption

    root = tmp_path_factory.mktemp("w2v_stream")
    rng = np.random.default_rng(5)
    lines = [" ".join(f"t{int(x)}" for x in rng.integers(0, 40, 12))
             for _ in range(200)]
    (root / "c.txt").write_text("\n".join(lines))
    sopt = StreamOptions().get_default_option()
    sopt.input.main = str(root / "c.txt")
    sopt.data.path = str(root / "s.bfo")
    sopt.data.tmp_dir = str(root / "tmp")
    sopt.data.validation = {}
    sdata = load(sopt)
    sdata.create()

    np.random.seed(36)
    opt = W2VOption().get_default_option()
    opt.d = 8
    opt.num_iters = 3
    opt.min_count = 1
    opt.resident_mb = 0  # force per-chunk streaming dispatches
    m = W2V(opt, data=sdata)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"]) and r["train_loss"] > 0


def test_cfr_streaming_parity(tmp_path_factory):
    from buffalo_tpu.models import CFR
    from buffalo_tpu.models.options import CFROption

    root = tmp_path_factory.mktemp("cfr_stream")
    rng = np.random.default_rng(6)
    lines = [" ".join(f"i{int(x)}" for x in rng.integers(0, 30, 10))
             for _ in range(120)]
    (root / "c.txt").write_text("\n".join(lines))
    sopt = StreamOptions().get_default_option()
    sopt.input.main = str(root / "c.txt")
    sopt.data.path = str(root / "s.bfo")
    sopt.data.tmp_dir = str(root / "tmp")
    sopt.data.internal_data_type = "matrix"
    sopt.data.sppmi = {"windows": 3, "k": 1}
    sopt.data.validation = {}
    sdata = load(sopt)
    sdata.create()

    def run(**kw):
        np.random.seed(37)
        opt = CFROption().get_default_option()
        opt.d = 8
        opt.num_iters = 3
        opt.validation = {}
        for k, v in kw.items():
            opt[k] = v
        m = CFR(opt, data=sdata)
        m.initialize()
        return m, m.train()

    m_res, r_res = run()
    m_str, r_str = run(resident_mb=0)
    assert r_res["train_loss"] == pytest.approx(r_str["train_loss"],
                                                rel=1e-4)
    np.testing.assert_allclose(m_res.I, m_str.I, rtol=1e-3, atol=1e-5)
