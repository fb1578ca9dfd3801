"""Value-preprocessor contract tests.

Mirror of the reference ``tests/data/test_prepro.py``: the same 5x3
fixture with values [1, 3, 1, 1, 2], the same expected post-transform
values for OneBased / MinMaxScalar / ImplicitALS, and the same
RuntimeError for SPPMI on a MatrixMarket build.
"""
import math

import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarket, MatrixMarketOptions

MM = """%%MatrixMarket matrix coordinate integer general
%
%
5 3 5
1 1 1
2 1 3
3 3 1
4 2 1
5 2 2"""


@pytest.fixture
def paths(tmp_path):
    main = tmp_path / "main.mtx"
    main.write_text(MM)
    uid = tmp_path / "uid"
    uid.write_text("lucas\ngony\njason\nlomego\nhan")
    iid = tmp_path / "iid"
    iid.write_text("apple\nmango\nbanana")
    return str(main), str(uid), str(iid)


def _build(tmp_path, paths, value_prepro):
    main, uid, iid = paths
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = main
    opt.input.uid = uid
    opt.input.iid = iid
    opt.data.path = str(tmp_path / "db.bfo")
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.validation = {}
    opt.data.value_prepro = value_prepro
    mm = MatrixMarket(opt)
    mm.create()
    return mm


def _check_header(mm):
    header = mm.get_header()
    assert header["num_nnz"] == 5
    assert header["num_users"] == 5
    assert header["num_items"] == 3
    data = list(mm.iterate())
    assert len(data) == 5
    assert [int(kk) for _, kk, _ in data] == [0, 0, 2, 1, 1]
    return data


def test_onebased(tmp_path, paths):
    mm = _build(tmp_path, paths, {"name": "OneBased"})
    data = _check_header(mm)
    assert [int(vv) for _, _, vv in data] == [1, 1, 1, 1, 1]
    assert data[2] == (2, 2, 1.0)


def test_minmax(tmp_path, paths):
    mm = _build(tmp_path, paths,
                {"name": "MinMaxScalar", "min": 3, "max": 5.0})
    data = _check_header(mm)
    # original values [1, 3, 1, 1, 2] rescaled from [1, 3] to [3, 5]
    assert [int(vv) for _, _, vv in data] == [3, 5, 3, 3, 4]
    assert data[2] == (2, 2, 3.0)


def test_implicit_als(tmp_path, paths):
    mm = _build(tmp_path, paths, {"name": "ImplicitALS", "epsilon": 0.5})
    data = _check_header(mm)
    assert data[2][2] == pytest.approx(math.log(1 + 1.0 / 0.5))


def test_sppmi_rejected_on_matrix_market(tmp_path, paths):
    main, uid, iid = paths
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = main
    opt.input.uid = uid
    opt.input.iid = iid
    opt.data.path = str(tmp_path / "db.bfo")
    opt.data.validation = {}
    opt.data.value_prepro = {"name": "SPPMI"}
    with pytest.raises(RuntimeError):
        MatrixMarket(opt)


def test_minmax_all_negative_values(tmp_path, paths):
    """The -inf value_max init: all-negative inputs still span the
    full [min, max] target range (the reference's 0.0 init caps the
    observed max at 0 and quietly compresses the range)."""
    main = tmp_path / "neg.mtx"
    main.write_text("%%MatrixMarket matrix coordinate real general\n"
                    "2 2 3\n1 1 -3\n1 2 -2\n2 1 -1\n")
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = str(main)
    opt.data.path = str(tmp_path / "db2.bfo")
    opt.data.tmp_dir = str(tmp_path / "tmp2")
    opt.data.validation = {}
    opt.data.value_prepro = {"name": "MinMaxScalar", "min": 0, "max": 1.0}
    mm = MatrixMarket(opt)
    mm.create()
    vals = sorted(float(v) for _, _, v in mm.iterate())
    assert vals == pytest.approx([0.0, 0.5, 1.0])
