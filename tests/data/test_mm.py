"""MatrixMarket database build tests.

Modeled on the reference data-layer tests (``tests/data/test_mm.py``):
exact CSR contents for both orientations, validation carve-out,
ndarray/scipy inputs, preprocessors, caching.
"""
import os

import numpy as np
import pytest
import scipy.sparse

from buffalo_tpu.data import MatrixMarket, MatrixMarketOptions, load


def _build(tmp_path, main, name="mm.bfo", validation=None, uid="", iid="",
           value_prepro=None, use_cache=False):
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = main
    opt.input.uid = uid
    opt.input.iid = iid
    opt.data.path = str(tmp_path / name)
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.use_cache = use_cache
    if validation is not None:
        opt.data.validation = validation
    else:
        del opt.data["validation"]
        opt.data.validation = {}
    if value_prepro is not None:
        opt.data.value_prepro = value_prepro
    mm = MatrixMarket(opt)
    mm.create()
    return mm


SMALL = """%%MatrixMarket matrix coordinate real general
5 3 8
1 1 1
2 1 2
3 1 3
4 2 4
5 2 5
1 3 1
2 3 2
3 3 3
"""


def test_exact_csr_contents(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main))
    header = mm.get_header()
    assert header["num_users"] == 5
    assert header["num_items"] == 3
    assert header["num_nnz"] == 8

    row = mm.get_group("rowwise")
    assert row["indptr"].tolist() == [0, 2, 4, 6, 7, 8]
    assert row["key"].tolist() == [0, 2, 0, 2, 0, 2, 1, 1]
    assert row["val"].tolist() == [1, 1, 2, 2, 3, 3, 4, 5]

    col = mm.get_group("colwise")
    assert col["indptr"].tolist() == [0, 3, 5, 8]
    assert col["key"].tolist() == [0, 1, 2, 3, 4, 0, 1, 2]
    assert col["val"].tolist() == [1, 2, 3, 4, 5, 1, 2, 3]


def test_get_and_iterate(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main))
    keys, vals = mm.get(0)
    assert keys.tolist() == [0, 2]
    assert vals.tolist() == [1, 1]
    triples = list(mm.iterate())
    assert len(triples) == 8
    assert triples[0] == (0, 0, 1.0)
    named = list(mm.iterate(use_repr_name=True))
    assert named[0] == ("0", "0", 1.0)


def test_ndarray_and_sparse_input(tmp_path, tiny_mm):
    dense = np.zeros((4, 3), dtype=np.float32)
    dense[0, 1] = 2.0
    dense[3, 2] = 1.0
    mm = _build(tmp_path, dense, name="dense.bfo")
    assert mm.get_header()["num_nnz"] == 2
    keys, vals = mm.get(0)
    assert keys.tolist() == [1]
    sp = scipy.sparse.csr_matrix(dense)
    mm2 = _build(tmp_path, sp, name="sparse.bfo")
    assert mm2.get_header()["num_nnz"] == 2


def test_validation_sample(tmp_path, tiny_mm):
    mm = _build(tmp_path, tiny_mm["path"], name="vali.bfo",
                validation={"name": "sample", "p": 0.2, "max_samples": 10})
    header = mm.get_header()
    vali = mm.get_group("vali")
    n_vali = len(vali["row"])
    assert 0 < n_vali <= 10
    assert header["num_nnz"] == tiny_mm["nnz"] - n_vali
    mm._prepare_validation_data()
    assert mm.vali_data["validation_max_seen_size"] > 0
    assert len(mm.vali_data["vali_gt"]) > 0


def test_id_maps(tmp_path, ml100k_like):
    mm = _build(tmp_path, ml100k_like["path"], name="ids.bfo",
                uid=ml100k_like["uid"], iid=ml100k_like["iid"])
    idmap = mm.get_group("idmap")
    assert str(idmap["rows"][0]) == "u0"
    assert str(idmap["cols"][5]) == "i5"


def test_value_prepro_onebased(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main), name="ob.bfo",
                value_prepro={"name": "OneBased"})
    assert np.all(mm.get_group("rowwise")["val"][:] == 1.0)


def test_value_prepro_implicit_als(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main), name="ia.bfo",
                value_prepro={"name": "ImplicitALS", "epsilon": 0.5})
    expected = np.log(1.0 + np.array([1, 1, 2, 2, 3, 3, 4, 5]) / 0.5)
    got = np.sort(mm.get_group("rowwise")["val"][:])
    assert np.allclose(np.sort(expected), got, rtol=1e-6)


def test_use_cache(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main), name="cache.bfo", use_cache=True)
    mtime = os.path.getmtime(str(tmp_path / "cache.bfo" / "header.json"))
    mm2 = _build(tmp_path, str(main), name="cache.bfo", use_cache=True)
    assert os.path.getmtime(str(tmp_path / "cache.bfo" / "header.json")) == mtime
    assert mm2.get_header()["num_nnz"] == 8


def test_load_factory(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = str(main)
    opt.data.path = str(tmp_path / "factory.bfo")
    opt.data.validation = {}
    d = load(opt)
    assert isinstance(d, MatrixMarket)


def test_corrupt_rejected(tmp_path):
    main = tmp_path / "small.mm"
    main.write_text(SMALL)
    mm = _build(tmp_path, str(main), name="corrupt.bfo")
    import json
    hpath = tmp_path / "corrupt.bfo" / "header.json"
    attrs = json.loads(hpath.read_text())
    attrs["completed"] = 0
    hpath.write_text(json.dumps(attrs))
    with pytest.raises(RuntimeError):
        mm.open(str(tmp_path / "corrupt.bfo"))


def test_builder_error_removes_partial_artifact(tmp_path):
    """A build that fails mid-parse must clean up its partial .bfo dir
    (reference contract: delete-on-exception in Data._create)."""
    bad = tmp_path / "bad.mm"
    # header promises 10 nnz, body has 2 -> the parser must reject
    bad.write_text("%%MatrixMarket matrix coordinate real general\n"
                   "5 3 10\n1 1 1\n2 2 1\n")
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = str(bad)
    opt.data.path = str(tmp_path / "bad.bfo")
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.validation = {}
    mm = MatrixMarket(opt)
    with pytest.raises(Exception):
        mm.create()
    assert not os.path.exists(str(tmp_path / "bad.bfo"))
