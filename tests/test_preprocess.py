"""Exercise tests/preprocess.py on fabricated raw files (the real
downloads are unavailable offline): each converter must produce inputs
the data builders accept."""
import importlib.util
import os
import sys

import numpy as np
import pytest


@pytest.fixture()
def preprocess(tmp_path, monkeypatch):
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "bt_preprocess", os.path.join(here, "preprocess.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.EXT = str(tmp_path)
    return mod


def test_ml100k_conversion(preprocess, tmp_path):
    root = tmp_path / "ml-100k"
    root.mkdir()
    rng = np.random.default_rng(0)
    lines = [f"{rng.integers(1, 944)}\t{rng.integers(1, 1683)}\t"
             f"{rng.integers(1, 6)}\t{878887116 + i}" for i in range(500)]
    (root / "u.data").write_text("\n".join(lines) + "\n")
    (root / "u.item").write_text(
        "\n".join(f"{i}|Movie Title {i} (1995)|x|x|x"
                  for i in range(1, 1683)) + "\n", encoding="ISO-8859-1")
    assert preprocess.ml100k()
    main = (root / "main").read_text().splitlines()
    assert main[0].startswith("%%MatrixMarket")
    assert main[1] == f"943 1682 {len(lines)}"
    assert len((root / "uid").read_text().splitlines()) == 943
    assert len((root / "iid").read_text().splitlines()) == 1682
    assert len((root / "stream").read_text().splitlines()) == 943

    # the converted output must build a database
    from buffalo_tpu.data import MatrixMarketOptions, load
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = str(root / "main")
    opt.input.uid = str(root / "uid")
    opt.input.iid = str(root / "iid")
    opt.data.path = str(tmp_path / "ml.bfo")
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    header = data.get_header()
    assert header["num_users"] == 943 and header["num_items"] == 1682


def test_text8_conversion(preprocess, tmp_path):
    root = tmp_path / "text8"
    root.mkdir()
    words = " ".join(f"w{i % 50}" for i in range(2500))
    (root / "text8").write_text(words)
    assert preprocess.text8()
    out = (root / "main").read_text().splitlines()
    assert len(out) == 3  # 2500 words -> 3 sentences of <=1000
    assert sum(len(line.split()) for line in out) == 2500


def test_brunch_conversion(preprocess, tmp_path):
    root = tmp_path / "kakao-brunch-12m"
    root.mkdir()
    (root / "views").write_text(
        "userA item1 item2 item3\nuserB item2 item4\n")
    assert preprocess.brunch12m()
    assert (root / "main").read_text() == "item1 item2 item3\nitem2 item4\n"
    assert (root / "uid").read_text() == "userA\nuserB\n"


def test_ml20m_conversion(preprocess, tmp_path):
    pytest.importorskip("pandas")
    root = tmp_path / "ml-20m"
    root.mkdir()
    (root / "ratings.csv").write_text(
        "userId,movieId,rating,timestamp\n"
        "3,10,4.0,1\n1,20,3.5,2\n3,20,5.0,3\n")
    assert preprocess.ml20m()
    main = (root / "main").read_text().splitlines()
    assert main[1] == "2 2 3"
    assert (root / "uid").read_text().splitlines() == ["1", "3"]
