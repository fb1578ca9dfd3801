"""Degenerate-input robustness: tiny matrices, empty rows, single
cluster — the builders and drivers must not crash or NaN."""
import os

import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import ALS, EALS, PLSI
from buffalo_tpu.models.options import ALSOption, EALSOption, PLSIOption


def _build(tmp_path, lines, num_users, num_items):
    mm = tmp_path / "m.mm"
    with open(mm, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_users} {num_items} {len(lines)}\n")
        f.write("\n".join(lines) + ("\n" if lines else ""))
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = str(mm)
    opt.data.path = str(tmp_path / "d.bfo")
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    return data


def test_single_interaction(tmp_path):
    data = _build(tmp_path, ["1 1 5.0"], 1, 1)
    opt = ALSOption().get_default_option()
    opt.d = 4
    opt.num_iters = 2
    opt.validation = {}
    m = ALS(opt, data=data)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"])
    assert np.all(np.isfinite(m.P)) and np.all(np.isfinite(m.Q))


def test_empty_rows_and_cols(tmp_path):
    # users 3..6 and items 4..8 have no interactions at all
    lines = [f"{u} {i} 1.0" for u, i in [(1, 1), (1, 2), (2, 1), (2, 3)]]
    data = _build(tmp_path, lines, 6, 8)
    for cls, ocls in [(ALS, ALSOption), (EALS, EALSOption),
                      (PLSI, PLSIOption)]:
        np.random.seed(1)
        opt = ocls().get_default_option()
        opt.d = 4
        opt.num_iters = 2
        opt.validation = {}
        m = cls(opt, data=data)
        m.initialize()
        r = m.train()
        assert np.isfinite(r["train_loss"]), cls.__name__
        assert np.all(np.isfinite(m.P)), cls.__name__
        assert np.all(np.isfinite(m.Q)), cls.__name__


def test_wide_degenerate_row(tmp_path):
    # one user rated everything (row degree == num_items)
    lines = [f"1 {i} 1.0" for i in range(1, 65)]
    lines += ["2 1 3.0", "3 2 2.0"]
    data = _build(tmp_path, lines, 3, 64)
    opt = ALSOption().get_default_option()
    opt.d = 4
    opt.num_iters = 2
    opt.validation = {}
    m = ALS(opt, data=data)
    m.initialize()
    r = m.train()
    assert np.isfinite(r["train_loss"])
