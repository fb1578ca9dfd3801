"""disk_based (out-of-core) build must match the in-memory build."""
import numpy as np

from buffalo_tpu.data import MatrixMarketOptions, load


def _write_mm(tmp_path, num_users=60, num_items=25, per_user=12, seed=3):
    rng = np.random.default_rng(seed)
    path = tmp_path / "main.mtx"
    lines = []
    for u in range(num_users):
        for i in np.unique(rng.integers(0, num_items, per_user)):
            lines.append(f"{u + 1} {int(i) + 1} {rng.integers(1, 6)}")
    path.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        f"{num_users} {num_items} {len(lines)}\n" + "\n".join(lines) + "\n")
    return str(path)


def _build(mm, out, tmp, disk_based, validation=None):
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = mm
    opt.data.path = str(out)
    opt.data.tmp_dir = str(tmp)
    opt.data.disk_based = disk_based
    opt.data.validation = validation or {}
    data = load(opt)
    data.create()
    return data


def test_disk_build_matches_memory(tmp_path):
    mm = _write_mm(tmp_path)
    mem = _build(mm, tmp_path / "mem.bfo", tmp_path / "t1", False)
    dsk = _build(mm, tmp_path / "dsk.bfo", tmp_path / "t2", True)
    assert mem.get_header() == dsk.get_header()
    for group in ("rowwise", "colwise"):
        g1, g2 = mem.get_group(group), dsk.get_group(group)
        np.testing.assert_array_equal(np.asarray(g1["indptr"]),
                                      np.asarray(g2["indptr"]))
        np.testing.assert_array_equal(np.asarray(g1["key"]),
                                      np.asarray(g2["key"]))
        np.testing.assert_allclose(np.asarray(g1["val"]),
                                   np.asarray(g2["val"]))


def test_disk_build_validation_sample(tmp_path):
    mm = _write_mm(tmp_path)
    vali = {"name": "sample", "p": 0.2, "max_samples": 50}
    dsk = _build(mm, tmp_path / "d2.bfo", tmp_path / "t3", True,
                 validation=vali)
    h = dsk.get_header()
    v = dsk.get_group("vali")
    assert len(v["row"]) > 0
    assert h["num_nnz"] + len(v["row"]) == \
        int(np.asarray(dsk.get_group("rowwise")["indptr"])[-1]) \
        + len(v["row"])
    # every train row's keys stay column-sorted
    g = dsk.get_group("rowwise")
    indptr, key = np.asarray(g["indptr"]), np.asarray(g["key"])
    for r in range(len(indptr) - 1):
        seg = key[indptr[r]:indptr[r + 1]]
        assert np.all(np.diff(seg) >= 0)
