"""Stream database build tests (reference tests/data/test_stream.py analog)."""
import numpy as np

from buffalo_tpu.data import Stream, StreamOptions


STREAM_LINES = "alpha beta gamma beta\nbeta delta\ngamma gamma alpha\n"


def _build(tmp_path, text=STREAM_LINES, name="s.bfo", internal="stream",
           validation=None, sppmi=None):
    main = tmp_path / "main.txt"
    main.write_text(text)
    opt = StreamOptions().get_default_option()
    opt.input.main = str(main)
    opt.data.path = str(tmp_path / name)
    opt.data.tmp_dir = str(tmp_path / "tmp")
    opt.data.internal_data_type = internal
    opt.data.validation = validation if validation is not None else {}
    opt.data.sppmi = sppmi if sppmi is not None else {}
    s = Stream(opt)
    s.create()
    return s


def test_stream_order_preserved(tmp_path):
    s = _build(tmp_path)
    header = s.get_header()
    assert header["num_users"] == 3
    assert header["num_items"] == 4  # alpha beta gamma delta
    assert header["num_nnz"] == 9
    # vocabulary is first-appearance ordered
    idmap = s.get_group("idmap")
    assert [str(x) for x in idmap["cols"]] == ["alpha", "beta", "gamma", "delta"]
    # stream keeps duplicates and order
    keys, = s.get(0)
    assert keys.tolist() == [0, 1, 2, 1]
    keys, = s.get(2)
    assert keys.tolist() == [2, 2, 0]
    assert not s.has_group("colwise")


def test_matrix_internal_dedupes(tmp_path):
    s = _build(tmp_path, internal="matrix", name="m.bfo")
    header = s.get_header()
    assert header["num_nnz"] == 7  # "beta" twice in line 1 → 1 entry val 2
    keys, vals = s.get(0)
    assert keys.tolist() == [0, 1, 2]
    assert vals.tolist() == [1.0, 2.0, 1.0]
    assert s.has_group("colwise")


def test_newest_validation(tmp_path):
    s = _build(tmp_path, name="v.bfo",
               validation={"name": "newest", "n": 1, "max_samples": 10})
    vali = s.get_group("vali")
    # one newest item per user with >= 2 items
    assert len(vali["row"]) == 3
    # last token of line 0 is beta (idx 1)
    rows = np.asarray(vali["row"])
    cols = np.asarray(vali["col"])
    m = dict(zip(rows.tolist(), cols.tolist()))
    assert m[0] == 1
    assert m[1] == 3
    assert m[2] == 0
    # carved out of train
    keys, = s.get(0)
    assert keys.tolist() == [0, 1, 2]


def test_sppmi_build(tmp_path):
    text = "\n".join("a b c d e" for _ in range(10)) + "\n"
    s = _build(tmp_path, text=text, name="sp.bfo",
               sppmi={"windows": 2, "k": 1})
    assert s.has_group("sppmi")
    g = s.get_group("sppmi")
    assert s.attrs["sppmi_nnz"] == len(g["key"])
    assert len(g["indptr"]) == s.get_header()["num_items"] + 1
    # symmetric
    indptr = np.asarray(g["indptr"])
    key = np.asarray(g["key"])
    val = np.asarray(g["val"])
    pairs = {}
    for r in range(len(indptr) - 1):
        for j in range(indptr[r], indptr[r + 1]):
            pairs[(r, int(key[j]))] = float(val[j])
    for (r, c), v in pairs.items():
        assert (c, r) in pairs
        assert abs(pairs[(c, r)] - v) < 1e-6


def test_unicode_tokens(tmp_path):
    s = _build(tmp_path, text="사과 배\n배 포도\n", name="u.bfo")
    idmap = s.get_group("idmap")
    assert [str(x) for x in idmap["cols"]] == ["사과", "배", "포도"]


def test_newest_validation_dedupes(tmp_path):
    """The newest carve-out is Counter-deduped before writing
    (reference stream.py:229-231): last tokens 'a a b' produce 2 vali
    entries, not 3 — for both internal data types."""
    text = "x y z a a b\nq r\n"
    for internal in ("stream", "matrix"):
        s = _build(tmp_path, text=text, name=f"nv_{internal}.bfo",
                   internal=internal,
                   validation={"name": "newest", "n": 3})
        vali = s.get_group("vali")
        u0 = np.asarray(vali["row"]) == 0
        assert int(u0.sum()) == 2
        idmap = [str(x) for x in s.get_group("idmap")["cols"]]
        got = sorted(idmap[c] for c in np.asarray(vali["col"])[u0])
        assert got == ["a", "b"]


def test_sample_validation_clamped_to_population(tmp_path):
    """p=1.0 with a huge max_samples must not raise (sample size is
    clamped to total_tokens - 1)."""
    s = _build(tmp_path, name="clamp.bfo",
               validation={"name": "sample", "p": 1.0,
                           "max_samples": 10 ** 9})
    header = s.get_header()
    assert header["num_nnz"] + int(s.attrs.get("num_validation_samples", 0)) == 9
