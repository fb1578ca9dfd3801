"""Option/config tests (reference misc tests analog)."""
import pickle

import pytest

from buffalo_tpu.utils import Option
from buffalo_tpu.utils.option import InputOptions


def test_nested_attr_access():
    o = Option({"a": {"b": {"c": 3}}, "d": 1})
    assert o.a.b.c == 3
    assert o["a"]["b"]["c"] == 3
    o.a.b.c = 5
    assert o["a"]["b"]["c"] == 5
    o.new = {"x": 1}
    assert o.new.x == 1


def test_json_roundtrip(tmp_path):
    o = Option({"a": {"b": 2}})
    p = tmp_path / "opt.json"
    p.write_text(o.to_json())
    o2 = Option(str(p))
    assert o2.a.b == 2
    o3 = Option('{"k": {"v": 9}}')
    assert o3.k.v == 9


def test_pickle():
    o = Option({"a": {"b": 2}})
    o2 = pickle.loads(pickle.dumps(o))
    assert o2.a.b == 2
    assert isinstance(o2.a, Option)


def test_validation_types():
    class Opt(InputOptions):
        def get_default_option(self):
            return Option({"d": 20, "lr": 0.05, "flag": True, "name": "x"})

    opt = Opt()
    assert opt.is_valid_option({"d": 10, "lr": 1, "flag": False, "name": "y"})
    with pytest.raises(RuntimeError):
        opt.is_valid_option({"d": "nope"})
    with pytest.raises(RuntimeError):
        opt.is_valid_option({"flag": 1})


def test_aux_alias_contract():
    """The reference exposes Option as buffalo.misc.aux (tested by its
    tests/util/test_aux.py); the alias must keep the same access
    contract."""
    from buffalo_tpu import aux

    o = aux.Option({"string": "str", "int": 1, "float": 0.1})
    assert o["string"] == o.string == "str"
    assert o["int"] == o.int == 1
    assert o["float"] == o.float == 0.1
