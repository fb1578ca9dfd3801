"""Sharded (orbax) checkpoint tests: round trip, partial-field load,
mesh-sharded restore — the multi-host resume semantics of SURVEY §5
(checkpoint/resume) on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

from buffalo_tpu.data import MatrixMarketOptions, load
from buffalo_tpu.models import ALS
from buffalo_tpu.models.options import ALSOption


@pytest.fixture(scope="module")
def als(ml100k_like, tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt_data")
    opt = MatrixMarketOptions().get_default_option()
    opt.input.main = ml100k_like["path"]
    opt.input.uid = ml100k_like["uid"]
    opt.input.iid = ml100k_like["iid"]
    opt.data.path = str(root / "ml.bfo")
    opt.data.tmp_dir = str(root / "tmp")
    opt.data.validation = {}
    data = load(opt)
    data.create()
    aopt = ALSOption().get_default_option()
    aopt.d = 16
    aopt.num_iters = 3
    aopt.validation = {}
    m = ALS(aopt, data=data)
    m.initialize()
    m.train()
    m.build_itemid_map()
    m.build_userid_map()
    return m


def test_sharded_roundtrip(als, tmp_path):
    path = str(tmp_path / "ck")
    als.save_sharded(path)

    m2 = ALS(ALSOption().get_default_option())
    m2.load_sharded(path)
    np.testing.assert_array_equal(np.asarray(als.P), np.asarray(m2.P))
    np.testing.assert_array_equal(np.asarray(als.Q), np.asarray(m2.Q))
    assert isinstance(m2.P, np.ndarray)  # host restore by default
    # id maps ride meta.pkl
    assert m2._idmanager.itemids[:3] == als._idmanager.itemids[:3]


def test_partial_field_load(als, tmp_path):
    path = str(tmp_path / "ck_partial")
    als.save_sharded(path)

    m2 = ALS(ALSOption().get_default_option())
    m2.load_sharded(path, data_fields=["Q", "_idmanager"])
    np.testing.assert_array_equal(np.asarray(als.Q), np.asarray(m2.Q))
    assert not hasattr(m2, "P") or m2.P is None  # P skipped


def test_mesh_sharded_restore(als, tmp_path):
    """Restore directly into a row-sharded NamedSharding: shards land
    on their devices without a full-table host copy."""
    import jax

    from buffalo_tpu import parallelism

    path = str(tmp_path / "ck_mesh")
    als.save_sharded(path)

    # orbax sharded restore needs the leading dim divisible by the
    # shard count (mesh training pads tables to mesh multiples, cf.
    # build_sharded_range_layout); 5 divides both 500 and 250
    mesh = parallelism.get_mesh(5)
    row_shard = parallelism.shard_rows(mesh)
    m2 = ALS(ALSOption().get_default_option())
    m2.load_sharded(path, data_fields=["P", "Q"], sharding=row_shard)
    assert isinstance(m2.P, jax.Array)
    assert m2.P.sharding == row_shard
    np.testing.assert_array_equal(np.asarray(m2.P), np.asarray(als.P))
    np.testing.assert_array_equal(np.asarray(m2.Q), np.asarray(als.Q))


def test_save_sharded_from_device_arrays(als, tmp_path):
    """Saving sharded device arrays round-trips (the mesh-training
    save path: factors live as jax.Arrays on the mesh)."""
    import jax

    from buffalo_tpu import parallelism

    mesh = parallelism.get_mesh(5)    # 5 divides the 500 P rows
    row_shard = parallelism.shard_rows(mesh)
    host_P = np.asarray(als.P)
    als.P = jax.device_put(host_P, row_shard)
    try:
        path = str(tmp_path / "ck_dev")
        als.save_sharded(path, data_fields=["P"])
        m2 = ALS(ALSOption().get_default_option())
        m2.load_sharded(path, data_fields=["P"])
        np.testing.assert_array_equal(np.asarray(m2.P), host_P)
    finally:
        als.P = host_P


def test_meta_only_resave_drops_stale_arrays(als, tmp_path):
    """Re-saving meta-only over an existing checkpoint must not leave
    the previous save's factor tables behind: load would silently
    attach stale P/Q to the new meta (replace-wholesale semantics,
    like Serializable.save truncating the file)."""
    path = str(tmp_path / "ck_stale")
    als.save_sharded(path)                            # writes P/Q + meta
    als.save_sharded(path, data_fields=["_idmanager"])  # meta-only
    out = ALS(ALSOption().get_default_option())
    out.load_sharded(path)
    assert not hasattr(out, "P") or not isinstance(
        getattr(out, "P", None), np.ndarray), "stale arrays restored"
