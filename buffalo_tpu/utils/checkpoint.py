"""Sharded (orbax) checkpointing for mesh-trained models.

The reference's ``Serializable`` format (``algo/base.py:275-311``) is a
single pickle stream written by one process — fine for single-host
factors, wrong for multi-host mesh training where each process holds
only its shard of the row-sharded tables and a host-gathered pickle
would materialize (and transfer) the full table on every host.

This module keeps the reference's *semantics* — named records,
partial-field save/load, ``instantiate``-style reconstruction — on an
orbax on-disk layout:

  <path>/arrays/      orbax PyTree checkpoint of the factor tables
                      (each process writes only its own shards; TPU
                      restores can re-shard on read)
  <path>/meta.pkl     length-prefixed pickle records for everything
                      that is not a device array (_idmanager, vocab,
                      option echoes), same record framing as
                      ``Serializable.save``

``load_sharded(..., sharding=...)`` restores the arrays directly into
the requested ``jax.sharding.NamedSharding`` without a host-side
full-table copy — the multi-host resume path the reference does not
have (SURVEY §5 checkpoint/resume).  Sharded restore requires the
partitioned dimension to divide evenly by the shard count (mesh
training already pads tables to mesh multiples —
``build_sharded_range_layout``); restore without a sharding for
arbitrary shapes.
"""
from __future__ import annotations

import os
import pickle
import struct
from typing import Optional

import numpy as np

_LEN = struct.Struct("Q")


def _is_array(obj) -> bool:
    import jax

    return isinstance(obj, (np.ndarray, jax.Array)) and \
        getattr(obj, "ndim", 0) >= 1


def save_checkpoint(records, path: str, data_fields=()):
    """Write named records as an orbax-sharded checkpoint.

    ``records``: iterable of (name, obj) — the ``_get_data()`` contract.
    Arrays (numpy or jax, any sharding) go to the orbax tree; the rest
    are pickled into ``meta.pkl``.  ``data_fields`` filters like
    ``Serializable.save``.
    """
    import jax
    import orbax.checkpoint as ocp

    records = list(records)
    if data_fields:
        wanted = set(data_fields)
        records = [(n, o) for n, o in records if n in wanted]
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    arrays = {n: o for n, o in records if _is_array(o)}
    others = [(n, o) for n, o in records if not _is_array(o)]

    arr_dir = os.path.join(path, "arrays")
    if arrays:   # orbax rejects an empty tree (meta-only checkpoints)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(arr_dir, arrays, force=True)
    elif os.path.isdir(arr_dir) and jax.process_index() == 0:
        # re-saving meta-only over an existing checkpoint: a stale
        # arrays/ tree from a previous save would be silently restored
        # by load_checkpoint — replace-wholesale like Serializable.save
        import shutil

        shutil.rmtree(arr_dir)

    # meta.pkl is only written by process 0 (identical on all hosts)
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.pkl"), "wb") as fh:
            fh.write(_LEN.pack(len(others)))
            for name, obj in others:
                payload = name.encode("utf-8")
                fh.write(_LEN.pack(len(payload)))
                fh.write(payload)
                blob = pickle.dumps(obj, protocol=4)
                fh.write(_LEN.pack(len(blob)))
                fh.write(blob)


def load_checkpoint(path: str, data_fields=(), sharding=None,
                    shardings: Optional[dict] = None):
    """Read a checkpoint written by :func:`save_checkpoint`.

    Returns {name: obj}.  ``sharding`` (one ``NamedSharding`` for every
    array) or ``shardings`` ({name: NamedSharding}) restores arrays
    directly into device shards; with neither, arrays come back as
    host numpy.  ``data_fields`` filters; unmatched meta records are
    seek-skipped exactly like ``Serializable.load``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    wanted = set(data_fields) if data_fields else None
    out = {}

    meta_path = os.path.join(path, "meta.pkl")
    if os.path.exists(meta_path):
        with open(meta_path, "rb") as fh:
            (n_rec,) = _LEN.unpack(fh.read(_LEN.size))
            for _ in range(n_rec):
                (ln,) = _LEN.unpack(fh.read(_LEN.size))
                name = fh.read(ln).decode("utf-8")
                (size,) = _LEN.unpack(fh.read(_LEN.size))
                if wanted is not None and name not in wanted:
                    fh.seek(size, 1)
                else:
                    out[name] = pickle.loads(fh.read(size))

    arr_dir = os.path.join(path, "arrays")
    if not os.path.isdir(arr_dir):   # meta-only checkpoint
        return out
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(arr_dir).item_metadata.tree
        names = [n for n in meta.keys()
                 if wanted is None or n in wanted]
        if names:
            def spec(name, m):
                if shardings and name in shardings:
                    sh = shardings[name]
                elif sharding is not None:
                    sh = sharding
                else:
                    return ocp.RestoreArgs(restore_type=np.ndarray)
                return ocp.ArrayRestoreArgs(
                    dtype=m.dtype, sharding=sh,
                    global_shape=m.shape)

            # unwanted arrays restore as PLACEHOLDER (never read from
            # disk) — the seek-skip analog of ``Serializable.load``
            item = {n: (meta[n] if n in names else ocp.PLACEHOLDER)
                    for n in meta.keys()}
            ra = {n: (spec(n, meta[n]) if n in names
                      else ocp.RestoreArgs())
                  for n in meta.keys()}
            restored = ckptr.restore(
                arr_dir, args=ocp.args.PyTreeRestore(
                    item=item, restore_args=ra))
            out.update({n: restored[n] for n in names})
    return out
