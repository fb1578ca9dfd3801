"""Data layer: builders, compiled dataset access, device batching."""
from __future__ import annotations

from buffalo_tpu.data.batching import (BatchPlanner, COOBatcher,  # noqa: F401
                                       DeviceBatcher, PaddedBatch)
from buffalo_tpu.data.mm import MatrixMarket, MatrixMarketOptions  # noqa: F401
from buffalo_tpu.data.stream import Stream, StreamOptions  # noqa: F401
from buffalo_tpu.utils import Option


def load(opt):
    """Instantiate the right Data class from an option dict/JSON.

    Counterpart of the reference ``buffalo/data/__init__.py:7-18``.
    """
    if isinstance(opt, str):
        opt = Option(opt)
    assert isinstance(opt, dict), \
        f"opt must be either str or dict/Option but {type(opt)}"
    if opt["type"] == "matrix_market":
        return MatrixMarket(opt)
    if opt["type"] == "stream":
        return Stream(opt)
    raise RuntimeError(f"Unexpected data.type: {opt['type']}")
