"""buffalo_tpu — a TPU-native matrix-factorization recommender framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kakao/buffalo (the reference public API surface is
``buffalo/__init__.py:1-19``): ALS (with iALS++ blockwise solver),
eALS, BPR-MF, WARP/CML, skip-gram W2V, CoFactor (CFR) and pLSI over
sparse user-item interaction data, plus data builders, ranking/score
evaluation, batched top-k retrieval and model serialization —
re-designed for TPU: sharded factor tables over a device mesh, padded
fixed-shape interaction batches, batched linear solvers and
deterministic vectorized sampling.
"""
from __future__ import annotations

__version__ = "0.1.0"

from buffalo_tpu.data import (MatrixMarket, MatrixMarketOptions,  # noqa: F401
                              Stream, StreamOptions)
from buffalo_tpu.utils import Option  # noqa: F401
from buffalo_tpu.utils import log  # noqa: F401
from buffalo_tpu.utils.log import get_log_level, set_log_level  # noqa: F401

__all__ = [
    "MatrixMarket", "MatrixMarketOptions", "Stream", "StreamOptions",
    "Option", "set_log_level", "get_log_level",
]
