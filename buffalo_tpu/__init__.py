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

__version__ = "0.2.0"

from buffalo_tpu.data import (MatrixMarket, MatrixMarketOptions,  # noqa: F401
                              Stream, StreamOptions)
from buffalo_tpu.models import (ALS, BPRMF, CFR, EALS, PLSI, W2V,  # noqa: F401
                                WARP)
from buffalo_tpu.models.base import Algo  # noqa: F401
from buffalo_tpu.models.options import AlgoOption  # noqa: F401
from buffalo_tpu.models.options import (ALSOption, BPRMFOption,  # noqa: F401
                                        CFROption, EALSOption, PLSIOption,
                                        W2VOption, WARPOption)
from buffalo_tpu.parallel import (IVFIndex, ParALS, ParBPRMF,  # noqa: F401
                                  ParCFR, ParEALS, ParW2V)

# Reference-API compatibility flags (buffalo/__init__.py exports
# inited_CUALS/inited_CUBPR to signal its optional CUDA extensions).
# There is no second accelerator backend here — the JAX compute path
# IS the accelerator — so drop-in callers that branch on these flags
# take their portable code path.
inited_CUALS = False
inited_CUBPR = False
from buffalo_tpu.utils import Option  # noqa: F401
from buffalo_tpu.utils import log  # noqa: F401
from buffalo_tpu import utils as aux  # noqa: F401  (reference alias)
from buffalo_tpu.utils.log import get_log_level, set_log_level  # noqa: F401

__all__ = [
    "ALS", "BPRMF", "CFR", "EALS", "PLSI", "W2V", "WARP",
    "ALSOption", "BPRMFOption", "CFROption", "EALSOption", "PLSIOption",
    "W2VOption", "WARPOption",
    "MatrixMarket", "MatrixMarketOptions", "Stream", "StreamOptions",
    "ParALS", "ParBPRMF", "ParCFR", "ParEALS", "ParW2V", "IVFIndex",
    "Algo", "AlgoOption",
    "Option", "set_log_level", "get_log_level", "aux", "log",
    "inited_CUALS", "inited_CUBPR",
]
