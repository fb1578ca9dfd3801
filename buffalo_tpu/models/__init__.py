"""Algorithm drivers (reference buffalo/algo/ analog)."""
from buffalo_tpu.models.als import ALS  # noqa: F401
from buffalo_tpu.models.bpr import BPRMF  # noqa: F401
from buffalo_tpu.models.cfr import CFR  # noqa: F401
from buffalo_tpu.models.eals import EALS  # noqa: F401
from buffalo_tpu.models.plsi import PLSI  # noqa: F401
from buffalo_tpu.models.w2v import W2V  # noqa: F401
from buffalo_tpu.models.warp import WARP  # noqa: F401
from buffalo_tpu.models.options import (ALSOption, BPRMFOption,  # noqa: F401
                                        CFROption, EALSOption, PLSIOption,
                                        W2VOption, WARPOption)
