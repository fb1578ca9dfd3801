from buffalo_tpu.parallel.base import (ParALS, ParBPRMF, ParCFR,  # noqa: F401
                                       ParEALS, ParW2V, Parallel)
from buffalo_tpu.parallel.ann import IVFIndex  # noqa: F401
