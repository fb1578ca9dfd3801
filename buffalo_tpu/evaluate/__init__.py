from buffalo_tpu.evaluate.base import Evaluable  # noqa: F401
