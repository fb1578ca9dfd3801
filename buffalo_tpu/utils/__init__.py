"""Shared utilities: configuration, logging, temp files."""
from __future__ import annotations

import os
import tempfile

from buffalo_tpu.utils.option import InputOptions, Option  # noqa: F401


def get_temporary_file(root: str = "/tmp/", suffix: str = "") -> str:
    """Create (and leak, by design) a named temp file path under ``root``."""
    os.makedirs(root, exist_ok=True)
    fd, path = tempfile.mkstemp(dir=root, suffix=suffix)
    os.close(fd)
    return path


def mkdirs(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def pin_cpu(force: bool = False) -> bool:
    """Pin JAX to the CPU backend before backend initialization.

    Some environments install a ``sitecustomize`` that force-registers
    an accelerator platform and can override ``JAX_PLATFORMS``; setting
    the env var alone is then not enough — a CPU-only run hangs
    initializing an unreachable accelerator service.  Calling this
    before the first backend touch re-pins both the env var and the
    live JAX config.

    By default the pin applies only when the caller already asked for
    CPU (``JAX_PLATFORMS`` starts with ``cpu``); pass ``force=True`` to
    pin unconditionally.  Returns True when the pin was applied.
    """
    if not (force or os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
        return False
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
