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


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (measured working on
    the tunneled TPU backend: executable serialization IS supported —
    a 39.7 s cold compile of the 505k-wide retrieval scan re-loads in
    0.13 s from a fresh process; only a one-time ~9 s first-execution
    program load remains).  Every driver calls this before its first
    jit so the per-process first-compile tax (450+ s for ALS d=100 at
    brunch scale over the remote compiler) is paid once per program
    shape, not once per process.

    ``path`` defaults to ``$BUFFALO_TPU_CACHE_DIR`` or
    ``~/.cache/buffalo_tpu/jax_cache``.  Set
    ``BUFFALO_TPU_CACHE_DIR=off`` to disable.  Safe to call repeatedly
    and after backend init (the config keys are runtime-settable).
    Returns the cache dir in use, or None when disabled.

    On the CPU backend the cache only engages when explicitly
    requested (env var or ``path``): CPU compiles are cheap, and
    XLA:CPU AOT reloads warn about pseudo-feature mismatches
    (+prefer-no-scatter et al.) and can SIGILL across machines.
    """
    explicit = path or os.environ.get("BUFFALO_TPU_CACHE_DIR")
    path = explicit or os.path.expanduser("~/.cache/buffalo_tpu/jax_cache")
    if str(path).lower() in ("off", "none", "0", ""):
        return None
    import jax

    # decide by the DECLARED platform (jax_platforms / JAX_PLATFORMS),
    # not default_backend(): the latter would initialize the backend at
    # model-construction time, ahead of the callers' init watchdogs.
    # Auto-enable ONLY when a non-CPU platform is declared first
    # (e.g. "axon,cpu", "tpu"); an EMPTY declaration — the plain
    # external CPU install — must stay off too, not just "cpu...",
    # or the cache would engage on XLA:CPU by default.
    declared = str(jax.config.jax_platforms
                   or os.environ.get("JAX_PLATFORMS", ""))
    if not explicit and (not declared or declared.startswith("cpu")):
        return None

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # epochs compiling in ~1 s are worth caching too: they recur in
    # every benchmark process and every user session
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)
