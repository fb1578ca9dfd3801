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
