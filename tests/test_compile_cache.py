"""Guard rails for utils.enable_compilation_cache's platform gating."""
import jax
import pytest

from buffalo_tpu.utils import enable_compilation_cache


@pytest.fixture()
def clean_env(monkeypatch, tmp_path):
    monkeypatch.delenv("BUFFALO_TPU_CACHE_DIR", raising=False)
    before_cache = jax.config.jax_compilation_cache_dir
    before_platforms = jax.config.jax_platforms
    yield str(tmp_path / "cache")
    jax.config.update("jax_compilation_cache_dir", before_cache)
    jax.config.update("jax_platforms", before_platforms)


def _declared(monkeypatch, value):
    jax.config.update("jax_platforms", value or None)
    if value:
        monkeypatch.setenv("JAX_PLATFORMS", value)
    else:
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)


def test_cache_off_on_declared_cpu(monkeypatch, clean_env):
    _declared(monkeypatch, "cpu")
    assert enable_compilation_cache() is None


def test_cache_off_on_undeclared_platform(monkeypatch, clean_env):
    """The plain external install (no JAX_PLATFORMS, no sitecustomize)
    must NOT silently enable the XLA:CPU persistent cache — its AOT
    reloads can SIGILL across machines (docstring's measured note)."""
    _declared(monkeypatch, "")
    assert enable_compilation_cache() is None


def test_cache_on_for_declared_accelerator(monkeypatch, clean_env):
    _declared(monkeypatch, "axon,cpu")
    monkeypatch.setenv("BUFFALO_TPU_CACHE_DIR", clean_env)
    assert enable_compilation_cache() == clean_env


def test_cache_explicit_path_overrides_cpu_gate(monkeypatch, clean_env):
    _declared(monkeypatch, "cpu")
    assert enable_compilation_cache(path=clean_env) == clean_env
