"""Persistent-compilation-cache hardening (VERDICT r3 weak #3).

A poisoned or unwritable cache dir once aborted a whole suite run inside
JAX's cache write path.  setup_cache must degrade to cache-OFF (read-only
dir), honor the empty-string escape hatch, and tolerate corrupt entries
(demoted to warnings) — jitted work keeps running in every case.
"""

import jax
import jax.numpy as jnp
import pytest

from raytracinggpu_tpu.bench._timing import setup_cache


@pytest.fixture
def cache_env(monkeypatch):
    """Save/restore the cache config around each test."""
    before = jax.config.jax_compilation_cache_dir
    yield monkeypatch
    jax.config.update("jax_compilation_cache_dir", before)


def _jit_runs():
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    assert float(f(jnp.float32(3.0))) == 7.0


def test_unwritable_dir_degrades_to_off(tmp_path, cache_env):
    # A path under a regular FILE can never be created or written — the
    # probe fails with OSError for any uid (chmod-based read-only dirs
    # don't bind as root, which is how CI runs).
    blocker = tmp_path / "blocker"
    blocker.write_text("not a dir")
    ro = blocker / "cache"
    cache_env.setenv("JAX_COMPILATION_CACHE_DIR", str(ro))
    setup_cache()
    assert jax.config.jax_compilation_cache_dir is None
    _jit_runs()


def test_empty_env_is_explicit_disable(cache_env):
    cache_env.setenv("JAX_COMPILATION_CACHE_DIR", "")
    setup_cache()
    assert jax.config.jax_compilation_cache_dir is None
    _jit_runs()


def test_corrupted_cache_entries_are_nonfatal(tmp_path, cache_env):
    d = tmp_path / "cache"
    d.mkdir()
    # garbage entries of several shapes a poisoned cache could hold
    (d / "jit_f-deadbeef").write_bytes(b"\x00\xff not a real entry \x00" * 64)
    (d / "truncated").write_bytes(b"\x28\xb5\x2f\xfd")  # zstd magic, no body
    cache_env.setenv("JAX_COMPILATION_CACHE_DIR", str(d))
    setup_cache()
    assert jax.config.jax_compilation_cache_dir == str(d)
    # errors demoted to warnings: corrupt reads recompile instead of abort
    assert jax.config.jax_raise_persistent_cache_errors is False
    _jit_runs()


def test_default_repo_cache_still_engages(cache_env):
    cache_env.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    setup_cache()
    assert jax.config.jax_compilation_cache_dir is not None
    assert jax.config.jax_compilation_cache_dir.endswith(".jax_cache")
