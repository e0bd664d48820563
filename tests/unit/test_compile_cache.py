"""Unit tests for the persistent-compilation-cache hook and the fenced
scaling benchmark (VERDICT r4 #2/#9)."""

import jax
import pytest

from seqrec_tpu.runtime import compile_cache


def test_enable_creates_backend_namespaced_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(compile_cache, "_enabled_dir", "")
    root = tmp_path / "xla_cache"
    assert compile_cache.enable_compilation_cache(str(root))
    expected = root / jax.default_backend()
    assert expected.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(expected)
    # Idempotent: second call with the same dir is a cheap True.
    assert compile_cache.enable_compilation_cache(str(root))


def test_empty_dir_disables(monkeypatch):
    monkeypatch.setattr(compile_cache, "_enabled_dir", "")
    assert not compile_cache.enable_compilation_cache("")


def test_run_scaling_refuses_fake_cpu_devices():
    from benchmarks.scaling import run_scaling

    assert jax.default_backend() == "cpu"  # the test env
    with pytest.raises(RuntimeError, match="refuses"):
        run_scaling([1, 2])
