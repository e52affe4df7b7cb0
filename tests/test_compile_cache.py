"""The persistent-compile-cache helper every CLI entry point calls."""

import os

import jax

from mint_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_points_jax_at_a_writable_dir(tmp_path, monkeypatch):
    target = tmp_path / "xla_cache"
    monkeypatch.delenv("MINT_TPU_COMPILE_CACHE", raising=False)
    path = enable_persistent_cache(str(target))
    assert path == str(target)
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_env_var_overrides_and_disables(tmp_path, monkeypatch):
    override = tmp_path / "from_env"
    monkeypatch.setenv("MINT_TPU_COMPILE_CACHE", str(override))
    assert enable_persistent_cache() == str(override)
    assert os.path.isdir(str(override))
    monkeypatch.setenv("MINT_TPU_COMPILE_CACHE", "off")
    assert enable_persistent_cache() == ""
