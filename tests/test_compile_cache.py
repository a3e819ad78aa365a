"""utils.compile_cache: persistent executable cache wiring (the reference's
compile-once analog — nvcc at build time, Makefile:11-12)."""

import os

import jax

from cbet_raytracing_3d_tpu.utils import compile_cache as cc


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    monkeypatch.delenv("CBET_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_ENABLED", False)
    d = str(tmp_path / "xla")
    got = cc.enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: a second call keeps the existing dir
    assert cc.enable_persistent_cache(str(tmp_path / "other")) == d


def test_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("CBET_TPU_COMPILE_CACHE", "0")
    monkeypatch.setattr(cc, "_ENABLED", False)
    assert cc.enable_persistent_cache(str(tmp_path / "xla")) is None
    assert not os.path.isdir(str(tmp_path / "xla"))
