"""Persistent-compilation-cache utility (utils.compcache)."""

import jax


def test_enable_persistent_cache(tmp_path, monkeypatch):
    import cvo_slam_tpu.utils.compcache as cc
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.setenv("CVO_SLAM_COMPCACHE_DIR", str(tmp_path / "cc"))
    assert cc.enable_persistent_cache() is True
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
    # idempotent
    assert cc.enable_persistent_cache() is True


def test_enable_persistent_cache_opt_out(monkeypatch):
    import cvo_slam_tpu.utils.compcache as cc
    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.setenv("CVO_SLAM_COMPCACHE", "0")
    assert cc.enable_persistent_cache() is False
