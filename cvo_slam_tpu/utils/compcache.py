"""Persistent XLA compilation cache for the app entry points.

The SLAM pipeline compiles one executable per distinct solver shape (the
windowed-BA capacity buckets, the final pose-graph BA, the LC verification
programs). On a normally attached TPU each compile is seconds; through a
remote-compile tunnel they can be 15-90 s, and they dominated the keyframe
events of full-pipeline runs (measured: a 120-frame loop spent 190 of
209 s in first-occurrence compiles). JAX's persistent cache removes them
across processes AND across runs (measured on this backend: 9.4 s ->
0.27 s on a cache hit).

Opt-out with CVO_SLAM_COMPCACHE=0; override the location with
CVO_SLAM_COMPCACHE_DIR (default: <repo>/.cache/jax).
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str = None) -> bool:
    """Idempotent, fail-safe. Returns True if the cache is active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("CVO_SLAM_COMPCACHE", "1") == "0":
        return False
    if path is None:
        path = os.environ.get("CVO_SLAM_COMPCACHE_DIR", "")
    if not path:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(root, ".cache", "jax")
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
        return True
    except Exception:  # noqa: BLE001 — never break a run over the cache
        return False
