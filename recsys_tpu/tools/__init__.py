"""Measurement / protocol tools.

`enable_compile_cache` is shared by every entry point that pays remote
(tunnelled) TPU compiles — bench.py and the protocol runner — so the
cache-dir and threshold policy live in exactly one place.
"""
from __future__ import annotations

import os


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at <repo>/.jax_cache.

    Remote (tunnelled) compiles dominate cold-run wall time for the bench
    and protocol runners; identical programs recompile across seeds and
    teachers.  Opt out with RECSYS_TPU_NO_COMPILE_CACHE=1.  Safe on any
    backend; never raises (read-only checkouts just skip caching).
    """
    if os.environ.get("RECSYS_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
