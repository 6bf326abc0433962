"""Persistent XLA compilation cache.

The build/test environment can be single-core, where XLA compiles cost
seconds each; the persistent cache turns reruns into ~50 ms loads. Called
by the CLI, bench, and tests before the first jit.
"""

from __future__ import annotations

import os


def enable_cache(cache_dir=None):
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PCGC_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                ".cache", "jaxcache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
