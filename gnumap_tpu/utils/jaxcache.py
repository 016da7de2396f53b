"""Persistent XLA compilation cache (compiles through the axon tunnel are
minutes-slow; cache them across processes/rounds)."""

import os


def enable(path: str = None) -> None:
    import jax
    path = path or os.environ.get("GNUMAP_JAX_CACHE",
                                  "/root/repo/.jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
