"""Persistent XLA compilation cache setup. First compiles over the axon
TPU tunnel are slow (minutes); caching makes repeat invocations with the
same kernel shapes near-instant."""

import os

_done = False


def enable_compilation_cache(path: str = None):
    global _done
    if _done:
        return
    _done = True
    import jax
    cache_dir = path or os.environ.get(
        "TWK_JAX_CACHE", os.path.expanduser("~/.cache/tomahawk_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
