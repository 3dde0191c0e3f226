"""Persistent XLA compilation cache.

TPU compiles go through a remote-compile tunnel (~30 s for XLA programs,
minutes for Pallas kernels), so first-run latency of the pipelines is
compile-dominated. JAX's persistent compilation cache serializes compiled
executables keyed by HLO hash; the axon PJRT plugin supports executable
serialization (measured: second-process compile+run of a cached program
drops ~4x even for trivial programs, and saves the full multi-minute
Pallas compile for the warp/LK kernels). Every CLI entry point calls
:func:`enable_persistent_cache` at startup.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Resolution order: explicit ``path`` arg, ``DR3_COMPILE_CACHE`` env var,
    ``~/.cache/dr3_tpu/xla``. Set ``DR3_COMPILE_CACHE=off`` to disable.
    Returns the cache dir, or None if disabled/unsupported.
    """
    env = os.environ.get("DR3_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    cache_dir = path or env or os.path.expanduser("~/.cache/dr3_tpu/xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
