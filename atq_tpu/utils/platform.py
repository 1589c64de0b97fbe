"""Platform selection helper.

Some TPU runtime plugins register themselves regardless of the
``JAX_PLATFORMS`` environment variable; calling
``jax.config.update('jax_platforms', ...)`` before backend initialization
makes the selection stick. CLIs call this first so
``JAX_PLATFORMS=cpu python train.py ...`` behaves as expected.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/atq_tpu_jax")


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache: large train-step compiles (~60s
    for the retrieval model over the tunnel) hit the disk cache on every
    subsequent process.

    TPU-only: CPU executables may be AOT-compiled on a remote compile
    service with different machine features than this host; reloading those
    from a persistent cache risks SIGILL, so the CPU backend skips it."""
    import jax

    # Gate on the *resolved* backend, not the requested platform string —
    # on a CPU-only host with JAX_PLATFORMS unset the string check would
    # wrongly enable the cache the docstring warns about.
    try:
        if jax.default_backend() != "tpu":
            return
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or DEFAULT_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def apply_platform_env(compilation_cache: bool = True):
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass
    if compilation_cache:
        enable_compilation_cache()
