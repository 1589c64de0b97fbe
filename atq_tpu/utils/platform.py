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


def force_platform_from_argv(argv=None, flag="--device"):
    """Honor a CLI ``--device cpu`` choice BEFORE any JAX backend
    initializes (mirrors the reference's device flag,
    /root/reference/train_multimodal.py:826). Must run before anything
    that touches ``jax.default_backend()`` — including
    :func:`apply_platform_env`'s compilation-cache probe — because the
    axon plugin ignores a later ``JAX_PLATFORMS`` change once a backend
    exists. Only ``cpu`` forces a platform: TPU plugins register under
    plugin-specific names (e.g. 'axon' here), so ``--device tpu`` —
    like ``cuda``/``mps``, accepted for reference CLI compatibility —
    leaves the default (TPU-first) resolution order alone."""
    import sys

    argv = sys.argv[1:] if argv is None else argv

    def is_flag(token: str) -> bool:
        # argparse accepts unambiguous prefix abbreviations (--devic,
        # --devi, ...); honor them too, down to the shortest prefix that
        # is unambiguous in both CLIs ('--de': no other flag starts with
        # 'de' — --distill/--data_dir diverge at the third character).
        return (len(token) >= 4 and token.startswith("--de")
                and flag.startswith(token))

    dev = None
    for i, a in enumerate(argv):
        name, _, value = a.partition("=")
        if is_flag(name):
            dev = value if value else (
                argv[i + 1] if i + 1 < len(argv) else None)
    if dev == "cpu":
        os.environ["JAX_PLATFORMS"] = dev
        try:
            import jax

            jax.config.update("jax_platforms", dev)
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
