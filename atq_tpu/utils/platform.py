"""Platform selection helper.

Some TPU runtime plugins register themselves regardless of the
``JAX_PLATFORMS`` environment variable; calling
``jax.config.update('jax_platforms', ...)`` before backend initialization
makes the selection stick. CLIs call this first so
``JAX_PLATFORMS=cpu python train.py ...`` behaves as expected.
"""

from __future__ import annotations

import os


def apply_platform_env():
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass
