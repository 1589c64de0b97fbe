"""Test config: run everything on a virtual 8-device CPU mesh.

Must set platform flags before JAX initializes its backends, so this happens
at conftest import time (pytest imports conftest before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Zero-egress box: never stall tests on dataset download attempts.
os.environ["ATQ_NO_DOWNLOAD"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin can override JAX_PLATFORMS; force CPU explicitly
# before any backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REFERENCE_PATH = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference as a golden oracle (never copied)."""
    if not REFERENCE_PATH.exists():
        pytest.skip("reference implementation not available")
    sys.path.insert(0, str(REFERENCE_PATH))
    try:
        import atq.quantizers as ref_quantizers
        import atq.precision_boost as ref_pb
        import atq.layers as ref_layers
        import atq.bit_packing as ref_bp
        yield {
            "quantizers": ref_quantizers,
            "precision_boost": ref_pb,
            "layers": ref_layers,
            "bit_packing": ref_bp,
        }
    finally:
        sys.path.remove(str(REFERENCE_PATH))
