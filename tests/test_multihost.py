"""Multi-host dress rehearsal: jax.distributed over two local processes.

The framework's multi-host entry point (atq_tpu/parallel/mesh.py
init_distributed) had never been exercised even in simulation. This test
launches TWO separate Python processes on localhost — a real
jax.distributed cluster, not a virtual mesh — each owning 4 CPU devices,
and runs a data-parallel jitted step over the global 8-device mesh with a
gradient psum, asserting both processes agree with the single-process
result.

Runs in the DEFAULT suite (VERDICT r3 next-step #8: the rehearsal must
not silently rot) — it is one jitted step and finishes in ~15-20 s.
``ATQ_MULTIHOST=0`` opts out (e.g. sandboxes that forbid localhost
sockets); the ``slow`` marker keeps it out of the fast gate.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["ATQ_REPO"])
from atq_tpu.parallel.mesh import init_distributed

coordinator = os.environ["ATQ_COORD"]
process_id = int(os.environ["ATQ_PROC_ID"])
init_distributed(coordinator_address=coordinator, num_processes=2,
                 process_id=process_id, local_device_ids=list(range(4)))

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))

# A dp "train step": per-shard loss grad + GSPMD-inserted psum, exactly the
# pattern the trainers rely on (replicated params, batch sharded on 'data').
w_host = np.linspace(-1.0, 1.0, 16 * 4, dtype=np.float32).reshape(16, 4)
x_host = np.arange(64 * 16, dtype=np.float32).reshape(64, 16) / 100.0
y_host = np.ones((64, 4), np.float32)

w = jax.device_put(jnp.asarray(w_host), NamedSharding(mesh, P()))
# Global batch from per-process shards, through the production input
# utility: each process loads ONLY its process_batch_slice rows and
# global_batch_from_local stitches them into one 'data'-sharded array.
from atq_tpu.parallel.multihost import (
    global_batch_from_local,
    process_batch_slice,
)

lo, hi = process_batch_slice(x_host.shape[0])
assert (hi - lo) == x_host.shape[0] // 2
x, y = global_batch_from_local((x_host[lo:hi], y_host[lo:hi]), mesh)
assert x.shape == x_host.shape  # global shape spans both processes


from functools import partial


@partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
def grad_step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)
    return jax.grad(loss)(w)

g = grad_step(w, x, y)
# replicated output -> every process holds a full addressable copy
g_local = np.asarray(jax.device_get(g))

expected = 2.0 / y_host.size * (x_host.T @ (x_host @ w_host - y_host))
np.testing.assert_allclose(g_local, expected, rtol=1e-5, atol=1e-6)
print(f"proc {process_id}: dp grad psum OK over {jax.device_count()} "
      "devices / 2 processes")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("ATQ_MULTIHOST") == "0",
                    reason="ATQ_MULTIHOST=0 opts out of the 2-process "
                           "jax.distributed rehearsal")
def test_two_process_dp_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "ATQ_COORD": coord,
            "ATQ_PROC_ID": str(pid),
            "ATQ_REPO": repo,
            # the axon plugin must not grab the backend in the workers
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "dp grad psum OK" in out, out


def test_multihost_helpers_single_process(monkeypatch):
    """Single-process degradation: process_batch_slice covers the whole
    batch and global_batch_from_local == shard_batch placement."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from atq_tpu.parallel import multihost
    from atq_tpu.parallel.mesh import make_mesh, shard_batch
    from atq_tpu.parallel.multihost import (
        global_batch_from_local,
        process_batch_slice,
    )

    lo, hi = process_batch_slice(16)
    assert (lo, hi) == (0, 16)

    # Simulate a 4-process cluster for the slicing arithmetic.
    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 2)
    assert process_batch_slice(16) == (8, 12)
    with pytest.raises(ValueError, match="not divisible"):
        process_batch_slice(7)
    monkeypatch.undo()

    mesh = make_mesh(dp=8)
    batch = (np.random.RandomState(0).randn(16, 4).astype(np.float32),
             np.arange(16, dtype=np.int32))
    got = global_batch_from_local(batch, mesh)
    want = shard_batch(batch, mesh)
    assert got[0].sharding.spec == P("data", None)
    assert got[1].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
