"""Real 2-process jax.distributed test of multihost_init (VERDICT r1 #4).

Spawns two clean Python processes (CPU backend, one device each) that
initialize through ``multihost_init`` from environment variables only, build
a 2-device mesh spanning both processes, assemble a global batch with
``shard_batch`` (the ``make_array_from_process_local_data`` path), and
reduce it under jit — exercising cross-process collectives end to end.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["DCVGAN_REPO"])

import jax

# this environment's sitecustomize force-selects the axon TPU platform at
# import; pin the virtual CPU platform (same escape hatch as conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from dcvgan_tpu.parallel.mesh import multihost_init

multihost_init()  # must run before any backend use

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dcvgan_tpu.parallel.mesh import create_mesh, shard_batch

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

mesh = create_mesh(data=2, batchsize=4)
pid = jax.process_index()
# each process contributes its local half of the global batch
local = {"x": np.full((2, 3), float(pid), np.float32)}
batch = shard_batch(local, mesh)
assert batch["x"].shape == (4, 3), batch["x"].shape

total = jax.jit(
    lambda x: jnp.sum(x),
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(batch["x"])
# halves are 0s (proc 0) and 1s (proc 1): global sum = 2*3 = 6
np.testing.assert_allclose(float(total), 6.0)
print(f"proc {pid} OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_collective():
    port = _free_port()
    env_base = {
        **os.environ,
        "DCVGAN_REPO": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        # one CPU device per process so the mesh truly spans processes
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    env_base.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER],
            env={**env_base, "JAX_PROCESS_ID": str(i)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_multihost_init_noop_without_multiprocess_env(monkeypatch):
    """Single-process: detection reads only the environment and does not
    trigger (the old version initialized the backend just to check)."""
    from dcvgan_tpu.parallel import mesh as m

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert m._multiprocess_launch_detected() is False
    m.multihost_init()  # no-op, no exception

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    assert m._multiprocess_launch_detected() is True


def test_multihost_init_raises_after_backend_init(monkeypatch):
    import jax

    from dcvgan_tpu.parallel import mesh as m

    jax.devices()  # ensure backend is up (conftest already forces CPU)
    assert m.xla_bridge_initialized()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    import pytest

    with pytest.raises(RuntimeError, match="after the JAX backend"):
        m.multihost_init()
