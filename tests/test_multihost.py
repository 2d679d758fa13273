"""Real 2-process jax.distributed test of multihost_init (VERDICT r1 #4).

Spawns two clean Python processes (CPU backend, one device each) that
initialize through ``multihost_init`` from environment variables only, build
a 2-device mesh spanning both processes, assemble a global batch with
``shard_batch`` (the ``make_array_from_process_local_data`` path), and
reduce it under jit — exercising cross-process collectives end to end.
"""

import json
import os
import socket
import subprocess
import sys
import time
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


# Full-stack multi-host leg (VERDICT r3 #3): the tiny 5-model train step on
# an 8-device mesh, batch decoded through the loader's per-host sharding and
# assembled via shard_batch's make_array_from_process_local_data path. The
# same script runs as 1 process x 8 devices and 2 processes x 4 devices;
# the parent asserts the losses are equal.
STEP_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["DCVGAN_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", int(os.environ["DCVGAN_LOCAL_DEVICES"]))

# NO persistent compile cache here: a cross-run cached executable can
# embed collective-rendezvous state that mismatches a freshly-compiled
# twin on the other process — observed as gloo context init dying with
# "GetKeyValue() timed out" on one side and "Connect timeout" on the
# other whenever one process hit cache and the other compiled. Cold
# compiles keep both processes bit-identical.

from dcvgan_tpu.parallel.mesh import multihost_init
multihost_init()  # no-op for the single-process leg

import numpy as np
from dcvgan_tpu import prng
from dcvgan_tpu.config import ExperimentConfig
from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.data.loader import VideoLoader
from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from dcvgan_tpu.train.step import DCVGAN

nproc = jax.process_count()
assert jax.device_count() == 8, jax.device_count()

raw = {
    "batchsize": 8,
    "video_length": 16,
    "image_size": 64,
    "geometric_info": {"name": "depth", "channel": 1},
    "trainer": {"precision": "float32", "donate_state": False},
    "mesh": {"data": 8, "time": 1},
    "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
    "cgen": {"dim_z_color": 4, "ngf": 8},
    "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
    "vdis": {"use_noise": False, "ndf": 8},
    "gdis": {"use_noise": False, "ndf": 8},
}
cfg = ExperimentConfig.from_dict(raw)
cfg.validate()

root = os.environ["DCVGAN_DATA"]
ds = VideoDataset(
    name="mock", preprocess_func=None, video_length=16, image_size=64,
    geometric_info="depth", extension="png", processed_root=root,
)
with VideoLoader(
    ds, batchsize=8, n_workers=2, seed=0, shuffle=True,
    process_index=jax.process_index(), process_count=nproc,
) as loader:
    batch = loader.fetch_batch(epoch=0)
assert batch["color"].shape[0] == 8 // nproc, batch["color"].shape

mesh = create_mesh(cfg)
gan = DCVGAN(cfg)


def barrier(name):
    # long-timeout rendezvous through the coordination service: on a
    # 1-core host the two workers' multi-minute compiles interleave with
    # arbitrary skew (uneven persistent-cache hits), while gloo's context
    # rendezvous inside a first collective execution times out after 30 s.
    # Compile-then-barrier-then-execute bounds execution skew to ms.
    if nproc > 1:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, 1200_000)


# establish the 8-device gloo clique with a tiny collective FIRST (seconds
# to compile), so the heavy step below reuses the existing context instead
# of paying the 30 s rendezvous at its own first execution
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as SP

warm = jax.jit(
    lambda x: jnp.sum(x),
    in_shardings=NamedSharding(mesh, SP("data")),
    out_shardings=NamedSharding(mesh, SP()),
).lower(jax.ShapeDtypeStruct((8,), jnp.float32)).compile()
barrier("dcvgan_warmup_compiled")
local_part = np.full((8 // nproc,), 1.0, np.float32)
warm_in = jax.make_array_from_process_local_data(
    NamedSharding(mesh, SP("data")), local_part
) if nproc > 1 else jax.device_put(
    np.ones((8,), np.float32), NamedSharding(mesh, SP("data"))
)
assert float(warm(warm_in)) == 8.0

state = replicate(gan.init_state(prng.base_key(0)), mesh)
device_batch = shard_batch(batch, mesh)  # multi-process: process-local path
compiled = gan.jitted_train_step.lower(
    state, device_batch, prng.base_key(0)
).compile()
barrier("dcvgan_step_compiled")
_, metrics = compiled(state, device_batch, prng.base_key(0))
print("METRICS " + json.dumps(
    {k: float(v) for k, v in sorted(metrics.items())}
), flush=True)
"""


def _run_step_leg(nproc: int, data_root, port=None):
    env_base = {
        **os.environ,
        "DCVGAN_REPO": str(REPO),
        "DCVGAN_DATA": str(data_root),
        "DCVGAN_LOCAL_DEVICES": str(8 // nproc),
        "JAX_PLATFORMS": "cpu",
        # pin gloo's pairwise TCP mesh to loopback: with the default
        # interface selection the 8-rank clique intermittently dies in
        # context init ("Connect timeout" on one side, a 30 s KV-store
        # timeout on the other) while the 2-rank clique works
        "GLOO_SOCKET_IFNAME": "lo",
    }
    env_base.pop("JAX_COORDINATOR_ADDRESS", None)
    if nproc > 1:
        env_base["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env_base["JAX_NUM_PROCESSES"] = str(nproc)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", STEP_WORKER],
            env=(
                {**env_base, "JAX_PROCESS_ID": str(i)} if nproc > 1 else env_base
            ),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    try:
        # shared deadline: per-proc timeouts would stack serially, and a
        # hung first proc must not leak its sibling (which would hold the
        # coordinator port through subsequent retries)
        deadline = time.monotonic() + 1500
        outs = [
            p.communicate(timeout=max(1.0, deadline - time.monotonic()))[0]
            for p in procs
        ]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    metrics = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}/{nproc} failed:\n{out}"
        line = [ln for ln in out.splitlines() if ln.startswith("METRICS ")]
        assert line, f"proc {i}/{nproc} printed no METRICS:\n{out}"
        metrics.append(json.loads(line[-1][len("METRICS "):]))
    return metrics


def test_two_process_train_step_matches_single_process(tmp_path):
    """2 procs x 4 devices must reproduce the 1 proc x 8 devices losses:
    same global batch through the loader's per-host slices (global-position
    crop RNG), same mesh, cross-process sync-BN/gradient collectives."""
    from dcvgan_tpu.data.mock import generate_mock_dataset

    root = tmp_path / "processed" / "mock" / "train"
    generate_mock_dataset(root)
    # 8 samples for a global batch of 8: repeat the 3 mock videos
    entries = [f"{1 + i % 3} 17" for i in range(8)]
    (root / "list.txt").write_text("\n".join(entries) + "\n")

    single = _run_step_leg(1, tmp_path / "processed")[0]
    double = _run_step_leg(2, tmp_path / "processed", port=_free_port())
    assert double[0].keys() == single.keys()
    # both processes observe identical (replicated) metrics
    for k in single:
        assert abs(double[0][k] - double[1][k]) < 1e-6, (k, double)
        # cross-topology: same math up to collective reduction order (f32)
        assert abs(double[0][k] - single[k]) < 5e-4 * max(1.0, abs(single[k])), (
            k, single[k], double[0][k],
        )


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
