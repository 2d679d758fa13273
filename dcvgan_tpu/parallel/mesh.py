"""Device mesh, shardings, and multi-host initialization.

This is the rebuild's "communication backend" (SURVEY.md §2.5): a
``jax.sharding.Mesh`` whose ``data`` axis spans ICI, batch inputs sharded
over ``data``, parameters replicated, and XLA inserting the gradient
all-reduces — no hand-written NCCL/MPI analogue. A ``time`` axis is named
(size 1 today) so the 3D-conv critics can later shard the temporal axis
with halo exchange if ``video_length`` grows.

Under ``jit`` with a data-sharded batch, BatchNorm's batch-mean reductions
become global (cross-replica) statistics automatically — the
``sync_batchnorm`` config default. Per-replica statistics are available via
``shard_map`` around the step (axis_name plumbed through models/layers.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcvgan_tpu.config import ExperimentConfig

DATA_AXIS = "data"
TIME_AXIS = "time"
DCN_AXIS = "dcn"


def _multiprocess_launch_detected() -> bool:
    """True when env vars / cluster metadata indicate a multi-process launch
    jax.distributed can auto-configure from. Reads ONLY the environment —
    never the backend (which must not be initialized yet)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    try:  # recognized cluster envs: TPU pod metadata, SLURM, MPI, k8s
        from jax._src import clusters

        return any(
            c.is_env_present() for c in clusters.ClusterEnv._cluster_types
        )
    except Exception:  # pragma: no cover - private-API drift
        return False


def multihost_init() -> None:
    """Initialize multi-host JAX when launched under a multi-process runtime.

    Must run before ANY backend-initializing call (``jax.devices()``,
    ``jax.process_count()``, array creation, ...) — ``jax.distributed
    .initialize()`` is a no-op-too-late after backend init, which is why the
    detection above reads only the environment. Safe no-op for
    single-process runs and when already initialized.
    """
    if jax.distributed.is_initialized():
        return
    if not _multiprocess_launch_detected():
        return
    if xla_bridge_initialized():
        raise RuntimeError(
            "multihost_init() called after the JAX backend was initialized; "
            "call it first (before any jax.devices()/array use) or launch "
            "single-process"
        )
    # Launcher-agnostic explicit envs (for environments without recognized
    # cluster metadata): JAX_NUM_PROCESSES + JAX_PROCESS_ID alongside JAX's
    # standard JAX_COORDINATOR_ADDRESS. Cluster auto-detection fills
    # anything left unset.
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )


def xla_bridge_initialized() -> bool:
    """Whether any XLA backend has been created in this process."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - private-API drift
        return False


def _slice_groups(devices: np.ndarray, dcn: int) -> Optional[np.ndarray]:
    """Group devices by slice into a ``(dcn, per_slice)`` array.

    On real multi-slice TPU deployments each device carries a
    ``slice_index``; grouping by it keeps the ``data``/``time`` axes inside
    one slice (ICI) and only the ``dcn`` axis crossing the data-center
    network — the hybrid-mesh recipe (mesh_utils.create_hybrid_device_mesh
    does the same for its outer axes). Returns None when slice metadata is
    absent/uniform (single slice, CPU virtual devices): any order works
    because there is no ICI/DCN distinction to respect.
    """
    flat = devices.reshape(-1)
    try:
        slices = sorted({d.slice_index for d in flat})
    except AttributeError:
        return None
    if len(slices) <= 1:
        return None
    if len(slices) != dcn:
        raise ValueError(
            f"mesh dcn={dcn} but {len(slices)} device slices are visible; "
            f"the dcn axis must equal the slice count so data/time stay "
            f"on ICI"
        )
    by_slice = [[d for d in flat if d.slice_index == s] for s in slices]
    if len({len(g) for g in by_slice}) != 1:
        raise ValueError("slices expose unequal device counts")
    return np.asarray(by_slice)


def create_mesh(
    config: Optional[ExperimentConfig] = None,
    data: Optional[int] = None,
    time: Optional[int] = None,
    devices=None,
    batchsize: Optional[int] = None,
    dcn: Optional[int] = None,
) -> Mesh:
    """Build the (data, time) mesh — or (dcn, data, time) for multi-slice.

    ``data=-1`` -> all devices / (dcn*time); when ``batchsize`` is given, the
    data axis shrinks to the largest divisor of the batch (tiny debug batches
    on big hosts use a device subset rather than failing the shard).
    ``dcn>1`` names an outermost batch-parallel axis intended to span pod
    slices: on hardware exposing ``slice_index`` the device order is
    regrouped so each dcn coordinate is one slice.
    """
    if config is not None:
        # explicit argument wins over the config, for every axis
        data = config.mesh.data if data is None else data
        time = config.mesh.time if time is None else time
        dcn = config.mesh.dcn if dcn is None else dcn
        batchsize = config.batchsize if batchsize is None else batchsize
    if time is None:
        time = 1
    if dcn is None:
        dcn = 1
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None or data == -1:
        if n % (dcn * time):
            raise ValueError(
                f"{n} devices not divisible by dcn*time={dcn * time}"
            )
        data = n // (dcn * time)
        if batchsize is not None:
            while data > 1 and batchsize % (dcn * data):
                data -= 1
    if dcn * data * time > n:
        raise ValueError(
            f"mesh {dcn}x{data}x{time} exceeds {n} visible devices"
        )
    if batchsize is not None and batchsize % (dcn * data):
        raise ValueError(
            f"batchsize {batchsize} not divisible by batch-parallel mesh "
            f"size dcn*data={dcn * data}"
        )
    if dcn == 1:
        used = devices.reshape(-1)[: data * time]
        return Mesh(used.reshape(data, time), (DATA_AXIS, TIME_AXIS))
    used = _select_dcn_devices(devices, dcn, data * time)
    return Mesh(
        used.reshape(dcn, data, time), (DCN_AXIS, DATA_AXIS, TIME_AXIS)
    )


def _select_dcn_devices(devices: np.ndarray, dcn: int, per_slice: int) -> np.ndarray:
    """Pick ``dcn * per_slice`` devices honoring slice boundaries.

    With slice metadata, the subset must come from EVERY slice (``per_slice``
    devices out of each), never the head of the flat slice-grouped order —
    that would stack multiple dcn coordinates inside slice 0 (idling the
    other slices) or straddle data-axis rows across the slice boundary
    (putting per-step ICI collectives on DCN).
    """
    groups = _slice_groups(devices, dcn)
    if groups is None:
        return devices.reshape(-1)[: dcn * per_slice]
    if groups.shape[1] < per_slice:
        raise ValueError(
            f"dcn mesh needs {per_slice} devices per slice but slices "
            f"expose {groups.shape[1]}"
        )
    return groups[:, :per_slice].reshape(-1)


def data_axes(mesh: Mesh) -> tuple:
    """The batch-parallel axis names of this mesh, outermost first."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def batch_size_divisor(mesh: Mesh) -> int:
    """Total batch-parallel ways (what per-step batches must divide by)."""
    size = 1
    for a in data_axes(mesh):
        size *= mesh.shape[a]
    return size


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis sharded over the batch-parallel axes
    ((dcn, data) for multi-slice meshes, data otherwise)."""
    return NamedSharding(mesh, P(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch dict onto the mesh, sharded over ``data``.

    For multi-host: each process provides its local shard (see
    ``VideoLoader(process_index=...)``); single-host: the full batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)
