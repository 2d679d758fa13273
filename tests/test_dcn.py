"""Multi-slice (DCN) mesh tests on the virtual 8-device CPU mesh.

The ``dcn`` axis is the outermost batch-parallel tier — replicas on
different pod slices joined by data-center network (SURVEY.md §2.5
"communication backend": ``dcn`` axis for multi-slice). These tests pin the
semantics the real deployment relies on: batches shard over (dcn, data),
sync-BN math is unchanged by the extra axis, and the per-replica path
pmean's over both axes so parameters stay replica-identical.
"""

import jax
import numpy as np
import pytest

from dcvgan_tpu import prng
from dcvgan_tpu.config import ConfigError
from dcvgan_tpu.parallel.mesh import (
    batch_sharding,
    batch_size_divisor,
    create_mesh,
    data_axes,
    replicate,
    shard_batch,
)
from dcvgan_tpu.train.step import DCVGAN
from tests.test_parallel import T, S, dp_config


def test_dcn_mesh_shapes(devices):
    mesh = create_mesh(dcn=2, data=4)
    assert mesh.devices.shape == (2, 4, 1)
    assert mesh.axis_names == ("dcn", "data", "time")
    assert data_axes(mesh) == ("dcn", "data")
    assert batch_size_divisor(mesh) == 8
    # auto data axis divides the remaining devices
    assert create_mesh(dcn=2, data=-1).devices.shape == (2, 4, 1)
    assert create_mesh(dcn=4, data=-1).devices.shape == (4, 2, 1)
    # dcn=1 keeps the legacy 2-axis mesh (no spurious axis in specs)
    legacy = create_mesh(data=-1)
    assert legacy.axis_names == ("data", "time")
    assert data_axes(legacy) == ("data",)
    assert batch_size_divisor(legacy) == 8
    # batch must divide dcn*data
    with pytest.raises(ValueError):
        create_mesh(dcn=2, data=4, batchsize=4)
    with pytest.raises(ValueError):
        create_mesh(dcn=16, data=1)


def test_dcn_config_plumbs_through(devices):
    cfg = dp_config()
    cfg.mesh.dcn = 2
    cfg.mesh.data = 2
    assert create_mesh(cfg).devices.shape == (2, 2, 1)
    # explicit argument wins over the config
    assert create_mesh(cfg, dcn=1).devices.shape == (2, 1)
    cfg.mesh.dcn = 0
    with pytest.raises(ConfigError):
        cfg.validate()


def test_dcn_shard_batch(devices):
    mesh = create_mesh(dcn=2, data=4)
    batch = {"color": np.zeros((8, 4, 8, 8, 3), np.float32)}
    arr = shard_batch(batch, mesh)["color"]
    assert arr.sharding == batch_sharding(mesh)
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape[0] == 1


def test_dcn_sync_bn_matches_single_device(devices):
    """Under jit, the (dcn, data) sharding is a layout choice, not a math
    change: losses equal the single-device step."""
    mesh = create_mesh(dcn=2, data=4)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    rng = np.random.default_rng(7)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    key = prng.base_key(5)
    _, m_single = gan.jitted_train_step(state, jax.device_put(batch), key)
    _, m_dcn = gan.jitted_train_step(
        replicate(state, mesh), shard_batch(batch, mesh), key
    )
    for k in m_single:
        assert float(m_single[k]) == pytest.approx(float(m_dcn[k]), rel=2e-4), k


def test_dcn_per_replica_step_matches_flat_data_mesh(devices):
    """The per-replica shard_map step over (dcn=2, data=4) sees the same 8
    shards in the same device order as over (data=8) — identical metrics,
    with gradients pmean'd over BOTH axes so params stay replica-identical."""
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    rng = np.random.default_rng(3)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    key = prng.base_key(9)

    flat = create_mesh(data=-1)
    dcn = create_mesh(dcn=2, data=4)
    _, m_flat = gan.sharded_train_step(flat)(
        replicate(state, flat), shard_batch(batch, flat), key
    )
    new_state, m_dcn = gan.sharded_train_step(dcn)(
        replicate(state, dcn), shard_batch(batch, dcn), key
    )
    for k in m_flat:
        assert float(m_flat[k]) == pytest.approx(float(m_dcn[k]), rel=2e-4), k
    assert int(new_state.step) == 1
    changed = any(
        not np.allclose(b, a)
        for b, a in zip(
            jax.tree.leaves(state.idis.params),
            jax.tree.leaves(new_state.idis.params),
        )
    )
    assert changed


def test_dcn_with_time_sharding_rejected(devices):
    mesh = create_mesh(dcn=2, data=2, time=2)
    assert mesh.devices.shape == (2, 2, 2)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    with pytest.raises(NotImplementedError):
        gan.time_sharded_train_step(mesh)


def test_dcn_device_subset_spans_every_slice():
    """Regression: with slice metadata, a device subset must take data*time
    devices from EACH slice — taking the head of the flat slice-grouped
    order stacks both dcn coordinates inside slice 0 and idles slice 1."""
    from dcvgan_tpu.parallel.mesh import _select_dcn_devices

    class FakeDev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

        def __repr__(self):
            return f"d{self.id}@s{self.slice_index}"

    devs = np.asarray([FakeDev(i, i // 4) for i in range(8)])  # 2 slices x 4

    used = _select_dcn_devices(devs, dcn=2, per_slice=2)  # e.g. data=2, time=1
    assert [d.slice_index for d in used] == [0, 0, 1, 1]
    # dcn row i must be entirely on slice i after the (dcn, data, time) reshape
    rows = used.reshape(2, 2)
    assert {d.slice_index for d in rows[0]} == {0}
    assert {d.slice_index for d in rows[1]} == {1}

    # full use keeps every device, grouped by slice
    full = _select_dcn_devices(devs, dcn=2, per_slice=4)
    assert [d.slice_index for d in full] == [0] * 4 + [1] * 4

    # asking for more per slice than a slice has must fail loudly
    with pytest.raises(ValueError):
        _select_dcn_devices(devs, dcn=2, per_slice=5)

    # no slice metadata (CPU virtual devices): plain head-of-list subset
    plain = np.asarray(list(range(8)))
    assert list(_select_dcn_devices(plain, dcn=2, per_slice=2)) == [0, 1, 2, 3]
