"""Data-parallel tests on the virtual 8-device CPU mesh — the multi-device
coverage the reference cannot have (SURVEY.md §2.5: no distributed layer).
"""

import jax
import numpy as np
import pytest

from dcvgan_tpu import prng
from dcvgan_tpu.config import ExperimentConfig
from dcvgan_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from dcvgan_tpu.train.step import DCVGAN

T, S = 16, 32


def dp_config(batchsize=8):
    cfg = ExperimentConfig.from_dict(
        {
            "batchsize": batchsize,
            "video_length": T,
            "image_size": S,
            "geometric_info": {"name": "depth", "channel": 1},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32", "donate_state": False},
        }
    )
    cfg.validate()
    return cfg


def test_create_mesh_shapes(devices):
    mesh = create_mesh(data=-1)
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "time")
    mesh2 = create_mesh(data=4, time=2)
    assert mesh2.devices.shape == (4, 2)
    # device-subset mesh for small data axes
    assert create_mesh(data=3, time=1).devices.shape == (3, 1)
    with pytest.raises(ValueError):
        create_mesh(data=9, time=1)
    # auto data axis respects batch divisibility
    assert create_mesh(data=-1, batchsize=2).devices.shape == (2, 1)
    assert create_mesh(data=-1, batchsize=6).devices.shape == (6, 1)
    with pytest.raises(ValueError):
        create_mesh(data=8, batchsize=2)


def test_shard_batch_places_on_data_axis(devices):
    mesh = create_mesh(data=-1)
    batch = {"color": np.zeros((8, 4, 8, 8, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    arr = sharded["color"]
    assert arr.sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    assert arr.addressable_shards[0].data.shape[0] == 1


def test_dp_train_step_runs_and_replicates(devices):
    """Full five-model train step over an 8-way data-parallel mesh."""
    mesh = create_mesh(data=-1)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = replicate(gan.init_state(prng.base_key(0)), mesh)

    rng = np.random.default_rng(0)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    device_batch = shard_batch(batch, mesh)
    new_state, metrics = gan.jitted_train_step(state, device_batch, prng.base_key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params stay replicated (one shard spanning all devices)
    leaf = jax.tree.leaves(new_state.ggen.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device_loss(devices):
    """DP sharding must not change the math: losses equal (atol fp) whether
    the batch is sharded over 8 devices or lives on one."""
    mesh = create_mesh(data=-1)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))

    rng = np.random.default_rng(1)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    key = prng.base_key(5)

    _, m_single = gan.jitted_train_step(state, jax.device_put(batch), key)
    state_r = replicate(state, mesh)
    _, m_dp = gan.jitted_train_step(state_r, shard_batch(batch, mesh), key)
    for k in m_single:
        assert float(m_single[k]) == pytest.approx(float(m_dp[k]), rel=2e-4), k


def test_per_replica_bn_step_runs(devices):
    """shard_map per-replica-BN step: finite losses, replicated params."""
    mesh = create_mesh(data=-1)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = replicate(gan.init_state(prng.base_key(0)), mesh)
    rng = np.random.default_rng(0)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    step_fn = gan.sharded_train_step(mesh)
    new_state, metrics = step_fn(state, shard_batch(batch, mesh), prng.base_key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # params updated and replica-identical (single logical array)
    changed = any(
        not np.allclose(b, a)
        for b, a in zip(
            jax.tree.leaves(state.idis.params),
            jax.tree.leaves(new_state.idis.params),
        )
    )
    assert changed


def test_per_replica_step_keeps_ema_replicated(devices):
    """With trainer.ema_decay > 0, the shard_map per-replica step must keep
    the generator EMA replica-identical (params are pmean'd, so the EMA
    update needs no collective of its own) and advance it."""
    mesh = create_mesh(data=-1)
    cfg = dp_config(batchsize=8)
    cfg.trainer.ema_decay = 0.5
    gan = DCVGAN(cfg)
    state = replicate(gan.init_state(prng.base_key(0)), mesh)
    assert state.ema is not None
    rng = np.random.default_rng(2)
    batch = {
        "color": rng.uniform(-1, 1, (8, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32),
    }
    step_fn = gan.sharded_train_step(mesh)
    new_state, _ = step_fn(state, shard_batch(batch, mesh), prng.base_key(0))
    leaf = jax.tree.leaves(new_state.ema)[0]
    assert leaf.sharding.is_fully_replicated
    # ema == 0.5*init + 0.5*new_params, leafwise
    for e, p0, p1 in zip(
        jax.tree.leaves(new_state.ema["ggen"]),
        jax.tree.leaves(state.ema["ggen"]),
        jax.tree.leaves(new_state.ggen.params),
    ):
        np.testing.assert_allclose(
            np.asarray(e), 0.5 * np.asarray(p0) + 0.5 * np.asarray(p1),
            atol=1e-6,
        )


def test_per_replica_vs_global_bn_differ(devices):
    """The BN-semantics switch is real: per-replica statistics produce
    different losses than global-batch statistics on heterogeneous shards."""
    mesh = create_mesh(data=-1)
    cfg = dp_config(batchsize=8)
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    rng = np.random.default_rng(0)
    # strongly heterogeneous shards: per-replica stats differ from global
    color = np.concatenate(
        [np.full((4, T, S, S, 3), -0.9, np.float32),
         np.full((4, T, S, S, 3), 0.9, np.float32)]
    )
    color += rng.uniform(-0.05, 0.05, color.shape).astype(np.float32)
    depth = rng.uniform(-1, 1, (8, T, S, S, 1)).astype(np.float32)
    batch = {"color": color, "depth": depth}
    key = prng.base_key(3)

    _, m_global = gan.jitted_train_step(
        replicate(state, mesh), shard_batch(batch, mesh), key
    )
    _, m_local = gan.sharded_train_step(mesh)(
        replicate(state, mesh), shard_batch(batch, mesh), key
    )
    diffs = [
        abs(float(m_global[k]) - float(m_local[k])) for k in m_global
    ]
    assert max(diffs) > 1e-4, "per-replica BN should differ from global BN"


def test_create_mesh_explicit_time_one_overrides_config(devices):
    """time=1 must be honored as an explicit argument, not read as 'unset'
    (ADVICE r2: the old time==1 sentinel silently took the config value)."""
    cfg = dp_config()
    cfg.mesh.data = 2
    cfg.mesh.time = 2
    assert create_mesh(cfg).devices.shape == (2, 2)
    assert create_mesh(cfg, time=1).devices.shape == (2, 1)
    assert create_mesh(cfg, time=4).devices.shape == (2, 4)
