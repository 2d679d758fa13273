"""Temporal (sequence-parallel) sharding: halo exchange + sharded conv3d
match the unsharded computation exactly — run on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dcvgan_tpu.parallel.mesh import TIME_AXIS, create_mesh
from dcvgan_tpu.parallel.temporal import (
    _conv3d_local,
    halo_exchange,
    time_sharded_conv3d,
)


def make_inputs(t=16, cin=2, cout=4, kt=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, t, 8, 8, cin)).astype(np.float32)
    k = rng.normal(size=(kt, 3, 3, cin, cout)).astype(np.float32) * 0.1
    return jnp.asarray(x), jnp.asarray(k)


@pytest.mark.parametrize("nt", [2, 4])
def test_time_sharded_conv3d_matches_unsharded(devices, nt):
    mesh = create_mesh(data=8 // nt, time=nt)
    x, k = make_inputs()
    y_sharded, valid_t = time_sharded_conv3d(x, k, mesh, spatial_stride=2)
    y_ref = _conv3d_local(x, k, 2)
    assert valid_t == x.shape[1] - k.shape[0] + 1
    np.testing.assert_allclose(
        np.asarray(y_sharded)[:, :valid_t], np.asarray(y_ref), rtol=2e-5, atol=1e-5
    )
    # masked tail is exactly zero
    np.testing.assert_array_equal(np.asarray(y_sharded)[:, valid_t:], 0.0)


def test_halo_exchange_contents(devices):
    mesh = create_mesh(data=2, time=4)
    t, halo = 16, 3
    x = jnp.arange(t, dtype=jnp.float32).reshape(1, t, 1, 1, 1)
    x = jnp.broadcast_to(x, (2, t, 4, 4, 1))

    def f(x_local):
        return halo_exchange(x_local, TIME_AXIS, halo)

    out = jax.shard_map(
        f, mesh=mesh, in_specs=P(None, TIME_AXIS), out_specs=P(None, TIME_AXIS)
    )(x)
    out = np.asarray(out)  # (2, 4*(4+3)=28, 4, 4, 1)
    t_local = t // 4
    for shard in range(4):
        block = out[0, shard * (t_local + halo) : (shard + 1) * (t_local + halo), 0, 0, 0]
        own = np.arange(shard * t_local, (shard + 1) * t_local, dtype=np.float32)
        np.testing.assert_array_equal(block[:t_local], own)
        if shard < 3:
            np.testing.assert_array_equal(
                block[t_local:], own[-1] + 1 + np.arange(halo)
            )
        else:
            np.testing.assert_array_equal(block[t_local:], 0.0)


def test_halo_too_large_raises(devices):
    mesh = create_mesh(data=1, time=8)
    x, k = make_inputs(t=16)  # t_local=2 < kt-1=3
    with pytest.raises(ValueError, match="halo"):
        time_sharded_conv3d(x, k, mesh)


# ---------------------------------------------------------------------------
# time-sharded critics wired into the train step (VERDICT r1 #5)

def _ts_config(time: int):
    from dcvgan_tpu.config import ExperimentConfig

    cfg = ExperimentConfig.from_dict(
        {
            "batchsize": 2,
            "video_length": 16,
            "image_size": 32,
            "geometric_info": {"name": "depth", "channel": 1},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32", "donate_state": False},
            "mesh": {"data": 2, "time": time},
        }
    )
    cfg.validate()
    return cfg


def test_time_sharded_critic_forward_matches_unsharded(devices):
    """vdis/gdis logits with the time axis sharded 4-way equal the plain
    forward on the same params (valid frames only, masked sync BN)."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.parallel.mesh import create_mesh
    from dcvgan_tpu.train.step import DCVGAN

    cfg = _ts_config(time=4)
    gan = DCVGAN(cfg)
    mesh = create_mesh(cfg)
    state = gan.init_state(prng.base_key(0))

    rng = np.random.default_rng(3)
    xg = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32, 32, 1)).astype(np.float32))
    xc = jnp.asarray(rng.uniform(-1, 1, (2, 16, 32, 32, 3)).astype(np.float32))
    nkey = prng.base_key(9)

    for name, module in [("vdis", gan.vdis), ("gdis", gan.gdis)]:
        mstate = getattr(state, name)
        y_plain, mut = module.apply(
            {"params": mstate.params, "batch_stats": mstate.batch_stats},
            xg, xc, rngs={"noise": nkey}, mutable=["batch_stats"],
        )
        ts_apply = gan._time_sharded_apply(getattr(gan, f"{name}_ts"), mesh)
        y_ts, stats_ts = jax.jit(ts_apply)(
            mstate.params, mstate.batch_stats, xg, xc, nkey
        )
        assert y_ts.shape == y_plain.shape, name
        np.testing.assert_allclose(
            np.asarray(y_ts), np.asarray(y_plain), atol=2e-4, rtol=1e-3,
            err_msg=name,
        )
        # running stats advance identically (masked sync BN == plain BN)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
            ),
            stats_ts, mut["batch_stats"],
        )


def test_time_sharded_train_step_matches_unsharded(devices):
    """A full train step with mesh {data: 2, time: 4} produces the same
    losses and parameters as the unsharded step."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN

    cfg = _ts_config(time=4)
    gan = DCVGAN(cfg)
    mesh = create_mesh(cfg)
    state = gan.init_state(prng.base_key(0))

    rng = np.random.default_rng(1)
    batch = {
        "color": rng.uniform(-1, 1, (2, 16, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (2, 16, 32, 32, 1)).astype(np.float32),
    }
    key = prng.base_key(5)

    s_plain, m_plain = gan.jitted_train_step(state, jax.device_put(batch), key)
    ts_step = gan.time_sharded_train_step(mesh)
    s_ts, m_ts = ts_step(replicate(state, mesh), shard_batch(batch, mesh), key)

    for k in m_plain:
        assert float(m_plain[k]) == pytest.approx(float(m_ts[k]), rel=2e-4), k
    for name in ("vdis", "gdis", "ggen"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2
            ),
            getattr(s_plain, name).params, getattr(s_ts, name).params,
        )


def test_time_sharding_requires_sync_batchnorm(devices):
    from dcvgan_tpu.parallel.mesh import create_mesh
    from dcvgan_tpu.train.step import DCVGAN

    cfg = _ts_config(time=2)
    cfg.trainer.sync_batchnorm = False
    gan = DCVGAN(cfg)
    with pytest.raises(ValueError, match="sync_batchnorm"):
        gan.time_sharded_train_step(create_mesh(cfg))
