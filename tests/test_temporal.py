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
