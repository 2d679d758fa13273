"""Correctness of the fused normalize+LeakyReLU+conv4x4s2 Pallas prototype
(`ops/fused_block.py`) against the straight XLA emission it competes with.

Reference op: BatchNorm2d + LeakyReLU -> Conv2d(4,2,1)
(/root/reference/src/generator.py:200-216, discriminator.py:91-102).
Runs in Pallas interpret mode on the CPU mesh; the TPU-compiled timing
comparison lives in tools/bench_fused_block.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvgan_tpu.ops.fused_block import (
    fused_norm_act_conv,
    pack_weights,
    reference_norm_act_conv,
)


def _case(b, h, w, c, cout, seed=0, dtype=jnp.float32):
    k = jax.random.PRNGKey(seed)
    kx, kw_, ks, kb = jax.random.split(k, 4)
    x = jax.random.normal(kx, (b, h, w, c), dtype)
    w4 = (jax.random.normal(kw_, (4, 4, c, cout), dtype) * 0.1).astype(dtype)
    scale = jax.random.uniform(ks, (c,), jnp.float32, 0.5, 1.5)
    shift = jax.random.normal(kb, (c,), jnp.float32) * 0.2
    return x, scale, shift, w4


@pytest.mark.parametrize(
    "b,h,w,c,cout",
    [(2, 64, 64, 8, 16), (3, 32, 32, 16, 32), (1, 16, 16, 4, 8)],
)
def test_fused_matches_xla(b, h, w, c, cout):
    x, scale, shift, w4 = _case(b, h, w, c, cout)
    want = reference_norm_act_conv(x, scale, shift, w4)
    got = fused_norm_act_conv(x, scale, shift, pack_weights(w4), interpret=True)
    assert got.shape == (b, h // 2, w // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_negative_slope_and_affine():
    # distinct slope + a shift large enough that the activation actually
    # branches, so a normalize-ordering bug cannot cancel out
    x, scale, shift, w4 = _case(2, 32, 32, 8, 8, seed=3)
    shift = shift + 1.0
    want = reference_norm_act_conv(x, scale, shift, w4, negative_slope=0.01)
    got = fused_norm_act_conv(
        x, scale, shift, pack_weights(w4), negative_slope=0.01, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_pack_weights_layout():
    w4 = jnp.arange(4 * 4 * 2 * 3, dtype=jnp.float32).reshape(4, 4, 2, 3)
    packed = pack_weights(w4)
    assert packed.shape == (12, 4, 3)
    z = np.zeros((2, 3), np.float32)
    w = np.asarray(w4)
    for kh in range(4):
        # A: own-pair taps kw=1,2; B: [0; kw=0]; C: [kw=3; 0]
        np.testing.assert_array_equal(
            np.asarray(packed[3 * kh + 0]), np.concatenate([w[kh, 1], w[kh, 2]])
        )
        np.testing.assert_array_equal(
            np.asarray(packed[3 * kh + 1]), np.concatenate([z, w[kh, 0]])
        )
        np.testing.assert_array_equal(
            np.asarray(packed[3 * kh + 2]), np.concatenate([w[kh, 3], z])
        )


def test_odd_spatial_rejected():
    x, scale, shift, w4 = _case(1, 16, 16, 4, 8)
    with pytest.raises(ValueError):
        fused_norm_act_conv(
            x[:, :15], scale, shift, pack_weights(w4), interpret=True
        )
