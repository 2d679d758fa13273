"""The three critics: image, video, and temporal-gradient discriminators.

Reference: /root/reference/src/discriminator.py:42-346. All three are
two-input pair-critics over (geometry, color); layouts here are channels-last
(``(B, H, W, C)`` frames / ``(B, T, H, W, C)`` videos).

Faithful structural details (all load-bearing for training dynamics):

- ImageDiscriminator: two Noise+conv stems (geometry / color, ndf/2 each),
  concatenated **[color | geometry]**, then three Noise+conv+BN+LeakyReLU
  stages to a (B, 4, 4) logit map.
- VideoDiscriminator: same two-stream design with 3D convs (k=4, strides
  (1, 2, 2), time-valid padding), stems have **no** Noise layers; logits
  (B, 4, 4, 4) for T=16 (T: 16→13→10→7→4).
- GradientDiscriminator: critic over temporal differences x[1:] − x[:-1];
  the color input is accepted but ignored (dead two-stream code in the
  reference, /root/reference/src/discriminator.py:326-331); logits
  (B, 3, 4, 4) for T=16 (15→12→9→6→3).
- 3D convs and their BatchNorms keep torch-default init (the reference's
  init_weights only matches 2D layers — see models/layers.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcvgan_tpu.models.layers import (
    Dtype,
    Noise,
    batch_norm,
    leaky_relu,
    same_pad_conv,
)


class ImageDiscriminator(nn.Module):
    """Per-frame pair critic (reference /root/reference/src/discriminator.py:42-140)."""

    ch_g: int = 1
    ch_c: int = 3
    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array, train: bool = True
    ) -> jax.Array:
        """(B, H, W, ch_g), (B, H, W, ch_c) -> logits (B, 4, 4)."""
        del train  # noise is a static flag in the reference, not train-gated
        noise = lambda name: Noise(self.use_noise, self.noise_sigma, self.dtype, name=name)

        hg = noise("noise_g")(xg)
        hg = same_pad_conv(self.ndf // 2, 4, 2, self.dtype, "conv_g")(hg)
        hg = leaky_relu(hg)

        hc = noise("noise_c")(xc)
        hc = same_pad_conv(self.ndf // 2, 4, 2, self.dtype, "conv_c")(hc)
        hc = leaky_relu(hc)

        # concat order [color | geometry] (reference :124)
        h = jnp.concatenate([hc, hg], axis=-1)

        h = noise("noise_1")(h)
        h = same_pad_conv(self.ndf * 2, 4, 2, self.dtype, "conv_1")(h)
        h = batch_norm(True, self.dtype, "bn_1")(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = same_pad_conv(self.ndf * 4, 4, 2, self.dtype, "conv_2")(h)
        h = batch_norm(True, self.dtype, "bn_2")(h)
        h = leaky_relu(h)

        h = noise("noise_3")(h)
        h = same_pad_conv(1, 4, 2, self.dtype, "conv_3")(h)
        return jnp.squeeze(h, axis=-1)  # (B, 4, 4)


class VideoDiscriminator(nn.Module):
    """3D-conv pair critic (reference /root/reference/src/discriminator.py:143-244)."""

    ch_g: int = 1
    ch_c: int = 3
    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array, train: bool = True
    ) -> jax.Array:
        """(B, T, H, W, ch) pair -> logits (B, T-12, 4, 4)."""
        del train
        conv3 = lambda f, name: same_pad_conv(
            f, 4, 2, self.dtype, name, ndim=3, torch_default_init=True
        )
        noise = lambda name: Noise(self.use_noise, self.noise_sigma, self.dtype, name=name)

        # stems have no Noise layers (reference :180-192)
        hg = leaky_relu(conv3(self.ndf // 2, "conv_g")(xg))
        hc = leaky_relu(conv3(self.ndf // 2, "conv_c")(xc))
        h = jnp.concatenate([hc, hg], axis=-1)

        h = noise("noise_1")(h)
        h = conv3(self.ndf * 2, "conv_1")(h)
        h = batch_norm(True, self.dtype, "bn_1", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = conv3(self.ndf * 4, "conv_2")(h)
        h = batch_norm(True, self.dtype, "bn_2", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_3")(h)
        h = conv3(1, "conv_3")(h)
        return jnp.squeeze(h, axis=-1)  # (B, T', 4, 4)


class GradientDiscriminator(nn.Module):
    """Critic on temporal differences
    (reference /root/reference/src/discriminator.py:247-346)."""

    ch_g: int = 1
    ch_c: int = 3  # accepted-but-unused, mirroring the reference
    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array | None = None, train: bool = True
    ) -> jax.Array:
        """(B, T, H, W, ch_g) geometry video -> logits (B, T-13, 4, 4).

        ``xc`` is ignored (dead code in the reference, :326-331).
        """
        del xc, train
        conv3 = lambda f, name: same_pad_conv(
            f, 4, 2, self.dtype, name, ndim=3, torch_default_init=True
        )
        noise = lambda name: Noise(self.use_noise, self.noise_sigma, self.dtype, name=name)

        # temporal gradient (reference :330-331)
        h = xg[:, 1:] - xg[:, :-1]

        h = noise("noise_1")(h)
        h = conv3(self.ndf, "conv_1")(h)
        h = batch_norm(True, self.dtype, "bn_1", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = conv3(self.ndf * 2, "conv_2")(h)
        h = batch_norm(True, self.dtype, "bn_2", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_3")(h)
        h = conv3(self.ndf * 4, "conv_3")(h)
        h = batch_norm(True, self.dtype, "bn_3", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_4")(h)
        h = conv3(1, "conv_4")(h)
        return jnp.squeeze(h, axis=-1)  # (B, T'', 4, 4)
