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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcvgan_tpu.models.layers import (
    Dtype,
    MaskedSyncBatchNorm,
    Noise,
    TimeStackConv3d,
    leaky_relu,
    norm_layer,
    same_pad_conv,
)


class _TimeShard:
    """Bookkeeping for a critic forward running inside shard_map with the
    video time axis sharded over the mesh ``time`` axis (SURVEY.md §5.7).

    Each time-valid conv (kt=4) needs a 3-frame halo from the right
    neighbor (``halo_exchange``, point-to-point ICI) and shrinks the number
    of *valid* global frames by 3; shards keep a static local extent and
    mask invalid tail outputs to zero. Garbage past ``valid_t`` can never
    contaminate a valid output: output frame t depends on inputs t..t+3
    only, all valid by construction.
    """

    def __init__(self, axis: str, t_local: int):
        from dcvgan_tpu.parallel.temporal import halo_exchange

        self._halo = halo_exchange
        self.axis = axis
        self.t_local = t_local
        idx = jax.lax.axis_index(axis)
        self.n = jax.lax.axis_size(axis)
        self.gpos = idx * t_local + jnp.arange(t_local)

    def mask(self, valid_t: int) -> jax.Array:
        return self.gpos < valid_t

    def conv(self, conv_mod: nn.Conv, x: jax.Array, valid_t: int):
        """Halo-extended time-valid conv; returns (masked y, new valid_t)."""
        if self.t_local < 3:
            raise ValueError(
                f"local time extent {self.t_local} < halo 3; use fewer "
                f"time shards"
            )
        xh = self._halo(x, self.axis, 3)
        y = conv_mod(xh)  # (B, t_local, H', W', C)
        new_valid = valid_t - 3
        m = self.mask(new_valid)
        return y * m[None, :, None, None, None].astype(y.dtype), new_valid

    def gather_valid(self, y: jax.Array, valid_t: int) -> jax.Array:
        """Gather the time axis and slice to the valid frames.

        Scatter-into-zeros + psum over the time axis rather than all_gather:
        the psum result is statically known to be replicated, so the
        enclosing shard_map's time-replicated out_spec type-checks."""
        idx = jax.lax.axis_index(self.axis)
        buf = jnp.zeros((y.shape[0], self.t_local * self.n) + y.shape[2:], y.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, y, idx * self.t_local, axis=1
        )
        return jax.lax.psum(buf, self.axis)[:, :valid_t]


class ImageDiscriminator(nn.Module):
    """Per-frame pair critic (reference /root/reference/src/discriminator.py:42-140)."""

    ch_g: int = 1
    ch_c: int = 3
    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    dtype: Dtype = jnp.float32
    # trainer.norm: "batch" (reference parity) or "group" (ChannelGroupNorm)
    norm: str = "batch"

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array, train: bool = True
    ) -> jax.Array:
        """(B, H, W, ch_g), (B, H, W, ch_c) -> logits (B, 4, 4).

        ``train`` gates only BatchNorm statistics (batch vs running); noise
        is a static flag in the reference, not train-gated. Training always
        passes True except under ``trainer.critic_stat_reuse``.
        """
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
        h = norm_layer(self.norm, train, self.dtype, "bn_1")(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = same_pad_conv(self.ndf * 4, 4, 2, self.dtype, "conv_2")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_2")(h)
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
    norm: str = "batch"
    # Set to the mesh "time" axis name to run time-sharded inside shard_map;
    # bn_sync_axes lists additional axes (e.g. "data") BN stats psum over so
    # statistics match the unsharded global-batch semantics.
    time_axis: Optional[str] = None
    bn_sync_axes: Tuple[str, ...] = ()

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array, train: bool = True
    ) -> jax.Array:
        """(B, T, H, W, ch) pair -> logits (B, T-12, 4, 4)."""
        conv3 = lambda f, name: TimeStackConv3d(
            features=f, dtype=self.dtype, torch_default_init=True, name=name
        )
        noise = lambda name: Noise(self.use_noise, self.noise_sigma, self.dtype, name=name)

        if self.time_axis is not None:
            return self._time_sharded(xg, xc, conv3, noise, train)

        # stems have no Noise layers (reference :180-192)
        hg = leaky_relu(conv3(self.ndf // 2, "conv_g")(xg))
        hc = leaky_relu(conv3(self.ndf // 2, "conv_c")(xc))
        h = jnp.concatenate([hc, hg], axis=-1)

        h = noise("noise_1")(h)
        h = conv3(self.ndf * 2, "conv_1")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_1", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = conv3(self.ndf * 4, "conv_2")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_2", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_3")(h)
        h = conv3(1, "conv_3")(h)
        return jnp.squeeze(h, axis=-1)  # (B, T', 4, 4)

    def _time_sharded(self, xg, xc, conv3, noise, train: bool) -> jax.Array:
        """Identical math with the T axis sharded over ``time_axis``; same
        parameter tree, so checkpoints are interchangeable."""
        ts = _TimeShard(self.time_axis, xg.shape[1])
        bn_axes = (self.time_axis,) + self.bn_sync_axes
        mbn = lambda name: MaskedSyncBatchNorm(
            bn_axes, dtype=self.dtype, torch_default_init=True, name=name
        )
        v = ts.t_local * ts.n  # static global T

        hg, _ = ts.conv(conv3(self.ndf // 2, "conv_g"), xg, v)
        hc, v = ts.conv(conv3(self.ndf // 2, "conv_c"), xc, v)
        h = jnp.concatenate([leaky_relu(hc), leaky_relu(hg)], axis=-1)

        h = noise("noise_1")(h)
        h, v = ts.conv(conv3(self.ndf * 2, "conv_1"), h, v)
        h = leaky_relu(mbn("bn_1")(h, ts.mask(v), train))

        h = noise("noise_2")(h)
        h, v = ts.conv(conv3(self.ndf * 4, "conv_2"), h, v)
        h = leaky_relu(mbn("bn_2")(h, ts.mask(v), train))

        h = noise("noise_3")(h)
        h, v = ts.conv(conv3(1, "conv_3"), h, v)
        return jnp.squeeze(ts.gather_valid(h, v), axis=-1)  # (B, T', 4, 4)


class GradientDiscriminator(nn.Module):
    """Critic on temporal differences
    (reference /root/reference/src/discriminator.py:247-346)."""

    ch_g: int = 1
    ch_c: int = 3  # accepted-but-unused, mirroring the reference
    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    dtype: Dtype = jnp.float32
    norm: str = "batch"
    time_axis: Optional[str] = None
    bn_sync_axes: Tuple[str, ...] = ()

    @nn.compact
    def __call__(
        self, xg: jax.Array, xc: jax.Array | None = None, train: bool = True
    ) -> jax.Array:
        """(B, T, H, W, ch_g) geometry video -> logits (B, T-13, 4, 4).

        ``xc`` is ignored (dead code in the reference, :326-331).
        """
        del xc
        conv3 = lambda f, name: TimeStackConv3d(
            features=f, dtype=self.dtype, torch_default_init=True, name=name
        )
        noise = lambda name: Noise(self.use_noise, self.noise_sigma, self.dtype, name=name)

        if self.time_axis is not None:
            return self._time_sharded(xg, conv3, noise, train)

        # temporal gradient (reference :330-331)
        h = xg[:, 1:] - xg[:, :-1]

        h = noise("noise_1")(h)
        h = conv3(self.ndf, "conv_1")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_1", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_2")(h)
        h = conv3(self.ndf * 2, "conv_2")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_2", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_3")(h)
        h = conv3(self.ndf * 4, "conv_3")(h)
        h = norm_layer(self.norm, train, self.dtype, "bn_3", torch_default_init=True)(h)
        h = leaky_relu(h)

        h = noise("noise_4")(h)
        h = conv3(1, "conv_4")(h)
        return jnp.squeeze(h, axis=-1)  # (B, T'', 4, 4)

    def _time_sharded(self, xg, conv3, noise, train: bool) -> jax.Array:
        from dcvgan_tpu.parallel.temporal import halo_exchange

        ts = _TimeShard(self.time_axis, xg.shape[1])
        bn_axes = (self.time_axis,) + self.bn_sync_axes
        mbn = lambda name: MaskedSyncBatchNorm(
            bn_axes, dtype=self.dtype, torch_default_init=True, name=name
        )

        # temporal gradient via a 1-frame halo: local diffs for global
        # positions [idx*t_local, idx*t_local + t_local); the last global
        # frame has no successor -> valid shrinks by 1
        xh = halo_exchange(xg, self.time_axis, 1)
        h = xh[:, 1:] - xh[:, :-1]
        v = ts.t_local * ts.n - 1
        h = h * ts.mask(v)[None, :, None, None, None].astype(h.dtype)

        h = noise("noise_1")(h)
        h, v = ts.conv(conv3(self.ndf, "conv_1"), h, v)
        h = leaky_relu(mbn("bn_1")(h, ts.mask(v), train))

        h = noise("noise_2")(h)
        h, v = ts.conv(conv3(self.ndf * 2, "conv_2"), h, v)
        h = leaky_relu(mbn("bn_2")(h, ts.mask(v), train))

        h = noise("noise_3")(h)
        h, v = ts.conv(conv3(self.ndf * 4, "conv_3"), h, v)
        h = leaky_relu(mbn("bn_3")(h, ts.mask(v), train))

        h = noise("noise_4")(h)
        h, v = ts.conv(conv3(1, "conv_4"), h, v)
        return jnp.squeeze(ts.gather_valid(h, v), axis=-1)  # (B, T'', 4, 4)
