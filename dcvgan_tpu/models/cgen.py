"""Color video generator — per-frame U-Net colorizer.

Reference: ``ColorVideoGenerator`` (/root/reference/src/generator.py:158-448).
Geometry frames are translated to RGB conditioned on one per-video color
latent concatenated at the 1×1 bottleneck. Six down blocks
(conv k4 s2 p1 + BN + LeakyReLU 0.2), six up blocks (conv-transpose k4 s2 p1
+ BN [+ channel dropout 0.5 on the first two] + ReLU) with skip connections,
``Inconv`` = conv3×3 + LeakyReLU(0.01), ``Outconv`` = conv-transpose 3×3 +
tanh. Segmentation inputs are re-binarized to ±1 one-hot via argmax
(non-differentiable in the reference too — gradients to the geometry
generator flow only through the discriminators' geometry streams).

TPU-first: time folds into the batch so all B·T frames run as one 2D-conv
batch; dropout is flax channel-dropout (broadcast over H, W) to match torch
``Dropout2d``.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcvgan_tpu.models.layers import (
    Dtype,
    conv2d_kernel_init,
    fold_time,
    leaky_relu,
    norm_layer,
    same_pad_conv,
    unfold_time,
    up_conv,
)


class ColorVideoGenerator(nn.Module):
    in_ch: int = 1
    dim_z: int = 10
    geometric_info: str = "depth"
    ngf: int = 64
    video_length: int = 16
    image_size: int = 64
    dtype: Dtype = jnp.float32
    # trainer.norm: "batch" (reference parity) or "group" (ChannelGroupNorm)
    norm: str = "batch"

    out_ch: int = 3

    def _down_mults(self) -> List[int]:
        # 64px: [1, 2, 4, 4, 4, 4] — the reference's exact channel schedule
        # (/root/reference/src/generator.py:324-333); deeper for larger sizes.
        n_down = int(math.log2(self.image_size))
        return [1, 2] + [4] * (n_down - 2)

    @nn.compact
    def __call__(
        self, x: jax.Array, z: jax.Array, train: bool = True
    ) -> jax.Array:
        """Translate geometry frames ``(N, H, W, in_ch)`` + latents
        ``(N, dim_z)`` to RGB frames ``(N, H, W, 3)``
        (reference forward, /root/reference/src/generator.py:361-402)."""
        if self.geometric_info == "segmentation":
            # Re-binarize softmax maps to ±1 one-hot (argmax + scatter in the
            # reference, /root/reference/src/generator.py:378-385). argmax is
            # non-differentiable; stop_gradient reproduces torch exactly.
            idx = jnp.argmax(x, axis=-1)
            x = jax.lax.stop_gradient(
                jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype) * 2.0 - 1.0
            )

        down_mults = self._down_mults()
        n_blocks = len(down_mults)

        # Inconv: conv3×3 s1 p1 + LeakyReLU (torch default slope 0.01!)
        h = nn.Conv(
            self.ngf,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=conv2d_kernel_init,
            name="inconv",
        )(x)
        h = leaky_relu(h, 0.01)

        # Down path; keep every activation for skips.
        hs = [h]
        for i, mult in enumerate(down_mults):
            h = same_pad_conv(self.ngf * mult, 4, 2, self.dtype, f"down{i}_conv")(h)
            h = norm_layer(self.norm, train, self.dtype, f"down{i}_bn")(h)
            h = leaky_relu(h, 0.2)
            hs.append(h)

        # Bottleneck (1×1): concat color latent on channels.
        z_map = z.reshape((-1, 1, 1, z.shape[-1])).astype(self.dtype)
        h = jnp.concatenate([h, z_map], axis=-1)

        # Up path with skip connections. Reference up channel schedule for
        # 64px: [4, 4, 4, 2, 1, 1]·ngf (mirror of the down path).
        up_mults = list(reversed(down_mults[:-1])) + [1]
        for i, mult in enumerate(up_mults):
            if i > 0:
                h = jnp.concatenate([h, hs[n_blocks - i]], axis=-1)
            h = up_conv(self.ngf * mult, self.dtype, f"up{i}_conv")(h)
            h = norm_layer(self.norm, train, self.dtype, f"up{i}_bn")(h)
            if i < 2:
                # channel dropout between BN and activation
                # (torch Dropout2d(0.5); /root/reference/src/generator.py:246-248)
                h = nn.Dropout(
                    rate=0.5,
                    broadcast_dims=(1, 2),
                    deterministic=not train,
                    rng_collection="dropout",
                )(h)
            h = nn.relu(h)

        # Outconv: conv-transpose 3×3 s1 p1 + tanh on [up_out | inconv_out].
        h = jnp.concatenate([h, hs[0]], axis=-1)
        h = nn.ConvTranspose(
            self.out_ch,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            use_bias=False,
            transpose_kernel=True,
            dtype=self.dtype,
            kernel_init=conv2d_kernel_init,
            name="outconv",
        )(h)
        return jnp.tanh(h)

    def forward_videos(self, xs: jax.Array, train: bool = True) -> jax.Array:
        """Colorize geometry videos ``(B, T, H, W, in_ch)`` -> ``(B, T, H, W, 3)``.

        One color latent per video, repeated over T; time folded into batch
        (reference forward_videos, /root/reference/src/generator.py:404-435).
        Draws the latent from the "latent" PRNG stream.
        """
        b, t = xs.shape[0], xs.shape[1]
        z = jax.random.normal(
            self.make_rng("latent"), (b, self.dim_z), self.dtype
        )
        z = jnp.broadcast_to(z[:, None, :], (b, t, self.dim_z)).reshape(
            b * t, self.dim_z
        )
        ys = self(fold_time(xs), z, train=train)
        return unfold_time(ys, b)
