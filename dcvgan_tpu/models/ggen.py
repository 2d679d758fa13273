"""Geometric-information video generator.

Reference: ``GeometricVideoGenerator`` (/root/reference/src/generator.py:11-155).
Per-video latents: a content code drawn once and repeated over time, plus a
motion code evolved by a GRU fed fresh N(0,1) noise each frame from a random
initial state (/root/reference/src/generator.py:84-116). Frames are decoded
independently by a transposed-conv stack (dim_z -> 8·ngf 4×4 -> … -> channel
at image_size), head = tanh (or softmax over classes for segmentation).

TPU-first design choices:

- the GRU unroll is a single ``lax.scan`` over time (the reference runs a
  Python loop of 16 sequential GRUCell calls — SURVEY.md §3.1 hot loop #2),
- time is folded into the batch for the decoder, so all conv-transpose work
  is one large MXU-friendly batch of B·T frames,
- the first "4×4 ConvTranspose, VALID" stage on a 1×1 input is exactly a
  dense (dim_z -> 4·4·8ngf) matmul; we keep the conv form (XLA lowers it to
  the same GEMM) so weight layouts stay conv-shaped,
- image_size is a parameter (the reference hardcodes 64 at
  /root/reference/src/generator.py:136-139); 64 reproduces the reference
  stack exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcvgan_tpu.models.layers import (
    ChannelGroupNorm,
    Dtype,
    bn2d_scale_init,
    conv2d_kernel_init,
    uniform_symmetric_init,
    unfold_time,
    up_conv,
)


class GeometricVideoGenerator(nn.Module):
    dim_z_content: int = 40
    dim_z_motion: int = 10
    channel: int = 1
    geometric_info: str = "depth"
    ngf: int = 64
    video_length: int = 16
    image_size: int = 64
    dtype: Dtype = jnp.float32
    # trainer.norm: "batch" (reference parity) or "group" (ChannelGroupNorm)
    norm: str = "batch"

    @property
    def dim_z(self) -> int:
        return self.dim_z_content + self.dim_z_motion

    def setup(self):
        # torch GRUCell default init: U(±1/sqrt(hidden)) for weights & biases.
        bound = 1.0 / math.sqrt(self.dim_z_motion)
        self.recurrent = nn.RNN(
            nn.GRUCell(
                features=self.dim_z_motion,
                kernel_init=uniform_symmetric_init(bound),
                recurrent_kernel_init=uniform_symmetric_init(bound),
                bias_init=uniform_symmetric_init(bound),
                dtype=self.dtype,
            ),
        )

        n_up = int(math.log2(self.image_size // 4))  # strided stages after 4×4
        self.n_up = n_up
        ups = []
        bns = []
        # dim_z -> 8·ngf at 4×4 (torch ConvTranspose2d(k=4, s=1, p=0) on 1×1),
        # then doubling resolution each stage with channel multipliers
        # min(8, 2^k) down to 1 (64px: 4, 2, 1 — the reference schedule).
        # transpose_kernel=True throughout: exact torch ConvTranspose2d
        # adjoint semantics, so reference checkpoints import as transposes
        # (see models/layers.py up_conv).
        ups.append(
            nn.ConvTranspose(
                features=self.ngf * 8,
                kernel_size=(4, 4),
                strides=(1, 1),
                padding="VALID",
                use_bias=False,
                transpose_kernel=True,
                dtype=self.dtype,
                kernel_init=conv2d_kernel_init,
            )
        )
        for i in range(n_up - 1):
            mult = min(8, 2 ** (n_up - 2 - i))
            ups.append(up_conv(self.ngf * mult, self.dtype))
        for _ in range(n_up):
            if self.norm == "group":
                bns.append(ChannelGroupNorm(dtype=self.dtype))
            else:
                bns.append(
                    nn.BatchNorm(
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        scale_init=bn2d_scale_init,
                        bias_init=nn.initializers.zeros,
                    )
                )
        # final stage to output channels at full resolution
        ups.append(up_conv(self.channel, self.dtype))
        self.ups = ups
        self.bns = bns

    # ------------------------------------------------------------- latents
    def sample_latents(self, batchsize: int) -> jax.Array:
        """Draw per-frame latents ``(B, T, dim_z)`` = [content | motion].

        Content: one draw per video, repeated over T
        (reference sample_z_content, /root/reference/src/generator.py:103-108).
        Motion: GRU(h_{t-1}, e_t) with e_t ~ N(0,1), h_0 ~ N(0,1)
        (reference sample_z_m, /root/reference/src/generator.py:90-101),
        scanned over time.
        """
        t = self.video_length
        key = self.make_rng("latent")
        k_content, k_noise, k_init = jax.random.split(key, 3)

        z_c = jax.random.normal(
            k_content, (batchsize, self.dim_z_content), self.dtype
        )
        z_c = jnp.broadcast_to(z_c[:, None, :], (batchsize, t, self.dim_z_content))

        e = jax.random.normal(
            k_noise, (batchsize, t, self.dim_z_motion), self.dtype
        )
        h0 = jax.random.normal(
            k_init, (batchsize, self.dim_z_motion), self.dtype
        )
        z_m = self.recurrent(e, initial_carry=h0)  # (B, T, dm) via lax.scan

        return jnp.concatenate([z_c, z_m], axis=-1)

    # ------------------------------------------------------------- decoder
    def decode(self, z: jax.Array, train: bool = True) -> jax.Array:
        """Decode per-frame latents ``(N, dim_z)`` to frames
        ``(N, image_size, image_size, channel)``."""
        x = z.reshape((-1, 1, 1, z.shape[-1]))
        for i in range(self.n_up):
            x = self.ups[i](x)
            if self.norm == "group":
                x = self.bns[i](x)  # no batch statistics, no train duality
            else:
                x = self.bns[i](x, use_running_average=not train)
            x = nn.relu(x)
        x = self.ups[self.n_up](x)

        if self.geometric_info == "segmentation":
            x = jax.nn.softmax(x, axis=-1)
        else:
            x = jnp.tanh(x)
        return x

    def __call__(self, batchsize: int, train: bool = True) -> jax.Array:
        """Sample geometry videos ``(B, T, H, W, C)`` in [-1, 1]
        (reference sample_videos, /root/reference/src/generator.py:118-141)."""
        z = self.sample_latents(batchsize)  # (B, T, dim_z)
        frames = self.decode(z.reshape(-1, z.shape[-1]), train)  # (B*T, H, W, C)
        return unfold_time(frames, batchsize)
