"""Pallas prototype: stride-2 4x4 conv with a fused BatchNorm-normalize +
LeakyReLU *prologue* (VERDICT r2 #2 — prove or break the "Pallas conv
fusion is out-of-ROI" claim with a measurement).

Context (PERFORMANCE.md round-2 roofline): in the XLA emission of the
reference down-block chain

    conv -> BN stats (producer-fused) -> normalize+act (elementwise) -> conv

the normalized activation is materialized once (write) and read back by the
next conv; that traffic is the irreducible BN cost XLA cannot remove,
because convolutions cannot take fused elementwise prologues. This kernel
IS a conv with a fused prologue: it reads the *unnormalized* activation,
applies the affine normalize + LeakyReLU in VMEM as tiles stream in, and
runs the stride-2 conv as MXU matmuls — the normalized activation never
touches HBM.

Reference op being accelerated: the U-Net DownBlock / critic stage body
``Conv2d(cin, cout, 4, 2, 1)`` after ``BatchNorm2d + LeakyReLU``
(/root/reference/src/generator.py:200-216, discriminator.py:91-102).

TPU mapping (Mosaic rejects reshapes that fold sublanes into lanes, so the
column pairing happens OUTSIDE the kernel as a free row-major bitcast):

  - input arrives pre-paired as (B, H, W/2, 2C): adjacent columns stacked
    along channels; lane dim = 2C, never reshaped in-kernel,
  - normalize+act in VMEM with scale/shift tiled to 2C,
  - output pixel (i, j) contracts input cols 2j-1..2j+2, i.e. pair j-1
    slot 1 (kw=0), pair j (kw=1,2), pair j+1 slot 0 (kw=3): three matmul
    groups per kh against (2C, Cout) weight slabs (B/C slabs half-zero —
    1.5x the minimum MXU flops, the price of lane-aligned operands),
  - row taps 2i+kh-1 come from an even/odd row split (major-dim reshape)
    plus a sublane-aligned roll of the matmul *result* by one row-block;
    the +-1 column shifts are two unaligned rolls applied once per group
    at the end; frame/edge wraps are masked off.

Measured against XLA's normalize->conv emission by
tools/bench_fused_block.py; numbers recorded in PERFORMANCE.md (round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(x_ref, scale_ref, shift_ref, w_ref, o_ref, *, negative_slope):
    """FB frames per program.

    x_ref:     (FB, H, Wp, 2C)   pre-paired unnormalized activation
    scale_ref: (1, 2C)           gamma / sqrt(var + eps), tiled twice  (f32)
    shift_ref: (1, 2C)           beta - mean * scale, tiled twice      (f32)
    w_ref:     (12, 2C, Cout)    kernel repacked per (kh, group)       (x dtype)
    o_ref:     (FB, H/2, Wp, Cout)
    """
    fb, h, wp, c2 = x_ref.shape
    oh = h // 2
    cout = o_ref.shape[3]
    m = fb * oh * wp

    x = x_ref[...].astype(jnp.float32)
    xn = x * scale_ref[0] + shift_ref[0]
    xn = jnp.where(xn >= 0, xn, xn * negative_slope)
    xn = xn.astype(w_ref.dtype)

    # even/odd row split: (FB, H, Wp, 2C) -> (FB, oh, 2, Wp, 2C); majors
    # only, lane dim untouched
    resh = xn.reshape(fb, oh, 2, wp, c2)
    rows = [
        resh[:, :, 0].reshape(m, c2),  # even input rows, flattened
        resh[:, :, 1].reshape(m, c2),  # odd input rows
    ]

    r_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    i_idx = (r_idx // wp) % oh  # output row within a frame
    j_idx = r_idx % wp  # output column

    accs = []
    for g in range(3):  # A (kw=1,2), B (kw=0), C (kw=3)
        acc = jnp.zeros((m, cout), jnp.float32)
        for kh in range(4):
            p = (kh - 1) % 2  # row parity of input row 2i+kh-1
            s_r = (kh - 1) // 2  # extra output-row offset: -1, 0, 0, +1
            y = jax.lax.dot_general(
                rows[p],
                w_ref[3 * kh + g],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if s_r:  # sublane-aligned roll by one row-block of wp
                y = pltpu.roll(y, shift=(-s_r * wp) % m, axis=0)
                valid = i_idx > 0 if s_r < 0 else i_idx < oh - 1
                y = jnp.where(valid, y, 0.0)
            acc = acc + y
        accs.append(acc)

    out = accs[0]
    # group B contributes one output column to the right of its pair …
    b = pltpu.roll(accs[1], shift=1, axis=0)
    out = out + jnp.where(j_idx > 0, b, 0.0)
    # … and group C one to the left
    c = pltpu.roll(accs[2], shift=m - 1, axis=0)
    out = out + jnp.where(j_idx < wp - 1, c, 0.0)

    o_ref[...] = out.reshape(fb, oh, wp, cout).astype(o_ref.dtype)


def pack_weights(w4: jax.Array) -> jax.Array:
    """(4, 4, C, Cout) conv kernel -> (12, 2C, Cout) per-(kh, group) slabs.

    Slot 3*kh+0 ("A") stacks W[kh,1] over W[kh,2] — the two taps that land
    in the output's own column pair. Slot 3*kh+1 ("B") is [0; W[kh,0]]
    (pair j-1, odd column), slot 3*kh+2 ("C") is [W[kh,3]; 0] (pair j+1,
    even column).
    """
    kh4, kw4, c, cout = w4.shape
    assert kh4 == 4 and kw4 == 4, "kernel is specialized to 4x4 windows"
    zeros = jnp.zeros((c, cout), w4.dtype)
    slabs = []
    for kh in range(4):
        slabs.append(jnp.concatenate([w4[kh, 1], w4[kh, 2]], axis=0))
        slabs.append(jnp.concatenate([zeros, w4[kh, 0]], axis=0))
        slabs.append(jnp.concatenate([w4[kh, 3], zeros], axis=0))
    return jnp.stack(slabs)


def _vmem_estimate(
    fb: int, h: int, wp: int, c2: int, cout: int, xb: int, wb: int
) -> int:
    """Rough per-program VMEM bytes: double-buffered in/out blocks, the f32
    normalized activation + its cast, weight slabs (x2 for pipelining), and
    ~5 (M, Cout) f32 live accumulators/temporaries."""
    m = fb * (h // 2) * wp
    return (
        2 * fb * h * wp * c2 * xb  # input double buffer
        + fb * h * wp * c2 * (4 + xb)  # xn f32 + cast copy
        + 2 * 12 * c2 * cout * wb  # weight slabs
        + 5 * m * cout * 4  # accs + matmul temps
        + 2 * fb * (h // 2) * wp * cout * xb  # output double buffer
    )


def _frames_per_block(b: int, h: int, wp: int, c2: int, cout: int, xb: int, wb: int) -> int:
    """Largest divisor of b whose estimated VMEM footprint fits ~12 MiB."""
    budget = 12 * 1024 * 1024
    fb = max(1, min(b, 4096 // max(1, (h // 2) * wp)))
    while fb > 1 and (b % fb or _vmem_estimate(fb, h, wp, c2, cout, xb, wb) > budget):
        fb -= 1
    return fb


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def fused_norm_act_conv(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    w_packed: jax.Array,
    negative_slope: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """``conv4x4s2p1(leaky_relu(x * scale + shift))`` with the normalize
    fused into the conv's VMEM prologue.

    x: (B, H, W, C); scale/shift: (C,); w_packed: (12, 2C, Cout) from
    :func:`pack_weights`. Returns (B, H/2, W/2, Cout) in x.dtype.
    """
    b, h, w, c = x.shape
    cout = w_packed.shape[-1]
    if h % 2 or w % 2:
        raise ValueError(f"H/W must be even, got {(h, w)}")
    wp = w // 2
    # column pairing: a free row-major bitcast at the XLA level
    xp = x.reshape(b, h, wp, 2 * c)
    scale2 = jnp.concatenate([scale, scale]).reshape(1, 2 * c)
    shift2 = jnp.concatenate([shift, shift]).reshape(1, 2 * c)
    fb = _frames_per_block(
        b, h, wp, 2 * c, cout, x.dtype.itemsize, w_packed.dtype.itemsize
    )
    kernel = functools.partial(_fused_kernel, negative_slope=negative_slope)
    return pl.pallas_call(
        kernel,
        grid=(b // fb,),
        in_specs=[
            pl.BlockSpec((fb, h, wp, 2 * c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((12, 2 * c, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((fb, h // 2, wp, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, wp, cout), x.dtype),
        interpret=interpret,
    )(xp, scale2, shift2, w_packed)


def reference_norm_act_conv(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    w4: jax.Array,
    negative_slope: float = 0.2,
) -> jax.Array:
    """The XLA emission this kernel competes with: elementwise normalize +
    LeakyReLU materialized, then ``lax.conv_general_dilated`` (4,4)/(2,2)
    with pad 1, channels-last."""
    xn = x.astype(jnp.float32) * scale + shift
    xn = jnp.where(xn >= 0, xn, xn * negative_slope).astype(w4.dtype)
    return jax.lax.conv_general_dilated(
        xn,
        w4,
        window_strides=(2, 2),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
