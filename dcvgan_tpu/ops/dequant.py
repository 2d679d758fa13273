"""On-device uint8 -> [-1, 1] dequantization (Pallas).

Why this is a hot op: the reference normalizes frames to float32 on the
host and ships 4 bytes/pixel to the device
(/root/reference/src/dataset.py:126-131 + pinned-memory `.to(cuda)`,
/root/reference/src/trainer.py:293-297). Here the loader can ship raw
**uint8** batches — 4× less host->device traffic on the PCIe/ICI ingest
path — and this kernel performs `x / 127.5 - 1` into the compute dtype on
chip, tiled through VMEM. The epilogue normalize then feeds straight into
the first convolution.

On non-TPU backends (CPU tests) the same math runs as plain XLA ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DIVISOR = 127.5


def _dequant_kernel(x_ref, o_ref):
    from jax.experimental import pallas as pl  # noqa: F401  (kernel scope)

    x = x_ref[:]
    # Mosaic supports u8 -> i32 -> f32; a direct u8 -> f32 cast does not
    # lower on TPU.
    xf = x.astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (xf / _DIVISOR - 1.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _dequantize_pallas(
    x: jax.Array, dtype=jnp.bfloat16, interpret: bool = False
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # collapse to 2D (rows, lane-dim) for clean VMEM tiling; the trailing
    # axis of video batches is small (1..25 channels), so tile over the
    # flattened pixel stream instead.
    flat = x.reshape(-1)
    n = flat.size
    lane = 128
    sub = 512  # rows per tile -> 64KB u8 per tile, well under VMEM
    tile = lane * sub
    pad = (-n) % tile
    if pad:
        flat = jnp.pad(flat, (0, pad))
    rows = flat.size // lane
    x2 = flat.reshape(rows, lane)

    out = pl.pallas_call(
        _dequant_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lane), dtype),
        grid=(rows // sub,),
        in_specs=[
            pl.BlockSpec((sub, lane), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (sub, lane), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2)
    out = out.reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(x.shape)


def dequantize_video(
    x: jax.Array, dtype=jnp.bfloat16, interpret: bool | None = None
) -> jax.Array:
    """uint8 video batch -> `x / 127.5 - 1` in ``dtype``.

    Pallas on TPU; identical XLA math elsewhere. ``interpret=True`` forces
    the Pallas kernel through the interpreter (kernel-logic tests on CPU).
    """
    if x.dtype != jnp.uint8:
        raise TypeError(f"expected uint8, got {x.dtype}")
    platform = jax.devices()[0].platform
    if platform == "tpu" or interpret:
        return _dequantize_pallas(x, dtype=dtype, interpret=bool(interpret))
    return (x.astype(jnp.float32) / _DIVISOR - 1.0).astype(dtype)
