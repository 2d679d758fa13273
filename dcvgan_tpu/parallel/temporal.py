"""Temporal (sequence-parallel) sharding for the 3D-conv video critics.

The reference folds time into batch for 2D nets and keeps a fixed T=16 for
its 3D critics — no sequence parallelism exists or is needed at that size
(SURVEY.md §5.7). These are the building blocks that let the critics' time
axis shard across the mesh's ``time`` axis when ``video_length`` grows:

- :func:`halo_exchange`: each shard receives the first ``halo`` frames of
  its right neighbor over ICI (``ppermute``) — exactly the receptive-field
  overlap a time-valid kernel needs,
- :func:`time_sharded_conv3d`: a shard_map'd 3D convolution (kernel
  time-valid, spatial torch-(k,2,1)-style padding) that matches the
  unsharded ``lax.conv_general_dilated`` result on the first ``T - kt + 1``
  frames (the tail of the last shard is zero-padded to keep shapes static).

This is the honest conv-video analogue of ring attention / context
parallelism: overlap regions ride point-to-point ICI transfers instead of
gathering the full sequence.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dcvgan_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS


def halo_exchange(x: jax.Array, axis_name: str, halo: int) -> jax.Array:
    """Append the right neighbor's first ``halo`` time frames.

    ``x``: local shard ``(B, T_local, ...)``; returns ``(B, T_local + halo,
    ...)``. The last shard (which has no right neighbor) receives zeros —
    its tail outputs are invalid by construction and must be masked or
    dropped by the caller.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my first `halo` frames to my LEFT neighbor == receive my right
    # neighbor's first frames
    perm = [(i, (i - 1) % n) for i in range(n)]
    received = jax.lax.ppermute(x[:, :halo], axis_name, perm)
    received = jnp.where(idx == n - 1, jnp.zeros_like(received), received)
    return jnp.concatenate([x, received], axis=1)


def _conv3d_local(x: jax.Array, kernel: jax.Array, spatial_stride: int) -> jax.Array:
    """Time-valid, spatially-padded conv over (B, T, H, W, C)."""
    kt = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, spatial_stride, spatial_stride),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )


def time_sharded_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    spatial_stride: int = 2,
) -> Tuple[jax.Array, int]:
    """3D conv with the time axis sharded over ``mesh``'s ``time`` axis.

    ``x``: global ``(B, T, H, W, Cin)`` (sharded or shardable on T);
    ``kernel``: ``(kt, kh, kw, Cin, Cout)``. Returns ``(y, valid_t)`` where
    ``y`` is ``(B, T, H', W', Cout)`` — frame ``t`` of the unsharded
    convolution for ``t < valid_t = T - kt + 1``, zeros after.
    """
    kt = kernel.shape[0]
    t = x.shape[1]
    nt = mesh.shape[TIME_AXIS]
    if t % nt:
        raise ValueError(f"T={t} not divisible by time axis {nt}")
    t_local = t // nt
    if kt - 1 > t_local:
        raise ValueError(
            f"halo {kt - 1} exceeds local time extent {t_local}; "
            f"use fewer time shards"
        )

    def local(x_local, kernel):
        n = jax.lax.axis_size(TIME_AXIS)
        idx = jax.lax.axis_index(TIME_AXIS)
        xh = halo_exchange(x_local, TIME_AXIS, kt - 1)
        y = _conv3d_local(xh, kernel, spatial_stride)  # (B, t_local, H', W', C)
        # last shard: final kt-1 outputs used zero halo -> mask them
        t_ids = jnp.arange(t_local)
        valid = jnp.where(idx == n - 1, t_ids < t_local - (kt - 1), True)
        return jnp.where(valid[None, :, None, None, None], y, 0.0)

    # batch rides the data axis too — P(None, TIME_AXIS) would all-gather
    # the batch and replicate the conv on every data-axis row
    batch_spec = P(DATA_AXIS, TIME_AXIS) if x.shape[0] % mesh.shape[
        DATA_AXIS
    ] == 0 else P(None, TIME_AXIS)
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(batch_spec, P()),
        out_specs=batch_spec,
    )
    return shard(x, kernel), t - kt + 1
