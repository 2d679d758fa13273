"""Batched no-grad sampling to host uint8 videos.

Reference: ``util.generate_samples`` (/root/reference/src/util.py:251-322) —
loop over ceil(num/batchsize) eval-mode batches, convert color videos to
uint8, render geometry in color format, concatenate and trim to ``num``.
Here sampling is one jitted eval-mode function reused across batches; only
the uint8 conversion and geometry rendering stay on host.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np

from dcvgan_tpu import prng
from dcvgan_tpu.train.state import GANState
from dcvgan_tpu.utils.video_np import (
    geometric_info_in_color_format,
    videos_to_uint8,
)


@functools.lru_cache(maxsize=8)
def _jitted_sampler(gan, batchsize: int):
    def sample(state: GANState, key: jax.Array):
        return gan.sample_videos(state, key, batchsize)

    return jax.jit(sample)


def generate_samples(
    gan,
    state: GANState,
    key: jax.Array,
    num: int,
    batchsize: int = 20,
    with_geo: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Generate ``num`` (geometry, color) videos as uint8 numpy.

    Returns ``(xg, xc)``: xg is (num, T, H, W, 3) uint8 rendered geometry
    (or None when ``with_geo=False``), xc is (num, T, H, W, 3) uint8 RGB.
    """
    sampler = _jitted_sampler(gan, batchsize)
    xg_batches, xc_batches = [], []
    n_batches = (num + batchsize - 1) // batchsize
    for i in range(n_batches):
        xg, xc = sampler(state, prng.for_step(key, i))
        if with_geo:
            xg_batches.append(np.clip(np.asarray(xg, np.float32), -1, 1))
        xc_batches.append(videos_to_uint8(np.asarray(xc, np.float32)))

    xc_all = np.concatenate(xc_batches)[:num]
    if not with_geo:
        return None, xc_all
    xg_all = np.concatenate(xg_batches)[:num]
    xg_all = geometric_info_in_color_format(xg_all, gan.ggen.geometric_info)
    return xg_all, xc_all
