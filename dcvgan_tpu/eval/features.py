"""JAX video feature extractor for IS / FID / PRD.

The reference's ``evan`` package embeds videos with a pretrained C3D
(UCF-101) network. No pretrained weights ship in this environment, so the
extractor here is a C3D-topology JAX network whose weights are either

- **loaded** from an ``.npz`` (``weights_path``) for absolute-score parity
  with a pretrained embedding, or
- **deterministically seeded** (default): a fixed random projection. Random
  conv features are a recognized practical embedding for relative FID
  tracking during training; absolute numbers are then only comparable
  within the same extractor seed.

Outputs: penultimate features (FID / PRD) and class probabilities (IS).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class C3DFeatures(nn.Module):
    """C3D-style 3D-conv feature tower over (B, T, H, W, 3) videos in [0, 1].

    Five conv stages with (1/2/2/2/2)-strided temporal pooling, global
    average pool, one hidden dense layer ('fc6' analogue) and a classifier
    head (UCF-101-sized by default).
    """

    num_classes: int = 101
    width: int = 64
    feature_dim: int = 512
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        w = self.width
        stages = [w, w * 2, w * 4, w * 4, w * 8]
        for i, feats in enumerate(stages):
            x = nn.Conv(
                feats, (3, 3, 3), strides=(1, 1, 1), padding="SAME",
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            t_stride = 1 if i == 0 else 2
            x = nn.max_pool(
                x,
                window_shape=(t_stride, 2, 2),
                strides=(t_stride, 2, 2),
                padding="SAME",
            )
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
        feats = nn.Dense(self.feature_dim, dtype=self.dtype, name="fc")(x)
        feats = nn.relu(feats)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(feats)
        return feats, logits


class FeatureExtractor:
    """Stateless extractor: fixed weights, jitted batched apply."""

    def __init__(
        self,
        weights_path: Optional[str] = None,
        seed: int = 0,
        num_classes: int = 101,
    ):
        self.model = C3DFeatures(num_classes=num_classes)
        if weights_path is not None:
            self.variables = self._load_npz(Path(weights_path))
        else:
            dummy = jnp.zeros((1, 16, 64, 64, 3), jnp.float32)
            self.variables = self.model.init(jax.random.key(seed), dummy)
        self._apply = jax.jit(self.model.apply)

    def _load_npz(self, path: Path):
        raw = np.load(path, allow_pickle=False)
        flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in raw.items()}
        params: dict = {}
        for keys, v in flat.items():
            d = params
            for k in keys[:-1]:
                d = d.setdefault(k, {})
            d[keys[-1]] = v
        return {"params": params}

    def __call__(self, videos_uint8: np.ndarray, batchsize: int = 32):
        """uint8 (N, T, H, W, 3) -> (features (N, D), probs (N, K)) on host."""
        feats, probs = [], []
        n = videos_uint8.shape[0]
        for s in range(0, n, batchsize):
            chunk = videos_uint8[s : s + batchsize].astype(np.float32) / 255.0
            f, logit = self._apply(self.variables, jnp.asarray(chunk))
            feats.append(np.asarray(f))
            probs.append(np.asarray(jax.nn.softmax(logit, axis=-1)))
        return np.concatenate(feats), np.concatenate(probs)


@functools.lru_cache(maxsize=2)
def default_extractor(seed: int = 0) -> FeatureExtractor:
    return FeatureExtractor(seed=seed)
