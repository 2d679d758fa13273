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
import hashlib
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


class C3D(nn.Module):
    """Canonical C3D (Tran et al. 2015) over (B, 16, 112, 112, 3) inputs.

    Exact topology of the public PyTorch checkpoints (e.g.
    DavideA/c3d-pytorch ``c3d.pickle``, Sports-1M; UCF-101 fine-tunes use the
    same trunk): conv1-conv5b with (1,2,2)/(2,2,2) max pools, pool5 padded
    (0,1,1) on H/W, fc6/fc7 (4096) + fc8 classifier. This is the evaluation
    embedding the reference gets from ``evan``'s pretrained C3D
    (/root/reference/src/trainer.py:209-219). Returns (fc6 features, fc8
    logits) — fc6 is the standard FVD/FID embedding layer.

    Weights come from ``tools/convert_c3d.py``; see that tool for the torch
    -> flax kernel layout and fc6 flatten-order permutation.
    """

    num_classes: int = 487

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        def conv(x, feats, name):
            x = nn.Conv(feats, (3, 3, 3), padding="SAME", name=name)(x)
            return nn.relu(x)

        def pool(x, t):
            return nn.max_pool(x, (t, 2, 2), strides=(t, 2, 2))

        x = pool(conv(x, 64, "conv1"), 1)            # (B, 16, 56, 56, 64)
        x = pool(conv(x, 128, "conv2"), 2)           # (B, 8, 28, 28, 128)
        x = conv(x, 256, "conv3a")
        x = pool(conv(x, 256, "conv3b"), 2)          # (B, 4, 14, 14, 256)
        x = conv(x, 512, "conv4a")
        x = pool(conv(x, 512, "conv4b"), 2)          # (B, 2, 7, 7, 512)
        x = conv(x, 512, "conv5a")
        x = conv(x, 512, "conv5b")
        # pool5: kernel/stride (2,2,2), zero-pad H/W by 1 on each side
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))  # (B, 1, 4, 4, 512)
        x = x.reshape((x.shape[0], -1))              # (B, 8192) in THWC order
        feats = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, name="fc7")(feats))
        logits = nn.Dense(self.num_classes, name="fc8")(x)
        return feats, logits


class FeatureExtractor:
    """Stateless extractor: fixed weights, jitted batched apply."""

    def __init__(
        self,
        weights_path: Optional[str] = None,
        seed: int = 0,
        num_classes: int = 101,
        width: int = 64,
    ):
        self._mean = None  # (3,) channel means on the 0-255 scale (C3D only)
        if weights_path is not None:
            params, meta = self._load_npz(Path(weights_path))
            self.variables = {"params": params}
            topology = meta.get("topology", "small")
            if topology == "c3d":
                n_cls = int(params["fc8"]["bias"].shape[0])
                self.model = C3D(num_classes=n_cls)
                self._mean = meta.get("mean")
            else:
                n_cls = int(params["head"]["bias"].shape[0])
                # width/feature_dim come from the stored tree itself so a
                # non-default tower (e.g. tools/train_extractor.py's compact
                # synthetic-trained one) loads without extra metadata
                width = int(params["conv0"]["bias"].shape[0])
                feature_dim = int(params["fc"]["bias"].shape[0])
                self.model = C3DFeatures(
                    num_classes=n_cls, width=width, feature_dim=feature_dim
                )
            digest = hashlib.sha256(Path(weights_path).read_bytes()).hexdigest()
            self.fingerprint = f"{topology}-npz/sha256={digest[:16]}"
        else:
            self.model = C3DFeatures(num_classes=num_classes, width=width)
            dummy = jnp.zeros((1, 16, 64, 64, 3), jnp.float32)
            self.variables = self.model.init(jax.random.key(seed), dummy)
            self.fingerprint = f"c3d-seeded/seed={seed}"
            if width != 64:  # non-default towers are a different embedding
                self.fingerprint += f",width={width}"

        is_c3d = isinstance(self.model, C3D)
        mean = None if self._mean is None else jnp.asarray(self._mean)

        def _apply(variables, x):
            """x: float32 with uint8 integer values on the 0-255 scale."""
            if is_c3d:
                # canonical C3D protocol: 112x112 frames, 0-255 scale,
                # channel-mean subtraction
                b, t = x.shape[:2]
                x = jax.image.resize(
                    x, (b, t, 112, 112, x.shape[-1]), method="bilinear"
                )
                if mean is not None:
                    x = x - mean
            else:
                x = x / 255.0
            f, logit = self.model.apply(variables, x)
            return f, jax.nn.softmax(logit, axis=-1)

        @jax.jit
        def embed(variables, chunk_uint8):
            return _apply(variables, chunk_uint8.astype(jnp.float32))

        def device_embed(variables, videos_pm1):
            """Traceable embed of generator output ([-1, 1] float videos),
            for fusion under an outer jit (sample->embed never leaves the
            device). Quantization matches the host path bit-for-bit:
            videos_to_uint8's float32 ``((v+1)/2*255).astype(uint8)``
            truncation (utils/video_np.py:15-23) is reproduced with floor
            (operands are non-negative)."""
            x = jnp.clip(videos_pm1.astype(jnp.float32), -1.0, 1.0)
            x = jnp.floor((x + 1.0) / 2.0 * 255.0)
            return _apply(variables, x)

        self._embed = embed
        self.device_embed = device_embed

    @staticmethod
    def _load_npz(path: Path):
        raw = np.load(path, allow_pickle=False)
        params: dict = {}
        meta: dict = {}
        for k, v in raw.items():
            if k.startswith("__meta__/"):
                name = k.split("/", 1)[1]
                meta[name] = str(v) if v.dtype.kind in "US" else np.asarray(v)
                continue
            keys = tuple(k.split("/"))
            d = params
            for part in keys[:-1]:
                d = d.setdefault(part, {})
            d[keys[-1]] = jnp.asarray(v)
        return params, meta

    def __call__(self, videos_uint8: np.ndarray, batchsize: int = 32):
        """uint8 (N, T, H, W, 3) -> (features (N, D), probs (N, K)) on host."""
        feats, probs = [], []
        n = videos_uint8.shape[0]
        for s in range(0, n, batchsize):
            chunk = videos_uint8[s : s + batchsize]
            take = chunk.shape[0]
            if take < batchsize:
                # pad EVERY ragged chunk (including n < batchsize) to the
                # jitted shape: exactly one compiled signature per batchsize
                chunk = np.concatenate(
                    [chunk, chunk[-1:].repeat(batchsize - take, 0)]
                )
            f, p = self._embed(self.variables, jnp.asarray(chunk))
            feats.append(np.asarray(f)[:take])
            probs.append(np.asarray(p)[:take])
        return np.concatenate(feats), np.concatenate(probs)


@functools.lru_cache(maxsize=2)
def default_extractor(seed: int = 0) -> FeatureExtractor:
    return FeatureExtractor(seed=seed)
