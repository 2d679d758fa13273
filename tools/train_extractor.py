"""Train a discriminative video-feature extractor on synthetic clips.

The reference's quantitative eval embeds videos with a *pretrained* C3D
(`evan`, /root/reference/src/trainer.py:209-219). This zero-egress
environment cannot download those weights, and a seeded random projection
(the default extractor) is only weakly discriminative. This tool closes
the gap as far as the environment allows: it trains the small C3D-topology
tower (`eval.features.C3DFeatures`) as a **motion + shape classifier** on
procedurally generated moving-shapes clips (the same family as the
`synthetic` dataset), then saves weights in the extractor's ``.npz`` format.

The resulting embedding is sensitive to exactly the factors the synthetic
training demos vary — appearance, scale, and per-video motion direction —
so relative FVD/IS tracked with it reflects real distribution movement
rather than random-projection luck. Scores remain extractor-fingerprinted.

Labels: 8 motion-direction octants x 3 shape-size buckets = 24 classes.

Usage::

    python tools/train_extractor.py out.npz [--steps 600] [--batch 16]
        [--width 16] [--feature-dim 128] [--image-size 64] [--seed 0]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


N_DIRECTIONS = 8
N_SIZES = 3
NUM_CLASSES = N_DIRECTIONS * N_SIZES


def synth_labeled_batch(rng: np.random.Generator, batch: int, t: int, s: int):
    """Generate (videos uint8 (B,T,s,s,3), labels (B,)) moving-shape clips.

    Same visual family as the ``synthetic`` dataset — rendered through the
    SAME helpers (data/preprocess/synthetic.py: gradient_background,
    bouncing_rect_trajectory, render_color_frame), so the trained embedding
    stays locked to what it evaluates. The label encodes the initial
    motion-direction octant and the shape-size bucket.
    """
    from dcvgan_tpu.data.preprocess.synthetic import (
        bouncing_rect_trajectory,
        gradient_background,
        render_color_frame,
    )

    videos = np.empty((batch, t, s, s, 3), np.uint8)
    labels = np.empty((batch,), np.int32)
    size_edges = np.linspace(s // 8, s // 3, N_SIZES + 1)
    for b in range(batch):
        color = rng.integers(64, 256, 3)
        size_bucket = int(rng.integers(N_SIZES))
        size = int(rng.uniform(size_edges[size_bucket], size_edges[size_bucket + 1]))
        size = max(2, size)
        x, y = rng.uniform(0, s - size, 2)
        direction = int(rng.integers(N_DIRECTIONS))
        angle = (direction + rng.uniform(0.1, 0.9)) * (2 * np.pi / N_DIRECTIONS)
        speed = rng.uniform(1.5, 3.0) * s / 64.0
        vx, vy = speed * np.cos(angle), speed * np.sin(angle)
        bg = gradient_background(s, rng.uniform(0, 2 * np.pi))
        traj = bouncing_rect_trajectory(s, t, x, y, vx, vy, size)
        for j, (xi, yi) in enumerate(traj):
            videos[b, j] = render_color_frame(bg, color, size, xi, yi)
        labels[b] = direction * N_SIZES + size_bucket
    return videos, labels


def save_npz(path: Path, params, meta: dict) -> None:
    """Flatten a flax params tree into the FeatureExtractor npz layout."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk("", params)
    for k, v in meta.items():
        flat[f"__meta__/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def train(
    steps: int = 600,
    batch: int = 16,
    width: int = 16,
    feature_dim: int = 128,
    t: int = 16,
    s: int = 64,
    seed: int = 0,
    log_every: int = 50,
    holdout: int = 64,
):
    """Train the classifier; returns (params, final train acc, holdout acc)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dcvgan_tpu.eval.features import C3DFeatures

    model = C3DFeatures(
        num_classes=NUM_CLASSES, width=width, feature_dim=feature_dim
    )
    rng = np.random.default_rng(seed)
    init_v, _ = synth_labeled_batch(rng, 1, t, s)
    variables = model.init(
        jax.random.key(seed), jnp.asarray(init_v, jnp.float32) / 255.0
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, videos_u8, labels):
        def loss_fn(p):
            x = videos_u8.astype(jnp.float32) / 255.0
            _, logits = model.apply({"params": p}, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    params = variables["params"]
    t0 = time.time()
    for i in range(1, steps + 1):
        videos, labels = synth_labeled_batch(rng, batch, t, s)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(videos), jnp.asarray(labels)
        )
        if i % log_every == 0 or i == steps:
            print(
                f"step {i:5d}  loss {float(loss):.4f}  acc {float(acc):.3f}"
                f"  ({time.time() - t0:.0f}s)",
                flush=True,
            )

    # held-out accuracy on a fresh generator stream (chunked: the
    # holdout can be larger than a device-friendly batch)
    ho_rng = np.random.default_rng(seed + 10**6)
    videos, labels = synth_labeled_batch(ho_rng, holdout, t, s)

    @jax.jit
    def predict(params, videos_u8):
        _, logits = model.apply(
            {"params": params}, videos_u8.astype(jnp.float32) / 255.0
        )
        return logits.argmax(-1)

    preds = [
        np.asarray(predict(params, jnp.asarray(videos[i : i + 64])))
        for i in range(0, holdout, 64)
    ]
    holdout_acc = float((np.concatenate(preds) == labels).mean())
    return params, float(acc), holdout_acc


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out", type=Path)
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--width", type=int, default=16)
    parser.add_argument("--feature-dim", type=int, default=128)
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--video-length", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--holdout", type=int, default=64,
                        help="held-out clips for the accuracy estimate")
    args = parser.parse_args(argv)

    params, train_acc, holdout_acc = train(
        steps=args.steps,
        batch=args.batch,
        width=args.width,
        feature_dim=args.feature_dim,
        t=args.video_length,
        s=args.image_size,
        seed=args.seed,
        holdout=args.holdout,
    )
    print(f"holdout accuracy: {holdout_acc:.3f} (chance {1 / NUM_CLASSES:.3f})")
    save_npz(
        args.out,
        params,
        {
            "topology": "small",
            "trained_on": "synthetic-moving-shapes",
            "classes": "8 directions x 3 sizes",
            "steps": args.steps,
            "seed": args.seed,
            "holdout_acc": holdout_acc,
            "holdout_n": args.holdout,
        },
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
