"""Benchmark: mug-depth training throughput + batched inference rate.

Runs on whatever accelerator is visible (one TPU v5e chip under the driver).
Prints ONE JSON line:

    {"metric": "infer_videos_per_sec_per_chip", "value": ..., "unit":
     "videos/s", "vs_baseline": value / 1000, "train_iters_per_sec": ...}

``vs_baseline`` is measured against the BASELINE.md north-star target of
1,000 generated 16×64×64 videos/sec/chip. Train throughput (full five-model
adversarial step at the mug-depth flagship scale, synthetic batch) rides
along as ``train_iters_per_sec``.
"""

import json
import time
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parent

TRAIN_STEPS = 20
INFER_BATCH = 256
INFER_ITERS = 10


def main() -> None:
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    # benchmark envelope: flagship model size, bf16 compute
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = True

    mesh = create_mesh(cfg)
    gan = DCVGAN(cfg)
    key = prng.base_key(0)
    state = replicate(gan.init_state(key), mesh)

    b, t, s = cfg.batchsize, cfg.video_length, cfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "color": rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (b, t, s, s, 1)).astype(np.float32),
    }
    device_batch = shard_batch(batch, mesh)

    # ---- train throughput
    step_fn = gan.jitted_train_step
    state, metrics = step_fn(state, device_batch, key)  # compile
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        state, metrics = step_fn(state, device_batch, key)
    jax.block_until_ready(metrics)
    train_iters_per_sec = TRAIN_STEPS / (time.perf_counter() - t0)

    # ---- batched inference throughput
    def sample(state, key):
        return gan.sample_videos(state, key, INFER_BATCH)

    sample_fn = jax.jit(sample)
    out = sample_fn(state, key)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(INFER_ITERS):
        out = sample_fn(state, prng.for_step(key, i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    videos_per_sec = INFER_BATCH * INFER_ITERS / dt
    n_chips = jax.device_count()
    videos_per_sec_per_chip = videos_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": "infer_videos_per_sec_per_chip",
                "value": round(videos_per_sec_per_chip, 2),
                "unit": "videos/s",
                "vs_baseline": round(videos_per_sec_per_chip / 1000.0, 4),
                "train_iters_per_sec": round(train_iters_per_sec, 3),
                "train_batchsize": b,
                "n_chips": n_chips,
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
