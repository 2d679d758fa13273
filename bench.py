"""Benchmark: mug-depth training throughput + batched inference rate.

Runs on whatever accelerator is visible (one TPU v5e chip under the driver).
Prints ONE JSON line:

    {"metric": "infer_videos_per_sec_per_chip", "value": ..., "unit":
     "videos/s", "vs_baseline": value / 1000, "train_iters_per_sec": ...}

``vs_baseline`` is measured against the BASELINE.md north-star target of
1,000 generated 16×64×64 videos/sec/chip.

Timing methodology. This environment reaches the TPU through a network
tunnel where (a) ``block_until_ready`` can return before execution finishes
and (b) every python-level dispatch pays tunnel latency, so naive loops
measure the tunnel, not the chip. Primary numbers therefore run the
iteration loop **on device** inside one jitted ``lax.scan`` and fetch a
single dependent scalar (the device executes in order, so that fetch waits
for everything). Python-dispatch-loop rates are reported alongside as
``dispatched_*`` for reference.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent

TRAIN_SCAN_STEPS = 20
INFER_BATCH = 256
INFER_SCAN_ITERS = 20
DISPATCH_ITERS = 10


def _scalar_rtt(n: int = 5) -> float:
    noop = jax.jit(lambda x: x + 1.0)
    z = noop(jnp.float32(0.0))
    float(z)
    t0 = time.perf_counter()
    for _ in range(n):
        float(noop(z))
    return (time.perf_counter() - t0) / n


def main() -> None:
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = False  # state is reused across timed variants

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
    rtt = _scalar_rtt()

    # ---- train throughput: K steps scanned on device
    def train_body(carry, i):
        st, _ = carry
        st, metrics = gan.train_step(st, device_batch, prng.for_step(key, i))
        return (st, metrics["loss_gen"]), None

    @jax.jit
    def train_scan(st):
        (st, last_loss), _ = jax.lax.scan(
            train_body, (st, jnp.float32(0.0)), jnp.arange(TRAIN_SCAN_STEPS)
        )
        return last_loss

    float(train_scan(state))  # compile
    t0 = time.perf_counter()
    float(train_scan(state))
    train_iters_per_sec = TRAIN_SCAN_STEPS / max(1e-9, time.perf_counter() - t0 - rtt)

    # dispatched variant (one python call per step, chained through state)
    step_fn = gan.jitted_train_step
    st, metrics = step_fn(state, device_batch, key)
    float(metrics["loss_gen"])
    t0 = time.perf_counter()
    for _ in range(DISPATCH_ITERS):
        st, metrics = step_fn(st, device_batch, key)
    float(metrics["loss_gen"])
    disp_train = DISPATCH_ITERS / max(1e-9, time.perf_counter() - t0 - rtt)

    # ---- inference throughput: K sampling iterations scanned on device
    def infer_body(acc, i):
        _, xc = gan.sample_videos(state, prng.for_step(key, i), INFER_BATCH)
        return acc + jnp.sum(xc[0, 0, 0, 0]).astype(jnp.float32), None

    @jax.jit
    def infer_scan(z):
        acc, _ = jax.lax.scan(infer_body, z, jnp.arange(INFER_SCAN_ITERS))
        return acc

    float(infer_scan(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    float(infer_scan(jnp.float32(0.0)))
    dt = max(1e-9, time.perf_counter() - t0 - rtt)
    videos_per_sec = INFER_BATCH * INFER_SCAN_ITERS / dt
    n_chips = jax.device_count()
    videos_per_sec_per_chip = videos_per_sec / n_chips

    # dispatched variant
    def sample(carry, st, k):
        xg, xc = gan.sample_videos(st, k, INFER_BATCH)
        return carry + jnp.sum(xc[0, 0, 0, 0]).astype(jnp.float32)

    sample_fn = jax.jit(sample)
    carry = sample_fn(jnp.float32(0.0), state, key)
    float(carry)
    t0 = time.perf_counter()
    for i in range(DISPATCH_ITERS):
        carry = sample_fn(carry, state, prng.for_step(key, i))
    float(carry)
    disp_infer = (
        INFER_BATCH * DISPATCH_ITERS
        / max(1e-9, time.perf_counter() - t0 - rtt)
        / n_chips
    )

    print(
        json.dumps(
            {
                "metric": "infer_videos_per_sec_per_chip",
                "value": round(videos_per_sec_per_chip, 2),
                "unit": "videos/s",
                "vs_baseline": round(videos_per_sec_per_chip / 1000.0, 4),
                "train_iters_per_sec": round(train_iters_per_sec, 3),
                "dispatched_videos_per_sec_per_chip": round(disp_infer, 2),
                "dispatched_train_iters_per_sec": round(disp_train, 3),
                "train_batchsize": b,
                "infer_batchsize": INFER_BATCH,
                "n_chips": n_chips,
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    import traceback

    try:
        main()
    except Exception:
        # the tunneled backend occasionally drops a remote call; one retry
        # rescues the round-end benchmark
        traceback.print_exc()
        main()
