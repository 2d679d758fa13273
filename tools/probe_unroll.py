"""Probe: does unrolling the device-side step loop pay at flagship batch?

PERFORMANCE.md attributes the b=20 train step's sub-SoL rate to per-op
latency across ~90 small kernels (reference hot loop:
/root/reference/src/trainer.py:269-363). One lever bench.py has never
measured: ``lax.scan(..., unroll=K)`` over the step loop, which gives XLA
K consecutive iterations in one loop body to schedule/overlap. If this
wins, the honest integrations are the scan-driven surfaces (bench.py's
timed loop, cli.serve's chunk scan) and an opt-in multi-step trainer
dispatch; if it loses, it's one more measured negative for the latency
story.

Prints one JSON line per (batch, variant, unroll). Usage::

    python tools/probe_unroll.py [--batches 20] [--unrolls 1 2 4]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from math import gcd
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

VARIANTS = {
    "base": {},
    "fast": {"shared_fakes": True, "critic_joint_batch": True},
}


def _rate(gan, state, key, device_batch, steps: int, rtt: float, unroll: int):
    from dcvgan_tpu import prng

    def body(carry, i):
        st, _ = carry
        st, metrics = gan.train_step(st, device_batch, prng.for_step(key, i))
        return (st, metrics["loss_gen"]), None

    def scan(st):
        (st, last_loss), _ = jax.lax.scan(
            body, (st, jnp.float32(0.0)), jnp.arange(steps), unroll=unroll
        )
        return last_loss

    compiled = jax.jit(scan).lower(state).compile()
    float(compiled(state))  # warm
    t0 = time.perf_counter()
    float(compiled(state))
    return steps / max(1e-9, time.perf_counter() - t0 - rtt)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", nargs="+", type=int, default=[20])
    ap.add_argument("--unrolls", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument(
        "--variants", nargs="+", default=list(VARIANTS), choices=list(VARIANTS)
    )
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "unroll_probe.json"
    )
    args = ap.parse_args(argv)

    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN

    base_cfg = load_config(REPO / "configs" / "mug-depth.yml")
    base_cfg.trainer.precision = "bfloat16"
    base_cfg.trainer.donate_state = False

    key = prng.base_key(0)
    base_state = DCVGAN(base_cfg).init_state(key)
    t, s = base_cfg.video_length, base_cfg.image_size
    rtt = bench._scalar_rtt()

    rows = []
    for b in args.batches:
        # steps divisible by every unroll so trip counts stay whole
        steps = bench._scan_steps(b)
        lcm = 1
        for u in args.unrolls:
            lcm = lcm * u // gcd(lcm, u)
        steps = max(steps // lcm, 1) * lcm
        for name in args.variants:
            cfg = copy.deepcopy(base_cfg)
            for k, v in VARIANTS[name].items():
                setattr(cfg.trainer, k, v)
            gan = DCVGAN(cfg)
            mesh = create_mesh(cfg, batchsize=b)
            state = replicate(base_state, mesh)
            device_batch = shard_batch(bench._make_batch(b, t, s), mesh)
            for u in args.unrolls:
                try:
                    r = _rate(gan, state, key, device_batch, steps, rtt, u)
                    row = {
                        "batch": b,
                        "variant": name,
                        "unroll": u,
                        "iters_per_sec": round(r, 3),
                        "step_ms": round(1e3 / r, 2),
                        "videos_per_sec": round(r * b, 1),
                    }
                except Exception as e:
                    row = {
                        "batch": b,
                        "variant": name,
                        "unroll": u,
                        "error": f"{type(e).__name__}: {e}",
                    }
                rows.append(row)
                print(json.dumps(row), flush=True)
                # incremental write: a late failure never loses earlier rows
                args.out.parent.mkdir(parents=True, exist_ok=True)
                args.out.write_text(json.dumps(rows, indent=1))

    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
