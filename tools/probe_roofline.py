"""Roofline probe for the train step at FLAGSHIP batch (VERDICT r2 weak #1).

bench.py reports MFU (FLOPs vs peak); this probe adds the memory side:
XLA-counted HBM bytes per step -> memory speed-of-light, so each variant's
step can be placed against max(compute SoL, memory SoL) the way the round-2
b=128 roofline did, but at the batch the north-star metric is defined at
(b=20) and across the trainer's perf levers.

Prints one JSON line per (batch, variant). Usage::

    python tools/probe_roofline.py [--batches 20 64 128] [--variants ...]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

# v5e HBM bandwidth (GB/s). 819 GB/s is the figure the round-2 roofline
# used (public v5e spec); only used for SoL framing, not for MFU.
HBM_GBPS = {"v5 lite": 819e9, "v5e": 819e9, "v6 lite": 1640e9, "v6e": 1640e9}

VARIANTS = {
    "base": {},
    "shared_fakes": {"shared_fakes": True},
    "joint": {"critic_joint_batch": True},
    "fast": {"shared_fakes": True, "critic_joint_batch": True},
    "f32": {"precision": "float32"},
    # memory-bound levers: remat trades HBM bytes for recompute FLOPs,
    # exactly the right direction when memory SoL >> compute SoL
    "remat": {"remat": True},
    "fast_remat": {
        "shared_fakes": True, "critic_joint_batch": True, "remat": True,
    },
    "stat_reuse": {"critic_stat_reuse": True},
    "fast_all": {
        "shared_fakes": True, "critic_joint_batch": True, "remat": True,
        "critic_stat_reuse": True,
    },
}


def _hbm_peak(device_kind: str):
    kind = device_kind.lower()
    for sub, bw in HBM_GBPS.items():
        if sub in kind:
            return bw
    return None


def _rate_and_cost(gan, state, key, device_batch, steps, rtt):
    """Like bench._train_rate but also returns the full cost-analysis dict."""
    import time

    from dcvgan_tpu import prng

    def body(carry, i):
        st, _ = carry
        st, metrics = gan.train_step(st, device_batch, prng.for_step(key, i))
        return (st, metrics["loss_gen"]), None

    def scan(st):
        (st, last_loss), _ = jax.lax.scan(
            body, (st, jnp.float32(0.0)), jnp.arange(steps)
        )
        return last_loss

    compiled = jax.jit(scan).lower(state).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    float(compiled(state))  # warm
    t0 = time.perf_counter()
    float(compiled(state))
    rate = steps / max(1e-9, time.perf_counter() - t0 - rtt)
    return rate, dict(cost)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", nargs="+", type=int, default=[20])
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "roofline_probe.json"
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
    kind = jax.devices()[0].device_kind
    peak = bench._peak_flops(kind)
    hbm = _hbm_peak(kind)

    rows = []
    for b in args.batches:
        for name in args.variants:
            cfg = copy.deepcopy(base_cfg)
            for k, v in VARIANTS[name].items():
                setattr(cfg.trainer, k, v)
            gan = DCVGAN(cfg)
            steps = bench._scan_steps(b)
            try:
                mesh = create_mesh(cfg, batchsize=b)
                state = replicate(base_state, mesh)
                device_batch = shard_batch(bench._make_batch(b, t, s), mesh)
                rate, cost = _rate_and_cost(gan, state, key, device_batch, steps, rtt)
            except Exception as e:  # record and continue the sweep
                row = {
                    "batch": b,
                    "variant": name,
                    "error": f"{type(e).__name__}: {e}",
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
                continue
            flops = float(cost.get("flops", 0.0))
            byts = float(cost.get("bytes accessed", 0.0))
            step_ms = 1e3 / rate
            compute_sol_ms = 1e3 * flops / peak if peak else None
            memory_sol_ms = 1e3 * byts / hbm if hbm else None
            sol_ms = max(compute_sol_ms or 0.0, memory_sol_ms or 0.0) or None
            row = {
                "batch": b,
                "variant": name,
                "iters_per_sec": round(rate, 3),
                "step_ms": round(step_ms, 3),
                "gflops_per_step": round(flops / 1e9, 1),
                "hbm_gb_per_step": round(byts / 1e9, 2),
                "mfu": round(flops * rate / peak, 4) if peak else None,
                "compute_sol_ms": round(compute_sol_ms, 2) if compute_sol_ms else None,
                "memory_sol_ms": round(memory_sol_ms, 2) if memory_sol_ms else None,
                "pct_of_sol": round(100 * sol_ms / step_ms, 1) if sol_ms else None,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
