"""A/B the TimeStackConv3d stacked lowering inside the full train step.

The isolated-stem probe (tools/probe_stem3d.py) measured the temporal-
im2col lowering 2.4-6x faster than XLA's direct 3D conv, but the first
full-bench run after integrating it regressed every batch size. This
probe times the complete jitted train step (bench._train_rate, device-
resident scan) with the stacked branch enabled vs force-disabled
(``layers.STACK3D_MAX_CIN_KT = 0``) at the given batch sizes, isolating
the in-step effect (forward win vs backward/fusion cost).

Usage::

    python tools/probe_stem_ab.py [--batches 20 128] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

import bench


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[20, 128])
    ap.add_argument(
        "--modes",
        nargs="+",
        default=["stacked", "direct"],
        choices=["stacked", "direct", "fwd_only"],
        help="stacked = temporal-im2col fwd+autodiff bwd; direct = XLA 3D "
        "conv; fwd_only = stacked fwd with the direct conv's gradients "
        "(custom_vjp)",
    )
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "stem_ab_probe.json"
    )
    args = ap.parse_args(argv)

    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.models import layers
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = False

    mesh = create_mesh(cfg)
    key = prng.base_key(0)
    rtt = bench._scalar_rtt()
    peak = bench._peak_flops(jax.devices()[0].device_kind)

    mode_flags = {  # (STACK3D_MAX_CIN_KT, STACK3D_DIRECT_BWD)
        "stacked": (128, False),
        "direct": (0, False),
        "fwd_only": (128, True),
    }
    # restore whatever the module shipped with (the measured default is the
    # direct lowering) rather than pinning a hardcoded pair
    saved = (layers.STACK3D_MAX_CIN_KT, layers.STACK3D_DIRECT_BWD)
    rows = []
    try:
        for b in args.batches:
            for mode in args.modes:
                layers.STACK3D_MAX_CIN_KT, layers.STACK3D_DIRECT_BWD = mode_flags[mode]
                gan = DCVGAN(cfg)  # fresh instance; lowering choice is trace-time
                state = replicate(gan.init_state(key), mesh)
                batch = shard_batch(
                    bench._make_batch(b, cfg.video_length, cfg.image_size), mesh
                )
                ips, flops = bench._train_rate(
                    gan, state, key, batch, bench._scan_steps(b), rtt
                )
                row = {
                    "batch": b,
                    "mode": mode,
                    "iters_per_sec": round(ips, 3),
                    "step_ms": round(1e3 / ips, 2),
                    "mfu": round(flops * ips / peak, 4) if peak and flops else None,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    finally:
        layers.STACK3D_MAX_CIN_KT, layers.STACK3D_DIRECT_BWD = saved

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))
    print(json.dumps({"wrote": str(args.out)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
