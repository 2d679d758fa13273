"""MFU-chase probes (VERDICT r2 #2): measure train-step rate/MFU at larger
batches and with rematerialization, beyond bench.py's standard sweep.

Variants: b128 (sweep reference point), b128+remat, b192, b256, b256+remat.
Remat (`trainer.remat` -> jax.checkpoint on both generator forwards) trades
recomputed FLOPs for activation memory, the standard lever for pushing past
the HBM capacity wall; MFU here counts XLA-executed FLOPs, so remat MFU is
reported alongside *useful* videos/s (the honest figure).

Prints one JSON line per variant. Usage::

    python tools/probe_mfu.py [--variants b256 b256r ...]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from pathlib import Path

import jax

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

VARIANTS = {
    "b128": (128, {}),
    "b128r": (128, {"remat": True}),
    "b192": (192, {}),
    "b256": (256, {}),
    "b256r": (256, {"remat": True}),
    "b384r": (384, {"remat": True}),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--out", type=Path, default=REPO / "results" / "mfu_probe.json")
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
    peak = bench._peak_flops(jax.devices()[0].device_kind)
    rows = []
    for name in args.variants:
        b, overrides = VARIANTS[name]
        cfg = copy.deepcopy(base_cfg)
        for k, v in overrides.items():
            setattr(cfg.trainer, k, v)
        gan = DCVGAN(cfg)
        steps = bench._scan_steps(b)
        try:
            # per-variant mesh sized to THIS batch (the base config's
            # batchsize would pick a data axis that may not divide b on
            # multi-device hosts); inside the try so a shard failure still
            # records an error row
            mesh = create_mesh(cfg, batchsize=b)
            state = replicate(base_state, mesh)
            device_batch = shard_batch(bench._make_batch(b, t, s), mesh)
            rate, flops = bench._train_rate(gan, state, key, device_batch, steps, rtt)
        except Exception as e:
            row = {"variant": name, "batch": b, "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        row = {
            "variant": name,
            "batch": b,
            "iters_per_sec": round(rate, 3),
            "videos_per_sec": round(rate * b, 1),
            "gflops_per_step": round(flops / 1e9, 1) if flops else None,
            "mfu": round(flops * rate / peak, 4) if peak and flops else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
