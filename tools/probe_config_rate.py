"""On-device train-step rate/MFU for ANY config at given batch sizes.

bench.py's sweep is pinned to the mug-depth flagship; this probe answers
"what does the chip do at reference-max scale" (VERDICT r3 #5) for an
arbitrary config — e.g. the exact isogd-flow shape (b=100, ngf/ndf 64,
2-ch flow: configs/refmax-flow100.yml) or the surreal-depth2 shape
(b=100, ggen ngf 96: configs/refmax-depth96.yml) — using the same
on-device lax.scan methodology (tunnel-immune) and XLA cost analysis.

Usage::

    python tools/probe_config_rate.py --config configs/refmax-flow100.yml \
        [--batches 100] [--precision bfloat16] [--out results/...json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", type=Path, required=True)
    ap.add_argument("--batches", nargs="+", type=int, default=None)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    import jax

    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN
    from dcvgan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(REPO)

    cfg = load_config(args.config)
    cfg.trainer.precision = args.precision
    cfg.trainer.donate_state = False
    batches = args.batches or [cfg.batchsize]

    gan = DCVGAN(cfg)
    key = prng.base_key(0)
    t, s = cfg.video_length, cfg.image_size
    rtt = bench._scalar_rtt()
    kind = jax.devices()[0].device_kind
    peak = bench._peak_flops(kind)

    # geometry-correct random batch (bench._make_batch only covers depth)
    import numpy as np

    def make_batch(b):
        rng = np.random.default_rng(0)
        geo = cfg.geometric_info
        out = {"color": rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32)}
        out[geo.name] = rng.uniform(
            -1, 1, (b, t, s, s, geo.channel)
        ).astype(np.float32)
        return out

    rows = []
    out_path = args.out or (
        REPO / "results" / f"rate_{args.config.stem}.json"
    )
    for b in batches:
        mesh = create_mesh(cfg, batchsize=b)
        state = replicate(gan.init_state(key), mesh)
        device_batch = shard_batch(make_batch(b), mesh)
        steps = bench._scan_steps(b)
        rate, flops = bench._train_rate(
            gan, state, key, device_batch, steps, rtt
        )
        n_chips = jax.device_count()
        row = {
            "config": args.config.stem,
            "batch": b,
            "precision": args.precision,
            "iters_per_sec": round(rate, 3),
            "videos_per_sec": round(rate * b, 1),
            "gflops_per_step": round(flops / 1e9, 1) if flops else None,
            # per-chip MFU, same formula as bench.py's train sweep
            "mfu": (
                round(flops * rate / (peak * n_chips), 4)
                if (flops and peak)
                else None
            ),
            "device": kind,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
