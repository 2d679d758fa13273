"""Protocol-scale device-resident evaluation probe (VERDICT r2 #3).

Runs the fused sample->embed eval at the reference's isogd-depth protocol
(3,000 generated videos, eval batch 100 —
/root/reference/config/isogd-depth.yml:42-43) and at the 10k/b50 protocol
of the other configs, on the real chip, against a trained run's latest
checkpoint, with the committed extractor and the full real set
(max_real_samples=0). Records wall-clock + scores; also scores a 128-sample
eval for stability comparison with the committed demo runs.

The videos never leave the device — only (features, probs) come home
((N, 256+24) floats, ~3 MB at 10k samples vs ~2 GB of uint8 video for the
host path; over this environment's ~8 MB/s tunnel the host path would take
minutes-to-hours, which is why it exists only as a parity fallback).

Usage::

    python tools/probe_protocol_eval.py [--run result/synthetic-flagship/demo-synthetic-flagship]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dcvgan_tpu import prng  # noqa: E402
from dcvgan_tpu.cli.infer import load_run  # noqa: E402
from dcvgan_tpu.cli.train import build_dataset  # noqa: E402
from dcvgan_tpu.eval.evaluator import Evaluator  # noqa: E402
from dcvgan_tpu.eval.features import FeatureExtractor  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--run",
        type=Path,
        default=REPO / "result" / "synthetic-flagship" / "demo-synthetic-flagship",
    )
    ap.add_argument("--weights", type=Path,
                    default=REPO / "assets" / "extractor-synthetic.npz")
    ap.add_argument(
        "--protocols",
        nargs="+",
        default=["128:32", "3000:100", "10000:50"],
        help="num_samples:batchsize pairs (reference: 3000:100, 10000:50)",
    )
    ap.add_argument("--out", type=Path,
                    default=REPO / "results" / "protocol_eval.json")
    args = ap.parse_args(argv)

    cfg, gan, state = load_run(args.run, -1)
    dataset = build_dataset(cfg)
    extractor = FeatureExtractor(weights_path=str(args.weights))

    rows = []
    for spec in args.protocols:
        num, batch = (int(v) for v in spec.split(":"))
        ev = Evaluator(
            ["is", "fid"],
            num_samples=num,
            batchsize=batch,
            dataset=dataset,
            extractor=extractor,
            max_real_samples=0,  # full real set, reference protocol
        )
        key = prng.base_key(123)
        # compile pass (one chunk) so the timed figure is steady-state
        ev.sample_and_embed(gan, state, key, num=batch)
        t0 = time.perf_counter()
        scores = ev.evaluate(gan, state, key, device_resident=True)
        dt = time.perf_counter() - t0
        row = {
            "num_samples": num,
            "batchsize": batch,
            "wall_s": round(dt, 2),
            "videos_per_sec": round(num / dt, 1),
            **{k: round(float(v), 4) for k, v in scores.items()},
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
