"""Sample the head-to-head TPU run's checkpoints into mp4 directories for
the shared scoring protocol (tools/headtohead_score.py).

One process loads each Orbax checkpoint of the headtohead-tpu run in turn
(the gan/config are identical across iterations, so the jitted sampler
compiles once) and writes ``<out>/iter_NNNNNN/*.mp4`` — the exact artifact
the reference-side evan shim archives per eval point, so both frameworks'
trajectories are scored from identical inputs.

Usage::

    python tools/headtohead_sample.py [--run result/headtohead/headtohead-tpu]
        [--n 128] [--batch 32] [--out results/headtohead/tpurun_samples]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dcvgan_tpu import prng  # noqa: E402
from dcvgan_tpu.config import load_config  # noqa: E402
from dcvgan_tpu.eval.sampler import generate_samples  # noqa: E402
from dcvgan_tpu.io.video import write_videos_parallel  # noqa: E402
from dcvgan_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from dcvgan_tpu.train.step import DCVGAN  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", type=Path,
                    default=REPO / "result" / "headtohead" / "headtohead-tpu")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ema", action="store_true",
                    help="sample the EMA generators carried by the "
                    "checkpoints (trainer.ema_decay > 0 runs)")
    ap.add_argument("--out", type=Path, default=None,
                    help="sample directory (default: "
                    "results/headtohead/tpurun_samples, with an _ema suffix "
                    "under --ema so the two legs never share a directory)")
    args = ap.parse_args(argv)
    if args.out is None:
        name = "tpurun_samples_ema" if args.ema else "tpurun_samples"
        args.out = REPO / "results" / "headtohead" / name

    cfg = load_config(args.run / "config.yml")
    gan = DCVGAN(cfg)
    state0 = gan.init_state(prng.base_key(cfg.seed))
    ckpt = CheckpointManager(args.run / "models")
    iters = sorted(int(p.name) for p in (args.run / "models").iterdir()
                   if p.name.isdigit())
    print(f">> checkpoints: {iters}", file=sys.stderr)

    key = prng.base_key(args.seed)
    for it in iters:
        out = args.out / f"iter_{it:06d}"
        if len(list(out.glob("*.mp4"))) >= args.n:
            print(f">> iter {it}: already sampled", file=sys.stderr)
            continue
        state = ckpt.restore(state0, it)
        if args.ema:
            if state.ema is None:
                raise SystemExit(f"--ema: checkpoint {it} carries no EMA tree")
            state = state.with_ema_params()
        out.mkdir(parents=True, exist_ok=True)
        wrote = 0
        for off in range(0, args.n, args.batch):
            _, xc = generate_samples(
                gan, state, prng.for_step(key, off), args.batch, args.batch
            )
            take = min(args.batch, args.n - wrote)
            write_videos_parallel(
                xc[:take],
                [out / f"{wrote + i:06d}.mp4" for i in range(take)],
            )
            wrote += take
        print(f">> iter {it}: wrote {wrote} mp4s", file=sys.stderr)


if __name__ == "__main__":
    main()
