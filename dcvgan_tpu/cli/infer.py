"""Inference CLI (reference: /root/reference/src/infer.py).

Usage::

    python -m dcvgan_tpu.cli.infer <result_dir> <iteration> <save_dir> \
        [--n_samples N] [--batchsize B]

``result_dir`` is a training run directory (contains ``config.yml`` and the
``models/`` Orbax checkpoints). ``iteration`` may be ``-1`` for the latest
checkpoint. Writes ``save_dir/{color,<geometric_info>}/NNNNNN.mp4`` exactly
like the reference (/root/reference/src/infer.py:65-84).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence

from dcvgan_tpu import prng
from dcvgan_tpu.config import load_config
from dcvgan_tpu.eval.sampler import generate_samples
from dcvgan_tpu.io.video import write_videos_parallel
from dcvgan_tpu.train.checkpoint import CheckpointManager
from dcvgan_tpu.train.step import DCVGAN


def load_run(result_dir: Path, iteration: int = -1):
    """Rebuild the model bundle + state from a run directory."""
    cfg = load_config(result_dir / "config.yml")
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(cfg.seed))
    ckpt = CheckpointManager(result_dir / "models")
    state = ckpt.restore(state, None if iteration < 0 else iteration)
    return cfg, gan, state


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("result_dir", type=Path)
    parser.add_argument("iteration", type=int)
    parser.add_argument("save_dir", type=Path)
    parser.add_argument("--n_samples", "-n", type=int, default=10000)
    parser.add_argument("--batchsize", "-b", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--no-ema", action="store_true",
        help="sample the live generator params even when the checkpoint "
        "carries an EMA copy (trainer.ema_decay > 0)",
    )
    args = parser.parse_args(argv)

    cfg, gan, state = load_run(args.result_dir, args.iteration)
    if not args.no_ema:
        state = state.with_ema_params()

    color_dir = args.save_dir / "color"
    color_dir.mkdir(parents=True, exist_ok=True)
    geo_dir = args.save_dir / cfg.geometric_info.name
    geo_dir.mkdir(parents=True, exist_ok=True)

    key = prng.base_key(args.seed)
    for offset in range(0, args.n_samples, args.batchsize):
        xg, xc = generate_samples(
            gan, state, prng.for_step(key, offset), args.batchsize, args.batchsize
        )
        write_videos_parallel(
            xg, [geo_dir / f"{offset + i:06d}.mp4" for i in range(len(xg))]
        )
        write_videos_parallel(
            xc, [color_dir / f"{offset + i:06d}.mp4" for i in range(len(xc))]
        )


if __name__ == "__main__":
    main()
