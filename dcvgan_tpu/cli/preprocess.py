"""Standalone preprocessing CLI.

The reference triggers preprocessing lazily from the dataset cold-start path
only (/root/reference/src/dataset.py:75-84); this CLI exposes it directly::

    python -m dcvgan_tpu.cli.preprocess surreal data/raw/surreal \
        data/processed/surreal/train --mode train --img-size 64
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence

from dcvgan_tpu.data.preprocess import get_preprocessor


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", help="dataset name (surreal/isogd/mock)")
    parser.add_argument("raw_path", type=Path)
    parser.add_argument("save_path", type=Path)
    parser.add_argument("--mode", default="train")
    parser.add_argument("--length", type=int, default=16)
    parser.add_argument("--img-size", type=int, default=64)
    parser.add_argument("--n-jobs", type=int, default=-1)
    args = parser.parse_args(argv)

    fn = get_preprocessor(args.dataset)
    args.save_path.mkdir(parents=True, exist_ok=True)
    fn(args.raw_path, args.save_path, args.mode, args.length, args.img_size, args.n_jobs)


if __name__ == "__main__":
    main()
