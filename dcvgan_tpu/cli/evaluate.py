"""Standalone evaluation CLI over directories of mp4 files.

The reference delegates quantitative evaluation to the external ``evan``
CLI/package operating on mp4 directories (SURVEY.md §2.2). This is the
equivalent first-class surface::

    python -m dcvgan_tpu.cli.evaluate <gen_dir> --metrics is fid \
        [--ref-dir <real_mp4_dir>] [--batchsize 32] [--weights feats.npz]

Prints one JSON object of scores. FID/FVD/PRD need ``--ref-dir``. Absolute
IS/FID values require pretrained extractor weights (``--weights``); the
default seeded extractor is only meaningful for relative tracking.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional, Sequence

from dcvgan_tpu.eval.evaluator import Evaluator
from dcvgan_tpu.eval.features import FeatureExtractor


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("gen_dir", type=Path)
    parser.add_argument("--ref-dir", type=Path, default=None)
    parser.add_argument(
        "--metrics", nargs="+", default=["is"],
        choices=["is", "fid", "fvd", "prd"],
    )
    parser.add_argument("--batchsize", type=int, default=32)
    parser.add_argument("--weights", default=None, help="extractor .npz")
    parser.add_argument(
        "--max-real-samples", type=int, default=0,
        help="cap on reference clips embedded for fid/prd; 0 (default) "
        "embeds the full --ref-dir, the reference's protocol "
        "(/root/reference/src/trainer.py:205)",
    )
    args = parser.parse_args(argv)

    needs_ref = {"fid", "fvd", "prd"} & set(args.metrics)
    if needs_ref and args.ref_dir is None:
        parser.error(f"--ref-dir required for metrics {sorted(needs_ref)}")

    extractor = FeatureExtractor(weights_path=args.weights)
    evaluator = Evaluator(
        metrics=args.metrics,
        num_samples=0,  # unused in the directory protocol
        batchsize=args.batchsize,
        extractor=extractor,
        max_real_samples=args.max_real_samples,
    )
    scores = evaluator.evaluate_dirs(args.gen_dir, args.ref_dir)
    record = {k: round(float(v), 6) for k, v in scores.items()}
    # fingerprint makes scores comparable across runs/rounds only when equal
    record["extractor"] = extractor.fingerprint
    print(json.dumps(record))


if __name__ == "__main__":
    main()
