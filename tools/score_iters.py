"""Score a trajectory of per-iteration mp4 sample directories.

Walks ``<samples_root>/iter_*/`` (the layout written by
tools/headtohead_sample.py and by the reference-side evan shim's archive)
and scores every iteration's sample set against a real mp4 directory with
the committed extractor (tools/headtohead_score.py protocol: same
deterministic 16-frame crop, same metric math for both frameworks), then
writes one JSON trajectory.

Usage::

    python tools/score_iters.py SAMPLES_ROOT REF_DIR --out scores.json
        [--metrics is fid] [--ref-limit N]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.headtohead_score import embed_dir  # noqa: E402


def score_trajectory(samples_root: Path, ref_dir: Path, metrics, batchsize=32,
                     ref_limit=None):
    from dcvgan_tpu.eval.metrics import score_features

    iters = sorted(
        (int(re.match(r"iter_(\d+)$", p.name).group(1)), p)
        for p in samples_root.iterdir()
        if p.is_dir() and re.match(r"iter_(\d+)$", p.name)
    )
    if not iters:
        raise SystemExit(f"no iter_* directories under {samples_root}")
    # embed the real set ONCE for the whole trajectory
    ref_feats, _ = embed_dir(ref_dir, batchsize, limit=ref_limit)
    rows = []
    for it, d in iters:
        feats, probs = embed_dir(d, batchsize)
        scores = score_features(metrics, feats, probs, ref_feats)
        row = {"iteration": it}
        row.update({k: round(v, 4) for k, v in scores.items()})
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("samples_root", type=Path)
    ap.add_argument("ref_dir", type=Path)
    ap.add_argument("--metrics", nargs="+", default=["is", "fid"])
    ap.add_argument("--batchsize", type=int, default=32)
    ap.add_argument("--ref-limit", type=int, default=None)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)
    rows = score_trajectory(args.samples_root, args.ref_dir, args.metrics,
                            args.batchsize, args.ref_limit)
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(rows, indent=1))
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
