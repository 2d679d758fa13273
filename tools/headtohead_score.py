"""Shared scoring protocol for the reference-vs-dcvgan-tpu head-to-head.

BASELINE.md's quality target is "FVD/IS parity with a locally-trained
reference run" (reference eval protocol: /root/reference/src/trainer.py:
171-224 — directories of mp4s scored against the processed dataset's color
previews). Both frameworks' sample sets are scored HERE, with the same
committed extractor (assets/extractor-synthetic.npz), the same deterministic
16-frame temporal crop, and the same metric math — so trajectories are
directly comparable.

Usage (CLI)::

    python tools/headtohead_score.py GEN_DIR REF_DIR [--metrics is fid]

Library: ``score_dirs(gen_dir, ref_dir, ...)`` returns {"is": ..., "fid": ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np

REPO = Path(__file__).resolve().parents[1]
EXTRACTOR_WEIGHTS = REPO / "assets" / "extractor-synthetic.npz"

_EXTRACTOR = None


def _configure_jax_cpu():
    """This scorer may run inside the torch reference process; keep JAX on
    the host CPU there (the axon sitecustomize would otherwise grab the one
    real TPU chip mid-training-run)."""
    import jax

    try:
        # must happen BEFORE backend init: merely querying the backend
        # would initialize whatever the sitecustomize pinned (axon/TPU)
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (e.g. conftest pinned cpu)


def get_extractor(batchsize: int = 32):
    """The committed synthetic-clip extractor, loaded once per process."""
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _configure_jax_cpu()
        if str(REPO) not in sys.path:
            sys.path.insert(0, str(REPO))
        from dcvgan_tpu.eval.features import FeatureExtractor

        _EXTRACTOR = FeatureExtractor(weights_path=str(EXTRACTOR_WEIGHTS))
    return _EXTRACTOR


def read_clips(paths: Iterable[Path], video_length: int = 16) -> np.ndarray:
    """Read mp4s and deterministically crop the FIRST `video_length` frames
    (both frameworks' sample sets and the 24-frame reference set pass
    through this same crop, so the protocol is identical)."""
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    from dcvgan_tpu.io.video import read_video

    clips = []
    for p in paths:
        v = read_video(p)
        if v.shape[0] < video_length:
            raise ValueError(f"{p}: only {v.shape[0]} frames (< {video_length})")
        clips.append(v[:video_length])
    return np.stack(clips)


def embed_dir(
    d: Path,
    batchsize: int = 32,
    video_length: int = 16,
    limit: Optional[int] = None,
):
    """(features, probs) for every mp4 in the directory, chunk-streamed."""
    paths = sorted(Path(d).glob("*.mp4"))
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no .mp4 files in {d}")
    ex = get_extractor(batchsize)
    feats: List[np.ndarray] = []
    probs: List[np.ndarray] = []
    for s in range(0, len(paths), batchsize):
        clips = read_clips(paths[s : s + batchsize], video_length)
        f, p = ex(clips, batchsize)
        feats.append(f)
        probs.append(p)
    return np.concatenate(feats), np.concatenate(probs)


def score_dirs(
    gen_dir: Path,
    ref_dir: Optional[Path] = None,
    metrics: Iterable[str] = ("is", "fid"),
    batchsize: int = 32,
    video_length: int = 16,
    ref_limit: Optional[int] = None,
) -> Dict[str, float]:
    from dcvgan_tpu.eval.metrics import score_features

    feats, probs = embed_dir(gen_dir, batchsize, video_length)
    ref_feats = None
    if ref_dir is not None:
        ref_feats, _ = embed_dir(ref_dir, batchsize, video_length, ref_limit)
    return score_features(metrics, feats, probs, ref_feats)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gen_dir", type=Path)
    ap.add_argument("ref_dir", type=Path, nargs="?", default=None)
    ap.add_argument("--metrics", nargs="+", default=["is", "fid"])
    ap.add_argument("--batchsize", type=int, default=32)
    args = ap.parse_args(argv)
    scores = score_dirs(args.gen_dir, args.ref_dir, args.metrics, args.batchsize)
    print(json.dumps(scores))


if __name__ == "__main__":
    main()
