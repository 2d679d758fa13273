"""Re-score archived head-to-head sample sets under multiple embeddings.

VERDICT r3 "what's weak" #6: every cross-framework FID conclusion in
HEADTOHEAD.md rides on ONE committed extractor
(``assets/extractor-synthetic.npz``). This tool de-risks that dependency:
it re-embeds the committed head-to-head sample sets (no new training)
under several *independent* embeddings — the committed trained extractor
plus differently-seeded random ``FeatureExtractor`` towers and any extra
``.npz`` extractors passed in — and reports whether the
reference-vs-TPU quality ordering holds per embedding.

The protocol mirrors tools/score_iters.py exactly (deterministic
first-16-frame crop, real set embedded once per embedding); only the
embedding varies. Reference eval being stood in for:
/root/reference/src/trainer.py:207-219 (evan's pretrained-C3D scoring).

The default manifest is every committed late-trajectory sample set
(`git ls-files results/headtohead`): the three torch-reference final
evals (eval_008, one per seed) vs the TPU runs' late iterations — the
same band HEADTOHEAD.md's no-regression claim is drawn from.

Usage::

    python tools/multiembed_score.py --real <real_color_mp4_dir> \
        [--weights assets/extractor-synthetic.npz ...] \
        [--seeds 1 2] [--widths 64] \
        [--out results/multiembed_scores.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.headtohead_score import _configure_jax_cpu, read_clips  # noqa: E402

H2H = REPO / "results" / "headtohead"

# (side, run label, path) for every committed head-to-head sample set that
# belongs to the live (non-EMA) readout comparison
MANIFEST = [
    ("reference", "seed0@final", H2H / "refrun/eval_samples/eval_008"),
    ("reference", "seed1@final", H2H / "refrun-seed1/eval_samples/eval_008"),
    ("reference", "seed2@final", H2H / "refrun-seed2/eval_samples/eval_008"),
    ("tpu", "seed0@1000", H2H / "tpurun_samples/iter_001000"),
    ("tpu", "seed0@1200", H2H / "tpurun_samples/iter_001200"),
    ("tpu", "seed0@1600", H2H / "tpurun_samples/iter_001600"),
    ("tpu", "seed1@1200", H2H / "tpurun_samples_seed1/iter_001200"),
    ("tpu", "seed1@1600", H2H / "tpurun_samples_seed1/iter_001600"),
    ("tpu", "seed2@1200", H2H / "tpurun_samples_seed2/iter_001200"),
    ("tpu", "seed2@1600", H2H / "tpurun_samples_seed2/iter_001600"),
    ("tpu", "seed3@1600", H2H / "tpurun_samples_seed3/iter_001600"),
]


def load_clips(d: Path, limit: Optional[int] = None) -> np.ndarray:
    """Decode a directory of mp4s ONCE (uint8 clips are reused by every
    embedding — decode is the dominant cost of a multi-embedding pass)."""
    paths = sorted(Path(d).glob("*.mp4"))
    if limit:
        paths = paths[:limit]
    if not paths:
        raise FileNotFoundError(f"no .mp4 files in {d}")
    return read_clips(paths)


def embed_clips(extractor, clips: np.ndarray, batchsize: int = 32):
    feats, probs = [], []
    for s in range(0, len(clips), batchsize):
        f, p = extractor(clips[s : s + batchsize], batchsize)
        feats.append(f)
        probs.append(p)
    return np.concatenate(feats), np.concatenate(probs)


def build_embeddings(args) -> Dict[str, object]:
    from dcvgan_tpu.eval.features import FeatureExtractor

    embeddings: Dict[str, object] = {}
    for w in args.weights:
        embeddings[f"trained:{Path(w).stem}"] = FeatureExtractor(
            weights_path=str(w)
        )
    for seed in args.seeds:
        for width in args.widths:
            embeddings[f"random:s{seed}w{width}"] = FeatureExtractor(
                seed=seed, width=width
            )
    return embeddings


def summarize(rows: List[dict]) -> dict:
    """Per-embedding no-regression summary (the claim under test in
    HEADTOHEAD.md).

    Reports two families of flags:

    - best-of-k (``tpu_no_regression_best`` /
      ``_median_per_seed``): kept for artifact continuity, but biased
      toward the side with more late checkpoints (ADVICE r4: the
      reference side only has one final eval per seed committed).
    - like-for-like (``tpu_no_regression_final_best`` /
      ``_final_median``): each seed contributes exactly its LAST
      committed checkpoint ("@final", or the highest "@iter") on BOTH
      sides — cite these.
    """
    def parse_run(run: str):
        """(seed, checkpoint order). Tolerant of label variants: no "@"
        or "@final" = the run's final eval; a non-numeric tag sorts
        before every numbered checkpoint (never selected as final unless
        it is all a seed has)."""
        seed, _, tag = run.partition("@")
        if tag in ("", "final"):
            return seed, float("inf")
        if tag.isdigit():
            return seed, int(tag)
        return seed, float("-inf")

    summ: dict = {}
    for side in ("reference", "tpu"):
        fids = [r["fid"] for r in rows if r["side"] == side]
        per_seed_best: Dict[str, float] = {}
        per_seed_final: Dict[str, float] = {}
        per_seed_last_order: Dict[str, float] = {}
        for r in rows:
            if r["side"] != side:
                continue
            seed, order = parse_run(r["run"])
            per_seed_best[seed] = min(
                per_seed_best.get(seed, float("inf")), r["fid"]
            )
            if order >= per_seed_last_order.get(seed, float("-inf")):
                per_seed_last_order[seed] = order
                per_seed_final[seed] = r["fid"]
        summ[side] = {
            "best_fid": min(fids),
            "median_fid": float(np.median(fids)),
            "median_per_seed_best_fid": float(
                np.median(list(per_seed_best.values()))
            ),
            "median_per_seed_final_fid": float(
                np.median(list(per_seed_final.values()))
            ),
            "best_per_seed_final_fid": min(per_seed_final.values()),
        }
    summ["tpu_no_regression_best"] = bool(
        summ["tpu"]["best_fid"] <= summ["reference"]["best_fid"]
    )
    summ["tpu_no_regression_median_per_seed"] = bool(
        summ["tpu"]["median_per_seed_best_fid"]
        <= summ["reference"]["median_per_seed_best_fid"]
    )
    summ["tpu_no_regression_final_median"] = bool(
        summ["tpu"]["median_per_seed_final_fid"]
        <= summ["reference"]["median_per_seed_final_fid"]
    )
    summ["tpu_no_regression_final_best"] = bool(
        summ["tpu"]["best_per_seed_final_fid"]
        <= summ["reference"]["best_per_seed_final_fid"]
    )
    return summ


def resummarize(path: Path) -> dict:
    """Recompute summaries from an existing scores JSON (the embedding
    rows are deterministic; only the summary math changed in round 5)."""
    data = json.loads(path.read_text())
    data["summary"] = {
        name: summarize(rows) for name, rows in data["embeddings"].items()
    }
    path.write_text(json.dumps(data, indent=1))
    return data


def score_all(args) -> dict:
    from dcvgan_tpu.eval.metrics import score_features

    embeddings = build_embeddings(args)
    manifest = [(s, r, p) for s, r, p in MANIFEST if p.is_dir()]
    missing = [str(p) for _, _, p in MANIFEST if not p.is_dir()]
    out: dict = {"missing_sets": missing, "embeddings": {}, "summary": {}}
    real_clips = load_clips(args.real)
    clip_sets = [(s, r, load_clips(p)) for s, r, p in manifest]
    for name, ex in embeddings.items():
        ref_feats, _ = embed_clips(ex, real_clips, args.batchsize)
        rows: List[dict] = []
        for side, run, clips in clip_sets:
            feats, probs = embed_clips(ex, clips, args.batchsize)
            scores = score_features(["is", "fid"], feats, probs, ref_feats)
            rows.append(
                {"side": side, "run": run,
                 **{k: round(v, 4) for k, v in scores.items()}}
            )
            print(f"[{name}] {side}/{run}: {scores}", flush=True)
        out["embeddings"][name] = rows
        out["summary"][name] = summarize(rows)
        # incremental write: embeddings are independent legs
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(out, indent=1))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--real", type=Path,
                    help="real mp4 dir (data/processed/synthetic/train/color);"
                         " required unless --resummarize")
    ap.add_argument("--weights", nargs="*", type=Path,
                    default=[REPO / "assets/extractor-synthetic.npz"])
    ap.add_argument("--seeds", nargs="*", type=int, default=[1, 2])
    ap.add_argument("--widths", nargs="*", type=int, default=[64])
    ap.add_argument("--batchsize", type=int, default=32)
    ap.add_argument("--out", type=Path,
                    default=REPO / "results/multiembed_scores.json")
    ap.add_argument("--resummarize", nargs="*", type=Path, default=None,
                    help="recompute summaries in existing scores JSONs "
                         "(no re-embedding) and exit")
    args = ap.parse_args(argv)
    if args.resummarize is not None:
        if not args.resummarize:
            ap.error("--resummarize needs at least one scores-JSON path")
        for p in args.resummarize:
            out = resummarize(p)
            print(p)
            print(json.dumps(out["summary"], indent=1))
        return
    if args.real is None:
        ap.error("--real is required unless --resummarize")
    _configure_jax_cpu()
    out = score_all(args)
    print(json.dumps(out["summary"], indent=1))


if __name__ == "__main__":
    main()
