"""tools/train_extractor.py: synthetic classifier -> loadable extractor npz."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from train_extractor import (  # noqa: E402
    NUM_CLASSES,
    save_npz,
    synth_labeled_batch,
    train,
)


def test_synth_labeled_batch_properties():
    rng = np.random.default_rng(0)
    videos, labels = synth_labeled_batch(rng, 8, 16, 32)
    assert videos.shape == (8, 16, 32, 32, 3) and videos.dtype == np.uint8
    assert labels.shape == (8,)
    assert labels.min() >= 0 and labels.max() < NUM_CLASSES
    # frames actually move: consecutive frames differ in most clips
    moved = sum(
        int(np.any(videos[b, 0] != videos[b, -1])) for b in range(8)
    )
    assert moved >= 7


def test_train_and_load_roundtrip(tmp_path):
    """A few tiny training steps; saved npz loads into FeatureExtractor with
    the non-default width inferred from the tree, and embeds videos."""
    params, _, holdout_acc = train(
        steps=4, batch=4, width=4, feature_dim=8, t=4, s=16, seed=0,
        log_every=100,
    )
    assert 0.0 <= holdout_acc <= 1.0
    out = tmp_path / "extractor.npz"
    save_npz(
        out, params, {"topology": "small", "holdout_acc": holdout_acc}
    )

    from dcvgan_tpu.eval.features import FeatureExtractor

    ex = FeatureExtractor(weights_path=str(out))
    assert ex.fingerprint.startswith("small-npz/sha256=")
    vids = np.zeros((3, 4, 16, 16, 3), np.uint8)
    feats, probs = ex(vids, batchsize=2)
    assert feats.shape == (3, 8)
    assert probs.shape == (3, NUM_CLASSES)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
