"""Numerical parity of the C3D converter (tools/convert_c3d.py) against a
torch C3D with the standard public-checkpoint topology/naming.

Mirrors tests/test_torch_parity.py's approach for the 5 GAN models: build
the torch network with random weights, convert, compare outputs.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_c3d import convert_state_dict, fc6_permutation  # noqa: E402


class TorchC3D(nn.Module):
    """Standard C3D (DavideA/c3d-pytorch layer names and shapes)."""

    def __init__(self, num_classes=487):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, 3, padding=1)
        self.pool1 = nn.MaxPool3d((1, 2, 2), (1, 2, 2))
        self.conv2 = nn.Conv3d(64, 128, 3, padding=1)
        self.pool2 = nn.MaxPool3d(2, 2)
        self.conv3a = nn.Conv3d(128, 256, 3, padding=1)
        self.conv3b = nn.Conv3d(256, 256, 3, padding=1)
        self.pool3 = nn.MaxPool3d(2, 2)
        self.conv4a = nn.Conv3d(256, 512, 3, padding=1)
        self.conv4b = nn.Conv3d(512, 512, 3, padding=1)
        self.pool4 = nn.MaxPool3d(2, 2)
        self.conv5a = nn.Conv3d(512, 512, 3, padding=1)
        self.conv5b = nn.Conv3d(512, 512, 3, padding=1)
        self.pool5 = nn.MaxPool3d(2, 2, padding=(0, 1, 1))
        self.fc6 = nn.Linear(8192, 4096)
        self.fc7 = nn.Linear(4096, 4096)
        self.fc8 = nn.Linear(4096, num_classes)
        self.relu = nn.ReLU()

    def forward(self, x):  # x: (B, 3, 16, 112, 112)
        x = self.pool1(self.relu(self.conv1(x)))
        x = self.pool2(self.relu(self.conv2(x)))
        x = self.pool3(self.relu(self.conv3b(self.relu(self.conv3a(x)))))
        x = self.pool4(self.relu(self.conv4b(self.relu(self.conv4a(x)))))
        x = self.pool5(self.relu(self.conv5b(self.relu(self.conv5a(x)))))
        x = x.flatten(1)  # (B, 8192) in (C, T, H, W) order
        feats = self.relu(self.fc6(x))
        logits = self.fc8(self.relu(self.fc7(feats)))
        return feats, logits


def test_fc6_permutation_roundtrip():
    perm = fc6_permutation()
    assert sorted(perm.tolist()) == list(range(8192))
    # torch flat index of (c, t, h, w) must land at flax flat index (t, h, w, c)
    c, t, h, w = 3, 0, 2, 1
    torch_idx = ((c * 1 + t) * 4 + h) * 4 + w
    flax_idx = ((t * 4 + h) * 4 + w) * 512 + c
    assert perm[flax_idx] == torch_idx


def test_c3d_conversion_output_parity(tmp_path):
    torch.manual_seed(0)
    num_classes = 11
    tm = TorchC3D(num_classes).eval()
    # non-default weights so parity isn't trivially zero-biased
    with torch.no_grad():
        for p in tm.parameters():
            p.mul_(0.3).add_(torch.randn_like(p) * 0.02)

    flat = convert_state_dict(tm.state_dict())
    flat["__meta__/topology"] = np.asarray("c3d")
    npz = tmp_path / "c3d.npz"
    np.savez(npz, **flat)

    from dcvgan_tpu.eval.features import FeatureExtractor

    ex = FeatureExtractor(weights_path=str(npz))
    assert ex.fingerprint.startswith("c3d-npz/sha256=")
    assert ex.model.num_classes == num_classes

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 112, 112, 3)).astype(np.float32)
    feats_j, logits_j = ex.model.apply(ex.variables, x)

    with torch.no_grad():
        feats_t, logits_t = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))

    np.testing.assert_allclose(
        np.asarray(feats_j), feats_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), atol=2e-4, rtol=1e-3
    )


def test_extractor_c3d_end_to_end(tmp_path):
    """uint8 64x64 videos flow through the converted extractor (resize +
    mean subtraction on device) and produce finite features/probs."""
    torch.manual_seed(1)
    tm = TorchC3D(7).eval()
    flat = convert_state_dict({"state_dict": {
        "module." + k: v for k, v in tm.state_dict().items()
    }})  # wrapper + prefix handling
    flat["__meta__/topology"] = np.asarray("c3d")
    flat["__meta__/mean"] = np.asarray([101.2, 97.57, 89.53], np.float32)
    npz = tmp_path / "c3d.npz"
    np.savez(npz, **flat)

    from dcvgan_tpu.eval.features import FeatureExtractor

    ex = FeatureExtractor(weights_path=str(npz))
    vids = np.random.default_rng(0).integers(
        0, 256, (3, 16, 64, 64, 3), dtype=np.uint8
    )
    feats, probs = ex(vids, batchsize=2)
    assert feats.shape == (3, 4096)
    assert probs.shape == (3, 7)
    assert np.all(np.isfinite(feats))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
