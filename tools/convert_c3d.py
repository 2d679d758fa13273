"""Convert a public pretrained PyTorch C3D checkpoint to the extractor .npz.

The reference's quantitative evaluation embeds videos with ``evan``'s
pretrained C3D/UCF-101 network (/root/reference/src/trainer.py:209-219,
/root/reference/requirements.txt:10). This tool maps a public C3D torch
state dict — e.g. DavideA/c3d-pytorch's Sports-1M ``c3d.pickle`` or any
UCF-101 fine-tune with the standard layer names ``conv1..conv5b, fc6, fc7,
fc8`` — onto the flax parameter tree of :class:`dcvgan_tpu.eval.features.C3D`::

    python tools/convert_c3d.py c3d.pickle c3d_ucf101.npz \
        [--mean 101.2 97.57 89.53]

and ``cli/evaluate.py --weights c3d_ucf101.npz`` (or
``Evaluator(extractor=FeatureExtractor(weights_path=...))`` during training)
then produces absolute IS/FID/FVD scores. Every score record carries the
extractor fingerprint (sha256 of the .npz), so scores are comparable across
rounds exactly when the fingerprint matches.

Layout mapping (validated numerically in tests/test_c3d_convert.py):

- Conv3d weights: torch ``(O, I, kT, kH, kW)`` -> flax ``(kT, kH, kW, I, O)``,
- Dense: torch ``(out, in)`` -> flax ``(in, out)``,
- fc6 additionally permutes its input columns: torch flattens pool5 output
  in ``(C, T, H, W)`` order, flax in ``(T, H, W, C)`` order,
- ``--mean``: per-channel RGB means on the 0-255 scale subtracted at
  embedding time (stored in the .npz as ``__meta__/mean``). The default is
  the Sports-1M mean-cube channel average in RGB order. Pass the means your
  checkpoint was trained with for exact protocol parity.

Accepts raw state dicts, ``{"state_dict": ...}`` wrappers, and ``module.``
prefixes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

CONVS = ["conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b", "conv5a", "conv5b"]
FCS = ["fc6", "fc7", "fc8"]
POOL5_SHAPE = (512, 1, 4, 4)  # torch (C, T, H, W) flatten source for fc6
SPORTS1M_MEAN_RGB = (101.2, 97.57, 89.53)


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def normalize_state_dict(sd: dict) -> dict:
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k.removeprefix("module."): v for k, v in sd.items()}


def fc6_permutation() -> np.ndarray:
    """Column permutation taking torch's (C,T,H,W)-flattened pool5 index to
    flax's (T,H,W,C)-flattened index."""
    c, t, h, w = POOL5_SHAPE
    idx = np.arange(c * t * h * w).reshape(c, t, h, w)
    return idx.transpose(1, 2, 3, 0).reshape(-1)  # flax position -> torch index


def convert_state_dict(sd: dict) -> dict:
    """Torch C3D state dict -> flat {flax_key: array} for np.savez."""
    sd = normalize_state_dict(sd)
    out = {}
    for name in CONVS:
        w = _to_numpy(sd[f"{name}.weight"])  # (O, I, kT, kH, kW)
        out[f"{name}/kernel"] = np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))
        out[f"{name}/bias"] = _to_numpy(sd[f"{name}.bias"])
    perm = fc6_permutation()
    for name in FCS:
        w = _to_numpy(sd[f"{name}.weight"]).T  # (in, out)
        if name == "fc6":
            if w.shape[0] != perm.size:
                raise ValueError(
                    f"fc6 input dim {w.shape[0]} != {perm.size}; not a "
                    f"112x112/16-frame C3D checkpoint"
                )
            w = w[perm]
        out[f"{name}/kernel"] = np.ascontiguousarray(w)
        out[f"{name}/bias"] = _to_numpy(sd[f"{name}.bias"])
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint", type=Path, help="torch .pth/.pickle state dict")
    parser.add_argument("output", type=Path, help="output .npz path")
    parser.add_argument(
        "--mean",
        type=float,
        nargs=3,
        default=list(SPORTS1M_MEAN_RGB),
        metavar=("R", "G", "B"),
        help="channel means (0-255 scale) subtracted before embedding",
    )
    args = parser.parse_args(argv)

    import torch

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    flat = convert_state_dict(sd)
    flat["__meta__/topology"] = np.asarray("c3d")
    flat["__meta__/mean"] = np.asarray(args.mean, dtype=np.float32)
    np.savez(args.output, **flat)

    import hashlib

    digest = hashlib.sha256(args.output.read_bytes()).hexdigest()
    n_cls = flat["fc8/bias"].shape[0]
    print(
        f"wrote {args.output} ({n_cls} classes); "
        f"fingerprint c3d-npz/sha256={digest[:16]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
