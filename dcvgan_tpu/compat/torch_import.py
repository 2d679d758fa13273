"""Import reference (PyTorch) DCVGAN checkpoints into this framework.

A user of the reference can bring trained weights across: the reference
snapshots ``<name>_params_<iter:05d>.pth`` state dicts
(/root/reference/src/trainer.py:78-86); these functions map them onto our
flax parameter/batch-stats trees with exact numerical parity (validated
layer-by-layer in tests/test_torch_parity.py):

- Conv2d/Conv3d: torch ``(O, I, k…)`` -> flax ``(k…, I, O)``,
- ConvTranspose2d: torch ``(I, O, kH, kW)`` -> flax ``(kH, kW, O, I)``
  (our ConvTranspose layers use ``transpose_kernel=True``, the exact
  adjoint-of-conv semantics torch implements),
- BatchNorm: weight/bias -> scale/bias, running stats -> batch_stats,
- GRUCell: torch packs gates r|z|n into ``(3H, ·)`` with two bias vectors;
  flax splits per-gate ``ir/iz/in/hr/hz/hn`` where the r/z input biases
  absorb both torch biases (``b_ir + b_hr``) and ``hn`` keeps its own bias
  inside the reset gate product — matching torch's
  ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``.

Inputs are plain ``{name: np.ndarray}`` dicts, so callers can feed
``torch.load(...).items()`` without this module importing torch.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, Any]


def _np(sd: Dict[str, Any], key: str) -> Array:
    v = sd[key]
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv2d_kernel(w: Array) -> Array:
    """(O, I, kH, kW) -> (kH, kW, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def convT2d_kernel(w: Array) -> Array:
    """(I, O, kH, kW) -> (kH, kW, O, I) for transpose_kernel=True layers."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def conv3d_kernel(w: Array) -> Array:
    """(O, I, kT, kH, kW) -> (kT, kH, kW, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def bn_params(sd: Dict[str, Any], prefix: str) -> Tuple[Tree, Tree]:
    params = {
        "scale": _np(sd, f"{prefix}.weight"),
        "bias": _np(sd, f"{prefix}.bias"),
    }
    stats = {
        "mean": _np(sd, f"{prefix}.running_mean"),
        "var": _np(sd, f"{prefix}.running_var"),
    }
    return params, stats


def gru_cell(sd: Dict[str, Any], prefix: str) -> Tree:
    """torch GRUCell -> flax GRUCell tree (see module docstring)."""
    w_ih = _np(sd, f"{prefix}.weight_ih")  # (3H, I) rows r|z|n
    w_hh = _np(sd, f"{prefix}.weight_hh")  # (3H, H)
    b_ih = _np(sd, f"{prefix}.bias_ih")  # (3H,)
    b_hh = _np(sd, f"{prefix}.bias_hh")
    h = w_hh.shape[1]
    w_ir, w_iz, w_in = w_ih[:h], w_ih[h : 2 * h], w_ih[2 * h :]
    w_hr, w_hz, w_hn = w_hh[:h], w_hh[h : 2 * h], w_hh[2 * h :]
    b_ir, b_iz, b_in = b_ih[:h], b_ih[h : 2 * h], b_ih[2 * h :]
    b_hr, b_hz, b_hn = b_hh[:h], b_hh[h : 2 * h], b_hh[2 * h :]
    return {
        "ir": {"kernel": w_ir.T, "bias": b_ir + b_hr},
        "iz": {"kernel": w_iz.T, "bias": b_iz + b_hz},
        "in": {"kernel": w_in.T, "bias": b_in},
        "hr": {"kernel": w_hr.T},
        "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T, "bias": b_hn},
    }


# ------------------------------------------------------------------- models
def ggen_from_torch(sd: Dict[str, Any]) -> Tuple[Tree, Tree]:
    """GeometricVideoGenerator state dict -> (params, batch_stats).

    Reference layout (/root/reference/src/generator.py:60-80): Sequential
    ``main`` of [ConvT, BN, ReLU]×4 + ConvT, so convs sit at 3i and BNs at
    3i+1.
    """
    params: Tree = {"recurrent": {"cell": gru_cell(sd, "recurrent")}}
    stats: Tree = {}
    n_up = 0
    while f"main.{3 * n_up + 1}.weight" in sd:
        n_up += 1
    for i in range(n_up):
        params[f"ups_{i}"] = {"kernel": convT2d_kernel(_np(sd, f"main.{3 * i}.weight"))}
        bn_p, bn_s = bn_params(sd, f"main.{3 * i + 1}")
        params[f"bns_{i}"] = bn_p
        stats[f"bns_{i}"] = bn_s
    params[f"ups_{n_up}"] = {
        "kernel": convT2d_kernel(_np(sd, f"main.{3 * n_up}.weight"))
    }
    return params, stats


def cgen_from_torch(sd: Dict[str, Any]) -> Tuple[Tree, Tree]:
    """ColorVideoGenerator state dict -> (params, batch_stats).

    Reference layout (/root/reference/src/generator.py:158-345): inconv /
    down_blocks[i] / up_blocks[i] each a Sequential with conv at 0, BN at 1.
    """
    params: Tree = {
        "inconv": {"kernel": conv2d_kernel(_np(sd, "inconv.main.0.weight"))}
    }
    stats: Tree = {}
    i = 0
    while f"down_blocks.{i}.main.0.weight" in sd:
        params[f"down{i}_conv"] = {
            "kernel": conv2d_kernel(_np(sd, f"down_blocks.{i}.main.0.weight"))
        }
        bn_p, bn_s = bn_params(sd, f"down_blocks.{i}.main.1")
        params[f"down{i}_bn"] = bn_p
        stats[f"down{i}_bn"] = bn_s
        i += 1
    i = 0
    while f"up_blocks.{i}.main.0.weight" in sd:
        params[f"up{i}_conv"] = {
            "kernel": convT2d_kernel(_np(sd, f"up_blocks.{i}.main.0.weight"))
        }
        bn_p, bn_s = bn_params(sd, f"up_blocks.{i}.main.1")
        params[f"up{i}_bn"] = bn_p
        stats[f"up{i}_bn"] = bn_s
        i += 1
    params["outconv"] = {
        "kernel": convT2d_kernel(_np(sd, "outconv.main.0.weight"))
    }
    return params, stats


def idis_from_torch(sd: Dict[str, Any]) -> Tuple[Tree, Tree]:
    """ImageDiscriminator (/root/reference/src/discriminator.py:79-102):
    stems have Noise at 0 / Conv at 1; main has convs at 1, 5, 9 and BNs at
    2, 6."""
    params: Tree = {
        "conv_g": {"kernel": conv2d_kernel(_np(sd, "conv_g.1.weight"))},
        "conv_c": {"kernel": conv2d_kernel(_np(sd, "conv_c.1.weight"))},
        "conv_1": {"kernel": conv2d_kernel(_np(sd, "main.1.weight"))},
        "conv_2": {"kernel": conv2d_kernel(_np(sd, "main.5.weight"))},
        "conv_3": {"kernel": conv2d_kernel(_np(sd, "main.9.weight"))},
    }
    stats: Tree = {}
    for our, theirs in [("bn_1", "main.2"), ("bn_2", "main.6")]:
        bn_p, bn_s = bn_params(sd, theirs)
        params[our] = bn_p
        stats[our] = bn_s
    return params, stats


def vdis_from_torch(sd: Dict[str, Any]) -> Tuple[Tree, Tree]:
    """VideoDiscriminator (/root/reference/src/discriminator.py:180-207):
    stems have Conv3d at 0 (no Noise); main as in idis but Conv3d."""
    params: Tree = {
        "conv_g": {"kernel": conv3d_kernel(_np(sd, "conv_g.0.weight"))},
        "conv_c": {"kernel": conv3d_kernel(_np(sd, "conv_c.0.weight"))},
        "conv_1": {"kernel": conv3d_kernel(_np(sd, "main.1.weight"))},
        "conv_2": {"kernel": conv3d_kernel(_np(sd, "main.5.weight"))},
        "conv_3": {"kernel": conv3d_kernel(_np(sd, "main.9.weight"))},
    }
    stats: Tree = {}
    for our, theirs in [("bn_1", "main.2"), ("bn_2", "main.6")]:
        bn_p, bn_s = bn_params(sd, theirs)
        params[our] = bn_p
        stats[our] = bn_s
    return params, stats


def gdis_from_torch(sd: Dict[str, Any]) -> Tuple[Tree, Tree]:
    """GradientDiscriminator (/root/reference/src/discriminator.py:285-306):
    single main with convs at 1, 5, 9, 13 and BNs at 2, 6, 10."""
    params: Tree = {
        "conv_1": {"kernel": conv3d_kernel(_np(sd, "main.1.weight"))},
        "conv_2": {"kernel": conv3d_kernel(_np(sd, "main.5.weight"))},
        "conv_3": {"kernel": conv3d_kernel(_np(sd, "main.9.weight"))},
        "conv_4": {"kernel": conv3d_kernel(_np(sd, "main.13.weight"))},
    }
    stats: Tree = {}
    for our, theirs in [("bn_1", "main.2"), ("bn_2", "main.6"), ("bn_3", "main.10")]:
        bn_p, bn_s = bn_params(sd, theirs)
        params[our] = bn_p
        stats[our] = bn_s
    return params, stats


_CONVERTERS = {
    "ggen": ggen_from_torch,
    "cgen": cgen_from_torch,
    "idis": idis_from_torch,
    "vdis": vdis_from_torch,
    "gdis": gdis_from_torch,
}


def load_reference_state_dicts(
    models_dir: Path, iteration: int
) -> Dict[str, Tuple[Tree, Tree]]:
    """Load every ``<name>_params_<iter:05d>.pth`` from a reference run's
    ``models/`` directory (reference save layout,
    /root/reference/src/trainer.py:78-86) and convert to our trees."""
    import torch

    out = {}
    for name, convert in _CONVERTERS.items():
        path = Path(models_dir) / f"{name}_params_{iteration:05d}.pth"
        if not path.exists():
            continue
        sd = torch.load(path, map_location="cpu", weights_only=True)
        out[name] = convert({k: v for k, v in sd.items()})
    return out
