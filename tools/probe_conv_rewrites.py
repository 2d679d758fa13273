"""Probe faster lowerings for the remaining slow conv families at b=20.

After the 3D-stem fix (TimeStackConv3d), the conv microbenchmark
(results/conv_microbench.json) leaves four slow families in the flagship
train step, all tied to shapes XLA lowers far from their roofline:

- ``inconv_fwd`` — cgen Inconv 3x3 s1 Cin=1 (depth geometry): 0.8% MFU,
  21.6% of HBM speed-of-light (reference `src/generator.py:212-218`).
- ``lastdeconv_bwd`` — backward-data of ggen's final ConvTranspose
  (a regular s2 conv with Cin=1): 6.1% of memory SoL.
- ``idis_bwd{1,2,3}`` — backward-data (lhs_dilate) of the image critic's
  k4 s2 convs at batch 20: 0.5-0.9% of memory SoL, ~2.4 ms combined
  (reference `src/discriminator.py:82-118`).
- ``outconv_fwd`` — cgen Outconv conv-transpose 3x3 s1 128->3: Cout=3
  fills 3/128 of an MXU output tile (reference `src/generator.py:258-266`).

Candidate rewrites (all EXACT reformulations, bf16 reassociation aside):

- ``im2col9``: 3x3 s1 Cin=1 -> stack the 9 shifted views on channels,
  contract with a 1x1 conv (Cin'=9).
- ``tapstack16``: k4 s2 Cin=1 -> stack the 16 strided tap views at the
  output resolution, contract with a 1x1 conv (Cin'=16).
- ``phase4``: backward-data of a k4 s2 p1 conv == 4 dense k2 s1 convs of
  the cotangent (one per 2x2 output phase, sub-kernels
  d_h(a,r)=3-2a+... see _phase_kernels) + an interleave — replaces XLA's
  lhs_dilate lowering, which pays for the zero lattice.
- ``cout_pad8``: pad Cout 3->8 on the outconv (tests tile-fill only).

Backward-data variants are checked against ``jax.vjp`` of the forward
conv (the exact op the train step autodiffs into) and timed the same
device-resident way as tools/probe_stem3d.py.

Usage::

    python tools/probe_conv_rewrites.py [--iters 30] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import bench

DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv2d(x, w, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=DN2
    )


# ---------------------------------------------------------------- forwards


def im2col9(x, w):
    """3x3 s1 p1 conv via 9 shifted views + 1x1 contraction (small Cin)."""
    b, h, wd, c = x.shape
    kh, kw, _, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        xp[:, dy : dy + h, dx : dx + wd] for dy in range(kh) for dx in range(kw)
    ]
    stacked = jnp.concatenate(views, axis=-1)  # (B,H,W,9C) in (dy,dx,ci) order
    w2 = w.reshape(kh * kw * c, cout)[None, None]  # 1x1 kernel, same order
    return conv2d(stacked, w2, stride=1, pad=0)


def tapstack16(x, w):
    """k4 s2 p1 conv via 16 strided tap views + 1x1 contraction (small Cin)."""
    b, h, wd, c = x.shape
    k, _, _, cout = w.shape
    hout, wout = h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        xp[:, dy : dy + 2 * hout : 2, dx : dx + 2 * wout : 2]
        for dy in range(k)
        for dx in range(k)
    ]
    stacked = jnp.concatenate(views, axis=-1)  # (B,H/2,W/2,16C)
    w2 = w.reshape(k * k * c, cout)[None, None]
    return conv2d(stacked, w2, stride=1, pad=0)


def outconv_direct(x, w):
    """ConvTranspose 3x3 s1 with transpose_kernel=True == conv with the
    kernel flipped spatially and io-swapped (what flax emits)."""
    wf = jnp.flip(w, (0, 1)).swapaxes(2, 3)  # (3,3,cout,cin) -> conv HWIO
    return conv2d(x, wf, stride=1, pad=1)


def outconv_cout_pad8(x, w):
    cout = w.shape[2]  # transpose-kernel layout (kh,kw,cout,cin)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 8 - cout), (0, 0)))
    return outconv_direct(x, wp)[..., :cout]


# ------------------------------------------------- backward-data rewrites


def _phase_kernels(w):
    """Sub-kernels for the 4-phase backward-data of a k4 s2 p1 conv.

    dx[2q+r] = sum over the two taps d with d = r+1 (mod 2): per dim,
    phase r=0 uses taps (3, 1) at dy[q-1], dy[q]; r=1 uses (2, 0) at
    dy[q], dy[q+1]. Returns K[r0][r1] of shape (2,2,Cout,Cin) plus the
    per-dim paddings.
    """
    taps = {0: (3, 1), 1: (2, 0)}  # r -> (tap at first window slot, second)
    pads = {0: (1, 0), 1: (0, 1)}
    ks = {}
    for r0 in (0, 1):
        for r1 in (0, 1):
            rows = []
            for a in (0, 1):
                cols = []
                for b_ in (0, 1):
                    cols.append(w[taps[r0][a], taps[r1][b_]])  # (Cin,Cout)
                rows.append(jnp.stack(cols, 0))
            k = jnp.stack(rows, 0)  # (2,2,Cin,Cout)
            ks[(r0, r1)] = jnp.swapaxes(k, 2, 3)  # contract over Cout
    return ks, pads


def phase4_bwd(dy, w):
    """dx of conv2d(x, w, stride=2, pad=1) with k=4, via 4 dense k2 convs."""
    b, h2, w2_, cout = dy.shape
    cin = w.shape[2]
    ks, pads = _phase_kernels(w)
    phases = []
    for r0 in (0, 1):
        row = []
        for r1 in (0, 1):
            y = lax.conv_general_dilated(
                dy,
                ks[(r0, r1)],
                (1, 1),
                (pads[r0], pads[r1]),
                dimension_numbers=DN2,
            )
            row.append(y)  # (B,H2,W2,Cin)
        phases.append(jnp.stack(row, 0))
    ph = jnp.stack(phases, 0)  # (r0,r1,B,H2,W2,Cin)
    ph = jnp.transpose(ph, (2, 3, 0, 4, 1, 5))  # (B,H2,r0,W2,r1,Cin)
    return ph.reshape(b, 2 * h2, 2 * w2_, cin)


def direct_bwd(dy, w, x_shape):
    """The exact backward-data op the step autodiffs into (vjp of conv)."""
    _, f_vjp = jax.vjp(
        lambda x: conv2d(x, w, stride=2, pad=1), jnp.zeros(x_shape, dy.dtype)
    )
    return f_vjp(dy)[0]


# ------------------------------------------------------------------ timing


def timed(fn, args, iters, rtt):
    """Device-resident scan timing; dependency via a one-element probe."""

    def loop(a0):
        def body(carry, _):
            y = fn(carry, *args[1:])
            probe = lax.slice(y, (0,) * y.ndim, (1,) * y.ndim)
            return carry + (probe.reshape(()) * 0).astype(carry.dtype), None

        out, _ = lax.scan(body, a0, None, length=iters)
        return out.reshape(-1)[0]

    compiled = jax.jit(loop).lower(args[0]).compile()
    float(compiled(args[0]))  # warm
    t0 = time.perf_counter()
    float(compiled(args[0]))
    return max(1e-9, time.perf_counter() - t0 - rtt) / iters


def timed_resolved(fn, args, iters, rtt):
    for mult in (1, 8, 64):
        n = iters * mult
        dt = timed(fn, args, n, rtt)
        if dt * n > 10 * max(rtt, 1e-3):
            return dt
    return dt


def run_family(rows, name, variants, args_by_variant, ref_fn, iters, rtt, tol):
    ref = np.asarray(jax.jit(ref_fn)(*args_by_variant[next(iter(variants))]),
                     np.float32)
    base_us = None
    for vname, fn in variants.items():
        a = args_by_variant[vname]
        got = np.asarray(jax.jit(fn)(*a), np.float32)
        err = float(np.max(np.abs(got - ref)))
        dt = timed_resolved(fn, a, iters, rtt)
        row = {
            "sig": name,
            "variant": vname,
            "us": round(dt * 1e6, 1),
            "max_abs_err": err,
            "ok": bool(err <= tol),
        }
        if base_us is None:
            base_us = row["us"]
        row["speedup_vs_direct"] = round(base_us / row["us"], 2) if row["us"] else None
        rows.append(row)
        print(json.dumps(row), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "conv_rewrites_probe.json"
    )
    args = ap.parse_args(argv)
    rtt = bench._scalar_rtt()
    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    rows = []

    # cgen Inconv: 3x3 s1 Cin=1 -> 64, B*T=320
    x = bf(320, 64, 64, 1)
    w = bf(3, 3, 1, 64)
    run_family(
        rows, "inconv_fwd",
        {"direct": lambda x, w: conv2d(x, w, 1, 1), "im2col9": im2col9},
        {"direct": (x, w), "im2col9": (x, w)},
        lambda x, w: conv2d(x, w, 1, 1), args.iters, rtt, tol=0.02,
    )

    # ggen last-deconv backward-data == regular k4 s2 conv with Cin=1
    x = bf(320, 64, 64, 1)
    w = bf(4, 4, 1, 64)
    run_family(
        rows, "lastdeconv_bwd",
        {"direct": lambda x, w: conv2d(x, w, 2, 1), "tapstack16": tapstack16},
        {"direct": (x, w), "tapstack16": (x, w)},
        lambda x, w: conv2d(x, w, 2, 1), args.iters, rtt, tol=0.02,
    )

    # idis backward-data family (batch 20, k4 s2 p1 lhs_dilate in the step)
    for name, dyshape, wshape in (
        ("idis_bwd1", (20, 16, 16, 128), (4, 4, 64, 128)),
        ("idis_bwd2", (20, 8, 8, 256), (4, 4, 128, 256)),
        ("idis_bwd3", (20, 4, 4, 1), (4, 4, 256, 1)),
    ):
        dy = bf(*dyshape)
        w = bf(*wshape)
        xs = (dyshape[0], dyshape[1] * 2, dyshape[2] * 2, wshape[2])
        ref = lambda dy, w, xs=xs: direct_bwd(dy, w, xs)
        run_family(
            rows, name,
            {"direct": ref, "phase4": phase4_bwd},
            {"direct": (dy, w), "phase4": (dy, w)},
            ref, args.iters, rtt, tol=0.5,
        )

    # cgen/ggen up-convs: ConvTranspose k4 s2 'SAME' == the adjoint of the
    # k4 s2 p1 conv (models/layers.py up_conv), so phase4 is also a forward
    # rewrite for them. Representative step shapes (conv-layout kernels).
    for name, dyshape, wshape in (
        ("upconv_deep", (320, 4, 4, 512), (4, 4, 256, 512)),
        ("upconv_mid", (320, 16, 16, 128), (4, 4, 64, 128)),
        ("upconv_skip", (320, 16, 16, 256), (4, 4, 64, 256)),
    ):
        dy = bf(*dyshape)
        w = bf(*wshape)
        xs = (dyshape[0], dyshape[1] * 2, dyshape[2] * 2, wshape[2])
        ref = lambda dy, w, xs=xs: direct_bwd(dy, w, xs)
        run_family(
            rows, name,
            {"direct": ref, "phase4": phase4_bwd},
            {"direct": (dy, w), "phase4": (dy, w)},
            ref, args.iters, rtt, tol=0.5,
        )

    # cgen Outconv: conv-transpose 3x3 s1, 128 -> 3 (transpose-kernel layout)
    x = bf(320, 64, 64, 128)
    w = bf(3, 3, 3, 128)  # (kh,kw,cout,cin) as flax stores transpose kernels
    run_family(
        rows, "outconv_fwd",
        {"direct": outconv_direct, "cout_pad8": outconv_cout_pad8},
        {"direct": (x, w), "cout_pad8": (x, w)},
        outconv_direct, args.iters, rtt, tol=1.0,
    )

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))
    print(json.dumps({"wrote": str(args.out)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
