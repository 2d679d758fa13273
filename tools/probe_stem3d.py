"""Probe faster lowerings for the 3D-critic stem convolutions.

The conv microbenchmark (results/conv_microbench.json) shows the vdis/gdis
stem convs — Conv3d k=(4,4,4) stride=(1,2,2) pad=(0,1,1) on 1–3 channel
geometry/color streams (reference `src/discriminator.py:180-207,285-306`)
— are the single largest conv cost in the b=20 train step (~9.5 ms of the
~26 ms conv-only time) while running ~46x above their HBM speed-of-light:
XLA's direct 3D lowering handles tiny Cin terribly.

All candidates below are EXACT reformulations (same math, identical
parameter tree; weights are reshaped/transposed in the forward pass only):

- direct:   lax.conv_general_dilated 3D, as the models do today
- tap_sum:  unroll the 4 temporal taps into 4 2D convs and add
            (out[t] = sum_dt conv2d(x[t+dt], w[dt]))
- tstack:   temporal im2col — stack the 4 shifted views on channels
            ((B,T',H,W,4C)) and run ONE standard 2D conv k4 s2 p1 with
            Cin=4C (the 64-wide contraction XLA tiles like any U-Net conv)
- cin_pad:  zero-pad Cin 1->8 on the direct 3D conv (tests whether XLA's
            problem is just the sub-lane channel count)

Each is checked numerically against `direct` then timed in a serialized
on-device scan. Prints one JSON line per (signature, variant).

Usage::

    python tools/probe_stem3d.py [--batch 20] [--iters 30]
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

# (name, T_in, C_in): the three stem signatures in the b=20 step
SIGS = (
    ("vdis_geo", 16, 1),
    ("vdis_color", 16, 3),
    ("gdis_geo", 15, 1),
)
KT, KS, COUT = 4, 4, 32  # k=(4,4,4), ndf/2 = 32 at flagship size
DN3 = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)
DN2 = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def direct(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 2, 2), ((0, 0), (1, 1), (1, 1)), dimension_numbers=DN3
    )


def tap_sum(x, w):
    b, t, h, _, c = x.shape
    tout = t - KT + 1
    out = None
    for dt in range(KT):
        xi = x[:, dt : dt + tout].reshape(b * tout, h, h, c)
        y = lax.conv_general_dilated(
            xi, w[dt], (2, 2), ((1, 1), (1, 1)), dimension_numbers=DN2
        )
        out = y if out is None else out + y
    return out.reshape(b, tout, h // 2, h // 2, COUT)


def tstack(x, w):
    b, t, h, _, c = x.shape
    tout = t - KT + 1
    # (B, T', H, W, KT*C): channel ordering (dt, ci) must match the
    # weight reshape below
    stacked = jnp.concatenate([x[:, dt : dt + tout] for dt in range(KT)], axis=-1)
    # w (KT, KS, KS, C, COUT) -> (KS, KS, KT*C, COUT)
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(KS, KS, KT * c, COUT)
    y = lax.conv_general_dilated(
        stacked.reshape(b * tout, h, h, KT * c),
        w2,
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=DN2,
    )
    return y.reshape(b, tout, h // 2, h // 2, COUT)


def cin_pad(x, w, to: int = 8):
    c = x.shape[-1]
    x8 = jnp.pad(x, ((0, 0),) * 4 + ((0, to - c),))
    w8 = jnp.pad(w, ((0, 0),) * 3 + ((0, to - c), (0, 0)))
    return direct(x8, w8)


VARIANTS = {
    "direct": direct,
    "tap_sum": tap_sum,
    "tstack": tstack,
    "cin_pad": cin_pad,
}


def timed(fn, x, w, iters, rtt):
    def loop(x0):
        def body(carry, _):
            y = fn(carry, w)
            probe = lax.slice(y, (0,) * y.ndim, (1,) * y.ndim)
            return carry + (probe.reshape(()) * 0).astype(carry.dtype), None

        out, _ = lax.scan(body, x0, None, length=iters)
        return out.reshape(-1)[0]

    compiled = jax.jit(loop).lower(x).compile()
    float(compiled(x))  # warm
    t0 = time.perf_counter()
    float(compiled(x))
    return max(1e-9, time.perf_counter() - t0 - rtt) / iters


def timed_resolved(fn, x, w, iters, rtt):
    """Re-time with more iterations until the loop dwarfs the tunnel RTT."""
    for mult in (1, 8, 64):
        n = iters * mult
        dt = timed(fn, x, w, n, rtt)
        if dt * n > 10 * max(rtt, 1e-3):
            return dt
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "stem3d_probe.json"
    )
    args = ap.parse_args(argv)

    rtt = bench._scalar_rtt()
    rows = []
    for name, t_in, c_in in SIGS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((args.batch, t_in, 64, 64, c_in)), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.standard_normal((KT, KS, KS, c_in, COUT)) * 0.05, jnp.bfloat16
        )
        ref = np.asarray(jax.jit(direct)(x, w), np.float32)
        for vname, fn in VARIANTS.items():
            got = np.asarray(jax.jit(fn)(x, w), np.float32)
            err = float(np.max(np.abs(got - ref)))
            dt = timed_resolved(fn, x, w, args.iters, rtt)
            row = {
                "sig": name,
                "variant": vname,
                "us": round(dt * 1e6, 1),
                "max_abs_err_vs_direct": err,
                "ok": bool(err <= 0.25),  # bf16 reassociation on |dot|~64
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        base = next(r for r in rows if r["sig"] == name and r["variant"] == "direct")
        for r in rows:
            if r["sig"] == name and r["us"] > 0:
                r["speedup_vs_direct"] = round(base["us"] / r["us"], 2)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))
    print(json.dumps({"wrote": str(args.out)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
