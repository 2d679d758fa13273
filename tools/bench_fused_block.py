"""Measure the Pallas fused normalize+act+conv prototype against XLA's
emission on the real chip (VERDICT r2 #2: prove or break the "conv-with-
fused-prologue is out-of-ROI" claim with numbers, not HLO reading).

Shapes are the model's own: the cgen U-Net down-block and critic stage
bodies run Conv2d(C, 2C, 4, 2, 1) after BN+LeakyReLU over B*T frames
(/root/reference/src/generator.py:200-216, discriminator.py:91-102), with
B=20 (flagship isogd-depth batch) and B=128 (bench sweep peak), T=16.

Prints one JSON line per (shape, dtype) with median times and the ratio;
results recorded in PERFORMANCE.md.

Usage::

    python tools/bench_fused_block.py [--iters 50] [--out results/fused_block.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from dcvgan_tpu.ops.fused_block import (  # noqa: E402
    fused_norm_act_conv,
    pack_weights,
    reference_norm_act_conv,
)

# (frames, H, W, Cin, Cout): every stride-2 down stage of the ngf=64 U-Net /
# ndf=64 critics at flagship (20*16=320 frames) and peak (128*16=2048) batch.
SHAPES = [
    (320, 64, 64, 64, 128),
    (320, 32, 32, 128, 256),
    (320, 16, 16, 256, 512),
    (2048, 64, 64, 64, 128),
    (2048, 32, 32, 128, 256),
    (2048, 16, 16, 256, 512),
]


def _median_ms(fn, args, iters):
    """Device-side timing: the tunnel's ~30 ms dispatch round-trip would
    swamp sub-ms kernels, so `iters` applications are chained inside ONE
    jitted fori_loop (a runtime-valued epsilon feeds each output back into
    the next input, so nothing can be hoisted or DCE'd) and the whole loop
    is timed with a single dispatch."""
    x0, *rest = args

    def make_loop(n):
        @jax.jit
        def loop(x):
            def body(_, carry):
                x, s = carry
                y = fn(x, *rest)
                s2 = jnp.sum(y[:1, :1, :1, :1]).astype(jnp.float32)
                x = x + (s2 * 1e-30).astype(x.dtype)
                return (x, s + s2)

            _, s = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return s

        return loop

    short, long = make_loop(iters), make_loop(3 * iters)
    jax.block_until_ready((short(x0), long(x0)))  # compile + warm

    def best_wall(loop):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(x0))
            times.append((time.perf_counter() - t0) * 1e3)
        return min(times)

    # difference of two loop lengths cancels the constant dispatch latency
    return (best_wall(long) - best_wall(short)) / (2 * iters)


def bench_case(frames, h, w, c, cout, dtype, iters):
    key = jax.random.PRNGKey(0)
    kx, kw_ = jax.random.split(key)
    x = jax.random.normal(kx, (frames, h, w, c), dtype)
    w4 = (jax.random.normal(kw_, (4, 4, c, cout), jnp.float32) * 0.05).astype(dtype)
    scale = jnp.full((c,), 1.1, jnp.float32)
    shift = jnp.full((c,), -0.2, jnp.float32)
    wp = pack_weights(w4)

    ref = jax.jit(reference_norm_act_conv)
    t_ref = _median_ms(ref, (x, scale, shift, w4), iters)
    t_fused = _median_ms(fused_norm_act_conv, (x, scale, shift, wp), iters)

    # correctness on-device at this shape (bf16 matmuls accumulate in f32 on
    # both paths; tolerance covers bf16 input rounding)
    got = fused_norm_act_conv(x, scale, shift, wp)
    want = ref(x, scale, shift, w4)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))

    # speed-of-light: HBM bytes (read x + w, write out; ref also writes+reads
    # the normalized intermediate) at 819 GB/s v5e; MXU flops at 197 TFLOP/s bf16
    bpe = jnp.dtype(dtype).itemsize
    bytes_fused = (frames * h * w * c + 8 * 2 * c * cout + frames * h * w // 4 * cout) * bpe
    bytes_ref = bytes_fused + 2 * frames * h * w * c * bpe
    flops = 2 * frames * (h // 2) * (w // 2) * 16 * c * cout
    return {
        "frames": frames, "h": h, "c_in": c, "c_out": cout,
        "dtype": str(jnp.dtype(dtype).name),
        "xla_ms": round(t_ref, 4),
        "fused_ms": round(t_fused, 4),
        "speedup": round(t_ref / t_fused, 3),
        "max_abs_err": err,
        "hbm_sol_ms_fused": round(bytes_fused / 819e9 * 1e3, 4),
        "hbm_sol_ms_xla": round(bytes_ref / 819e9 * 1e3, 4),
        "mxu_sol_ms": round(flops / 197e12 * 1e3, 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtypes", nargs="+", default=["bfloat16", "float32"])
    ap.add_argument("--out", type=Path, default=REPO / "results" / "fused_block.json")
    args = ap.parse_args(argv)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rows = []
    for dt in args.dtypes:
        for shape in SHAPES:
            row = bench_case(*shape, jnp.dtype(dt), args.iters)
            rows.append(row)
            print(json.dumps(row), flush=True)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
