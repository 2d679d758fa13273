"""Empirical conv-only speed-of-light for the train step.

The roofline (tools/probe_roofline.py) places the b=20 step at ~68% of the
XLA-cost-model speed-of-light, but that model over-counts HBM↔VMEM staging
(async slice/ConcatBitcast prefetches carry S(1) memory-space outputs) and
says nothing about MXU padding: most convs here have Cin/Cout of 32–256 on
a 128×128 systolic array, so the *achievable* FLOPs rate per conv is well
below peak. This tool answers the question the cost model can't: if the
step executed nothing but its convolutions, each at its own standalone
measured rate, how fast could it possibly run?

Method: lower the real train step at --batch, walk the optimized HLO for
every `convolution` op (forward, transposed/lhs-dilated, and gradient
convs inside fusions), group identical (shapes, window, dnums) signatures
with multiplicity, re-emit each via `lax.conv_general_dilated`, time it in
a serialized on-device loop, and aggregate `sum(count_i * time_i)` into a
conv-only step time. Per-conv MXU efficiency = XLA FLOPs / (time * peak).

Prints one JSON line per conv group plus a summary. Usage::

    python tools/conv_microbench.py [--batch 20] [--iters 30] [--top 40]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools.attribute_bytes import parse_computations  # noqa: E402

_SHAPE_RE = re.compile(r"([a-z]\d+|bf16|pred)\[([0-9,]*)\]")
_CONV_RE = re.compile(
    r"%([\w\.\-]+)\s*=\s*(\S+)\s+convolution\(([^)]*)\),\s*window=\{([^}]*)\},"
    r"\s*dim_labels=([\w>\-_]+)"
)
_DEF_RE = re.compile(r"%([\w\.\-]+)\s*=\s*(\S+?)\s+[a-z]")

# HBM bandwidth (bytes/s) by device_kind substring, for per-conv memory SoL
_HBM_BW_TABLE = (
    ("v6", 1640e9),
    ("v5p", 2765e9),
    ("v5", 819e9),  # v5e / v5 lite
    ("v4", 1228e9),
    ("v3", 900e9),
)
_HBM_BW = None


def _hbm_bw(device_kind: str):
    kind = device_kind.lower()
    for sub, bw in _HBM_BW_TABLE:
        if sub in kind:
            return bw
    return None


def _parse_shape(s: str):
    m = _SHAPE_RE.search(s)
    if not m:
        return None, None
    dtype = m.group(1)
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    return dtype, dims


def _parse_window(window: str):
    """-> dict with size/stride/pad/lhs_dilate/rhs_dilate lists."""
    out = {}
    for key in ("size", "stride", "pad", "lhs_dilate", "rhs_dilate"):
        m = re.search(rf"{key}=([\dx_\-]+)", window)
        if not m:
            continue
        if key == "pad":
            out[key] = [
                tuple(int(x) for x in p.split("_")) for p in m.group(1).split("x")
            ]
        else:
            out[key] = [int(x) for x in m.group(1).split("x")]
    return out


def _spec_from_labels(labels: str, ndim: int, rhs: bool = False):
    """'b01f' / '01io' -> lax spec tuple.

    lhs/out spec order is (batch, feature, *spatial); rhs spec order is
    (out-feature, in-feature, *spatial) per lax.ConvDimensionNumbers.
    """
    b_ch, f_ch = ("o", "i") if rhs else ("b", "f")
    batch = labels.index(b_ch)
    feat = labels.index(f_ch)
    spatial = [labels.index(str(i)) for i in range(ndim - 2)]
    return (batch, feat, *spatial)


def collect_convs(hlo_text: str):
    """-> list of conv signature dicts with multiplicities."""
    comps, _ = parse_computations(hlo_text)
    # instruction names are only unique within one computation (every fusion
    # has its own %param_0, ...): resolve operands against the defining
    # computation first, with a module-wide table as fallback for
    # cross-computation references
    comp_shapes: dict[str, dict[str, tuple]] = {}
    shapes: dict[str, tuple] = {}
    for cname, lines in comps.items():
        local: dict[str, tuple] = {}
        for line in lines:
            m = _DEF_RE.match(line.strip())
            if m:
                local[m.group(1)] = _parse_shape(m.group(2))
        comp_shapes[cname] = local
        shapes.update(local)
    groups: dict[tuple, dict] = {}
    for cname, lines in comps.items():
        local = comp_shapes[cname]

        def lookup(op):
            if op in local:
                return local[op]
            return shapes.get(op, (None, None))

        for line in lines:
            m = _CONV_RE.search(line)
            if not m:
                continue
            _, out_s, operands, window, dim_labels = m.groups()
            ops = re.findall(r"%([\w\.\-]+)", operands)
            if len(ops) < 2:
                continue
            lhs = lookup(ops[0])
            rhs = lookup(ops[1])
            out = _parse_shape(out_s)
            if lhs[1] is None or rhs[1] is None or out[1] is None:
                continue
            fg = re.search(r"feature_group_count=(\d+)", line)
            bg = re.search(r"batch_group_count=(\d+)", line)
            key = (
                lhs, rhs, out, window, dim_labels,
                int(fg.group(1)) if fg else 1,
                int(bg.group(1)) if bg else 1,
            )
            g = groups.setdefault(key, {"count": 0})
            g["count"] += 1
    rows = []
    for (lhs, rhs, out, window, dim_labels, fg, bg), g in groups.items():
        rows.append(
            {
                "lhs": lhs, "rhs": rhs, "out": out,
                "window": window, "dim_labels": dim_labels,
                "feature_groups": fg, "batch_groups": bg,
                "count": g["count"],
            }
        )
    return rows


def bench_conv(row, iters: int, rtt: float):
    """Time one conv signature standalone on the default device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    lhs_dtype, lhs_shape = row["lhs"]
    rhs_dtype, rhs_shape = row["rhs"]
    labels = row["dim_labels"]
    m = re.match(r"(\w+)_(\w+)->(\w+)", labels)
    lhs_l, rhs_l, out_l = m.groups()
    ndim = len(lhs_shape)
    dn = lax.ConvDimensionNumbers(
        _spec_from_labels(lhs_l, ndim),
        _spec_from_labels(rhs_l, ndim, rhs=True),
        _spec_from_labels(out_l, ndim),
    )
    w = _parse_window(row["window"])
    nsp = ndim - 2
    stride = w.get("stride", [1] * nsp)
    pad = w.get("pad", [(0, 0)] * nsp)
    lhs_dil = w.get("lhs_dilate", [1] * nsp)
    rhs_dil = w.get("rhs_dilate", [1] * nsp)
    dt = jnp.bfloat16 if lhs_dtype == "bf16" else jnp.float32
    lhs = jnp.ones(lhs_shape, dt)
    rhs = jnp.ones(rhs_shape, dt)

    def one(x):
        return lax.conv_general_dilated(
            x, rhs, stride, pad, lhs_dil, rhs_dil, dn,
            feature_group_count=row["feature_groups"],
            batch_group_count=row["batch_groups"],
            preferred_element_type=dt,
        )

    def loop(x0):
        # serialize: feed a scalar derived from each output back into the
        # next input so XLA cannot hoist or CSE the conv out of the loop.
        # The dependency reads ONE output element (not a full-tensor mean,
        # which would add an extra HBM pass over the output per iteration
        # and bias memory-bound convs slow).
        def body(x, _):
            y = one(x)
            probe = jax.lax.slice(y, (0,) * y.ndim, (1,) * y.ndim)
            return x + (probe.reshape(()) * 0).astype(dt), None

        x, _ = jax.lax.scan(body, x0, None, length=iters)
        return x.reshape(-1)[0]

    compiled = jax.jit(loop).lower(lhs).compile()
    # Two FLOPs conventions:
    #  - analytic: 2 * prod(out) * contracted-dot width — the MXU-shaped
    #    work incl. dilation zeros (what a naive systolic mapping multiplies)
    #  - xla: the cost model of a NO-LOOP compile of the same conv — the
    #    useful-FLOPs convention the repo's MFU numbers use. (Scan-body
    #    cost is counted once on TPU but x trip-count on CPU, so the
    #    single-call compile sidesteps the convention entirely.)
    rhs_spec = _spec_from_labels(
        re.match(r"\w+_(\w+)->", labels).group(1), ndim, rhs=True
    )
    rhs_in = rhs_shape[rhs_spec[1]]
    taps = 1
    for t in w.get("size", [1] * nsp):
        taps *= t
    out_n = 1
    for d in row["out"][1]:
        out_n *= d
    flops = 2.0 * out_n * rhs_in * taps
    flops_xla = None
    try:
        cost = jax.jit(one).lower(lhs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_xla = float(cost.get("flops", 0.0))
    except Exception:
        pass
    # analytic HBM floor for this conv: read lhs + rhs, write out, once
    esize = 2 if dt == jnp.bfloat16 else 4
    lhs_n = 1
    for d in lhs_shape:
        lhs_n *= d
    rhs_n = 1
    for d in rhs_shape:
        rhs_n *= d
    bytes_min = esize * (lhs_n + rhs_n + out_n)
    float(compiled(lhs))  # warm
    t0 = time.perf_counter()
    float(compiled(lhs))
    dt_s = max(1e-9, time.perf_counter() - t0 - rtt) / iters
    return dt_s, flops, flops_xla, bytes_min


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--min-flops", type=float, default=1e7,
                    help="skip conv groups below this many FLOPs (GRU-cell "
                    "matmuls etc. — timed as one lumped 'small' row)")
    ap.add_argument("--hlo", type=Path, default=None,
                    help="use a saved gzip HLO dump instead of lowering")
    ap.add_argument(
        "--out", type=Path, default=REPO / "results" / "conv_microbench.json"
    )
    args = ap.parse_args(argv)

    import gzip

    import jax

    import bench

    if args.hlo:
        hlo = gzip.open(args.hlo, "rt").read()
    else:
        from dcvgan_tpu import prng
        from dcvgan_tpu.config import load_config
        from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
        from dcvgan_tpu.train.step import DCVGAN

        cfg = load_config(REPO / "configs" / "mug-depth.yml")
        cfg.trainer.precision = "bfloat16"
        cfg.trainer.donate_state = False
        gan = DCVGAN(cfg)
        key = prng.base_key(0)
        state = gan.init_state(key)
        mesh = create_mesh(cfg, batchsize=args.batch)
        state = replicate(state, mesh)
        batch = shard_batch(
            bench._make_batch(args.batch, cfg.video_length, cfg.image_size), mesh
        )
        compiled = (
            jax.jit(gan.train_step)
            .lower(state, batch, prng.for_step(key, 1))
            .compile()
        )
        hlo = compiled.as_text()

    rows = collect_convs(hlo)
    rtt = bench._scalar_rtt()
    peak = bench._peak_flops(jax.devices()[0].device_kind)
    global _HBM_BW
    _HBM_BW = _hbm_bw(jax.devices()[0].device_kind)

    results = []
    skipped_flops = 0.0
    for row in sorted(rows, key=lambda r: -r["count"]):
        # rough useful-FLOPs estimate to decide skipping (2*out*K*taps)
        out_n = 1
        for d in row["out"][1]:
            out_n *= d
        k = row["lhs"][1][_spec_from_labels(
            re.match(r"(\w+)_", row["dim_labels"]).group(1), len(row["lhs"][1])
        )[1]]
        taps = 1
        for t in _parse_window(row["window"]).get("size", []):
            taps *= t
        est = 2.0 * out_n * k * taps / row["feature_groups"]
        if est < args.min_flops:
            skipped_flops += est * row["count"]
            continue
        print(
            f"# bench {row['lhs'][1]}*{row['rhs'][1]}->{row['out'][1]} "
            f"{row['dim_labels']} x{row['count']}",
            file=sys.stderr,
            flush=True,
        )
        try:
            dt_s, flops, flops_xla, bytes_min = bench_conv(row, args.iters, rtt)
        except Exception as e:  # record and continue
            results.append(
                {
                    "sig": f"{row['lhs'][1]}*{row['rhs'][1]}->{row['out'][1]} "
                    f"{row['dim_labels']} {row['window']}",
                    "count": row["count"],
                    "error": f"{type(e).__name__}: {e}"[:200],
                }
            )
            continue
        mem_sol_s = bytes_min / _HBM_BW if _HBM_BW else None
        r = {
            "sig": f"{row['lhs'][1]}*{row['rhs'][1]}->{row['out'][1]} "
            f"{row['dim_labels']} {row['window']}",
            "count": row["count"],
            "us": round(dt_s * 1e6, 1),
            # analytic = MXU-shaped dot work incl. dilation zeros;
            # xla = the cost model's useful-FLOPs count (repo MFU convention)
            "gflops_analytic": round(flops / 1e9, 2),
            "gflops_xla": round(flops_xla / 1e9, 2) if flops_xla else None,
            "mxu_occupancy": round(flops / dt_s / peak, 3) if peak else None,
            "mfu_xla": round(flops_xla / dt_s / peak, 3)
            if peak and flops_xla
            else None,
            "bytes_mb": round(bytes_min / 1e6, 1),
            "pct_mem_sol": round(100 * mem_sol_s / dt_s, 1) if mem_sol_s else None,
            "total_ms": round(dt_s * 1e3 * row["count"], 2),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    timed = [r for r in results if "us" in r]
    conv_only_ms = sum(r["total_ms"] for r in timed)
    total_xla = sum((r["gflops_xla"] or 0.0) * r["count"] for r in timed)
    total_analytic = sum(r["gflops_analytic"] * r["count"] for r in timed)
    summary = {
        "batch": args.batch,
        "conv_groups_timed": len(timed),
        "conv_groups_errored": len(results) - len(timed),
        "conv_only_ms": round(conv_only_ms, 2),
        "conv_gflops_xla": round(total_xla, 1),
        "conv_gflops_analytic": round(total_analytic, 1),
        "conv_only_mfu_xla": round(
            total_xla * 1e9 / (conv_only_ms / 1e3) / peak, 4
        )
        if peak and conv_only_ms
        else None,
        "skipped_small_gflops": round(skipped_flops / 1e9, 2),
    }
    print(json.dumps(summary), flush=True)
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps({"summary": summary, "convs": results}, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
