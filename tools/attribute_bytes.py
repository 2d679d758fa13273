"""Attribute the train step's HBM bytes to HLO instructions.

The roofline probe (tools/probe_roofline.py) shows the flagship-batch
(b=20) step is memory-bound: XLA counts ~27 GB of HBM traffic against an
11 ms compute speed-of-light, capping MFU at ~34%. This tool answers
*where the bytes go*: it lowers one train step, walks the optimized HLO,
and charges each top-level instruction output-bytes + operand-bytes
(fusion internals are registers/VMEM and charged at the fusion boundary,
matching how XLA's cost analysis counts "bytes accessed").

Prints the top instructions and a by-category rollup as JSON; saves the
optimized HLO text alongside for direct inspection.

Usage::

    python tools/attribute_bytes.py [--batch 20] [--variant base] [--top 30]
"""

from __future__ import annotations

import argparse
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z]\d+|pred|bf16)\[([0-9,]*)\]")
# opcode right before the operand list: lowercase word followed by '('
# (shape/layout annotations like {0:S(2)} start uppercase, so they don't match)
_OPCODE_RE = re.compile(r" ([a-z][a-z0-9\-]*)\(")
_OPERAND_RE = re.compile(r"%([\w\.\-]+)")
_CALLED_RE = re.compile(
    r"(?:calls|body|condition|to_apply)=%([\w\.\-]+)"
    r"|branch_computations=\{([^}]*)\}"
)


def shape_bytes(shape_str: str) -> int:
    """Bytes of a (possibly tuple) HLO shape string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        nbytes = DTYPE_BYTES.get(dtype)
        if nbytes is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nbytes
    return total


def parse_computations(hlo_text: str):
    """computation name -> list of instruction lines.

    Computation headers sit at column 0 (``%name (args) -> shape {`` or
    ``ENTRY %name ...``); instructions are indented.
    """
    comps: dict[str, list[str]] = {}
    entry = None
    cur = None
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"(ENTRY\s+)?%([\w\.\-]+)\s*\(", line)
            if m and line.rstrip().endswith("{"):
                cur = m.group(2)
                comps[cur] = []
                if m.group(1):
                    entry = cur
            else:
                cur = None
            continue
        if cur is None:
            continue
        if line.strip() == "}":
            cur = None
        else:
            comps[cur].append(line)
    return comps, entry


def parse_instruction(line: str):
    """-> (name, out_bytes, opcode, operand_names) or None."""
    m = re.match(r"\s*(?:ROOT\s+)?%([\w\.\-]+)\s*=\s*(.*)$", line)
    if not m:
        return None
    name, rest = m.groups()
    om = _OPCODE_RE.search(" " + rest)
    if not om:
        return None
    opcode = om.group(1)
    shape_str = rest[: om.start()]
    out_b = shape_bytes(shape_str)
    # operands: %refs inside the top-level parens right after the opcode,
    # before any ", attr=" — cut at the matching close paren.
    # om indexes into the " "-padded string, so the char right after "(" in
    # `rest` coordinates is om.end()-1 (using om.end() would eat the first
    # operand's "%" and silently drop it from the byte accounting).
    args = rest[om.end() - 1:]
    depth = 1
    for i, c in enumerate(args):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args = args[:i]
                break
    operands = _OPERAND_RE.findall(args)
    return name, out_b, opcode, operands, rest


def categorize(opcode: str, rest: str) -> str:
    if opcode == "convolution":
        return "convolution"
    if opcode == "fusion":
        if "convolution" in rest:
            return "fusion:convolution"
        if "kind=kInput" in rest or "reduce" in rest:
            return "fusion:reduce"
        return "fusion:elementwise"
    if opcode in ("copy", "copy-start", "copy-done"):
        return "copy/layout"
    if opcode == "while":
        return "while (GRU scan)"
    if opcode == "conditional":
        return "conditional (gated optimizer)"
    if opcode.startswith("all-") or opcode in ("reduce-scatter", "collective-permute"):
        return "collective"
    if opcode in ("custom-call",):
        return "custom-call"
    return opcode


SKIP_OPS = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id",
}


def attribute(hlo_text: str):
    comps, entry = parse_computations(hlo_text)

    shapes: dict[str, int] = {}
    parsed: dict[str, list] = {}
    for cname, lines in comps.items():
        rows = []
        for line in lines:
            p = parse_instruction(line)
            if p is None:
                continue
            name, out_b, opcode, operands, rest = p
            shapes[name] = out_b
            rows.append((name, out_b, opcode, operands, rest))
        parsed[cname] = rows

    # charge: entry + transitive while/conditional/call subcomputations
    # (fusion subcomputations stay uncharged — their traffic is the fusion
    # boundary, already charged at the fusion instruction)
    charged: set = set()
    frontier = [entry] if entry else []
    while frontier:
        c = frontier.pop()
        if c in charged or c not in parsed:
            continue
        charged.add(c)
        for name, out_b, opcode, operands, rest in parsed[c]:
            if opcode in ("while", "conditional", "call"):
                for m in _CALLED_RE.finditer(rest):
                    if m.group(1):
                        frontier.append(m.group(1))
                    if m.group(2):
                        for t in m.group(2).split(","):
                            frontier.append(t.strip().lstrip("%"))

    per_instr = []
    per_cat = defaultdict(float)
    for cname in charged:
        for name, out_b, opcode, operands, rest in parsed[cname]:
            if opcode in SKIP_OPS:
                continue
            in_b = sum(shapes.get(op, 0) for op in operands)
            cat = categorize(opcode, rest)
            total = out_b + in_b
            per_instr.append(
                {"name": name, "comp": cname, "op": opcode, "cat": cat,
                 "out_mb": out_b / 1e6, "in_mb": in_b / 1e6,
                 "total_mb": total / 1e6}
            )
            per_cat[cat] += total / 1e9
    per_instr.sort(key=lambda r: -r["total_mb"])
    return per_instr, dict(sorted(per_cat.items(), key=lambda kv: -kv[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--variant", default="base")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", type=Path, default=REPO / "results" / "bytes_attribution.json")
    ap.add_argument("--hlo-out", type=Path, default=None,
                    help="also gzip the optimized HLO text here")
    args = ap.parse_args(argv)

    import jax

    import bench
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN
    from tools.probe_roofline import VARIANTS

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = False
    for k, v in VARIANTS[args.variant].items():
        setattr(cfg.trainer, k, v)

    gan = DCVGAN(cfg)
    key = prng.base_key(0)
    state = gan.init_state(key)
    t, s = cfg.video_length, cfg.image_size
    mesh = create_mesh(cfg, batchsize=args.batch)
    state = replicate(state, mesh)
    batch = shard_batch(bench._make_batch(args.batch, t, s), mesh)

    step_key = prng.for_step(key, 1)
    compiled = (
        jax.jit(gan.train_step).lower(state, batch, step_key).compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    hlo = compiled.as_text()
    if args.hlo_out:
        args.hlo_out.parent.mkdir(parents=True, exist_ok=True)
        with gzip.open(args.hlo_out, "wt") as f:
            f.write(hlo)
    per_instr, per_cat = attribute(hlo)
    total_attr = sum(r["total_mb"] for r in per_instr) / 1e3

    report = {
        "batch": args.batch,
        "variant": args.variant,
        "xla_bytes_gb": float(cost.get("bytes accessed", 0.0)) / 1e9,
        "attributed_gb": round(total_attr, 2),
        "by_category_gb": {k: round(v, 3) for k, v in per_cat.items()},
        "top_instructions": [
            {k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()}
            for r in per_instr[: args.top]
        ],
    }
    print(json.dumps(report, indent=1))
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
