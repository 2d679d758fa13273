"""Tests for the HLO-analysis perf tools (tools/attribute_bytes.py,
tools/conv_microbench.py).

These tools back the PERFORMANCE.md roofline/byte-attribution and the
conv-only empirical speed-of-light; their HLO text parsing is regex-based,
so pin it against a small synthetic module in the exact syntax XLA prints
(column-0 computation headers, `%name = shape opcode(operands), attrs`).
"""

import numpy as np

from tools.attribute_bytes import parse_computations, parse_instruction, shape_bytes
from tools.conv_microbench import (
    _parse_window,
    _spec_from_labels,
    bench_conv,
    collect_convs,
)

HLO = """\
HloModule jit_step, entry_computation_layout={(bf16[2,8,8,4]{3,2,1,0})->bf16[2,4,4,8]{3,2,1,0}}

%fused_computation (param_0: bf16[2,8,8,4]) -> bf16[2,8,8,4] {
  %param_0 = bf16[2,8,8,4]{3,2,1,0} parameter(0)
  ROOT %mul = bf16[2,8,8,4]{3,2,1,0} multiply(bf16[2,8,8,4]{3,2,1,0} %param_0, bf16[2,8,8,4]{3,2,1,0} %param_0)
}

ENTRY %main.1 (p0: bf16[2,8,8,4]) -> bf16[2,4,4,8] {
  %p0 = bf16[2,8,8,4]{3,2,1,0} parameter(0)
  %w0 = bf16[3,3,4,8]{3,2,1,0} constant({...})
  %fusion.1 = bf16[2,8,8,4]{3,2,1,0} fusion(bf16[2,8,8,4]{3,2,1,0} %p0), kind=kLoop, calls=%fused_computation
  %conv.1 = bf16[2,4,4,8]{3,2,1,0} convolution(bf16[2,8,8,4]{3,2,1,0} %fusion.1, bf16[3,3,4,8]{3,2,1,0} %w0), window={size=3x3 stride=2x2 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
  ROOT %conv.2 = bf16[2,4,4,8]{3,2,1,0} convolution(bf16[2,8,8,4]{3,2,1,0} %fusion.1, bf16[3,3,4,8]{3,2,1,0} %w0), window={size=3x3 stride=2x2 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}
"""


def test_shape_bytes_tuple():
    assert shape_bytes("bf16[2,4]{1,0}") == 16
    # tuple shapes sum their elements
    assert shape_bytes("(bf16[2,4]{1,0}, f32[3])") == 16 + 12
    assert shape_bytes("u8[]") == 0 or shape_bytes("u8[]") == 1  # scalar: [] -> 1 elt


def test_parse_computations_entry():
    comps, entry = parse_computations(HLO)
    assert entry == "main.1"
    assert set(comps) == {"fused_computation", "main.1"}
    assert len(comps["main.1"]) == 5


def test_parse_instruction_keeps_first_operand():
    # regression: an off-by-one once dropped each instruction's first
    # operand from the byte accounting (commit eae2373)
    line = (
        "  %fusion.1 = bf16[2,8,8,4]{3,2,1,0} fusion("
        "bf16[2,8,8,4]{3,2,1,0} %p0, bf16[2,8,8,4]{3,2,1,0} %p1), "
        "kind=kLoop, calls=%fused_computation"
    )
    name, out_b, opcode, operands, _ = parse_instruction(line)
    assert name == "fusion.1"
    assert opcode == "fusion"
    assert out_b == 2 * 8 * 8 * 4 * 2
    assert operands == ["p0", "p1"]  # both, and no attr refs


def test_collect_convs_groups_and_counts():
    rows = collect_convs(HLO)
    assert len(rows) == 1  # identical signatures grouped
    (row,) = rows
    assert row["count"] == 2
    assert row["lhs"] == ("bf16", (2, 8, 8, 4))
    assert row["rhs"] == ("bf16", (3, 3, 4, 8))
    assert row["out"] == ("bf16", (2, 4, 4, 8))
    assert row["dim_labels"] == "b01f_01io->b01f"
    assert row["feature_groups"] == 1


def test_parse_window():
    w = _parse_window("size=3x3 stride=2x2 pad=1_1x1_1")
    assert w["size"] == [3, 3]
    assert w["stride"] == [2, 2]
    assert w["pad"] == [(1, 1), (1, 1)]
    w = _parse_window("size=4x4x4 stride=1x2x2 pad=0_0x1_1x1_1 lhs_dilate=1x2x2")
    assert w["lhs_dilate"] == [1, 2, 2]


def test_spec_from_labels():
    assert _spec_from_labels("b01f", 4) == (0, 3, 1, 2)
    # rhs spec order is (out-feature, in-feature, *spatial); getting this
    # backwards silently transposes square weights and errors otherwise
    assert _spec_from_labels("01io", 4, rhs=True) == (3, 2, 0, 1)
    assert _spec_from_labels("b012f", 5) == (0, 4, 1, 2, 3)
    # the 3D-critic grad convs carry batch mid-tensor
    assert _spec_from_labels("01b2f", 5) == (2, 4, 0, 1, 3)


def test_bench_conv_executes_and_matches_shape():
    # end-to-end: the re-emitted conv from a parsed signature compiles and
    # runs (CPU here; the chip run uses the same path), with sane timing
    (row,) = collect_convs(HLO)
    dt_s, flops, flops_xla, bytes_min = bench_conv(row, iters=2, rtt=0.0)
    assert dt_s > 0
    # analytic: 2 * prod(out) * Cin * taps = 2 * 256 * 4 * 9
    assert flops == 2.0 * np.prod(row["out"][1]) * 4 * 9
    # bf16 read lhs + rhs, write out, once each
    assert bytes_min == 2 * (2 * 8 * 8 * 4 + 3 * 3 * 4 * 8 + 2 * 4 * 4 * 8)
    if flops_xla:  # cost model present: any per-MAC convention, no loop
        macs = float(np.prod(row["out"][1]) * 4 * 9)
        assert 0.9 * macs <= flops_xla <= 2.2 * macs
