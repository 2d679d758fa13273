"""Numpy-util tests (port + extension of /root/reference/src/test/test_util.py)."""

import numpy as np
import pytest

from dcvgan_tpu.utils.video_np import (
    calc_optical_flow,
    geometric_info_in_color_format,
    make_video_grid,
    segm_color,
    videos_to_uint8,
    visualize_optical_flow,
)


def test_videos_to_uint8_range_and_clip():
    x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0], np.float32)
    out = videos_to_uint8(x)
    np.testing.assert_array_equal(out, [0, 0, 127, 255, 255])


def test_make_video_grid():
    vids = np.arange(4 * 2 * 3 * 3 * 1).reshape(4, 2, 3, 3, 1).astype(np.uint8)
    grid = make_video_grid(vids, 2, 2)
    assert grid.shape == (1, 2, 6, 6, 1)
    # top-left tile is video 0, top-right is video 1
    np.testing.assert_array_equal(grid[0, :, :3, :3], vids[0])
    np.testing.assert_array_equal(grid[0, :, :3, 3:], vids[1])
    np.testing.assert_array_equal(grid[0, :, 3:, :3], vids[2])


def test_calc_optical_flow_shape():
    # reference expects (T-1, H, W, 2) (/root/reference/src/test/test_util.py:14-20)
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (16, 64, 64, 3), dtype=np.uint8)
    flow = calc_optical_flow(video)
    assert flow.shape == (15, 64, 64, 2)


def test_visualize_optical_flow():
    flow = np.zeros((4, 8, 8, 2), np.float32)
    flow[..., 0] = 3.0
    rgb = visualize_optical_flow(flow)
    assert rgb.shape == (4, 8, 8, 3)
    assert rgb.dtype == np.uint8


def test_geometric_color_format_depth():
    xg = np.zeros((2, 4, 8, 8, 1), np.float32)  # depth 0 -> gray 127
    out = geometric_info_in_color_format(xg, "depth")
    assert out.shape == (2, 4, 8, 8, 3)
    assert np.all(out == 127)


def test_geometric_color_format_flow():
    xg = np.zeros((1, 4, 8, 8, 2), np.float32)
    out = geometric_info_in_color_format(xg, "optical-flow")
    assert out.shape == (1, 4, 8, 8, 3)


def test_geometric_color_format_segm():
    xg = np.zeros((1, 2, 4, 4, 25), np.float32)
    xg[..., 3] = 1.0
    out = geometric_info_in_color_format(xg, "segmentation")
    assert out.shape == (1, 2, 4, 4, 3)
    expected = (segm_color(3) * 255).astype(np.uint8)
    assert np.all(out == expected)


def test_segm_color_palette_size():
    for i in range(26):
        c = segm_color(i)
        assert c.shape == (3,)
        assert np.all(c >= 0) and np.all(c <= 1)
    with pytest.raises(IndexError):
        segm_color(26)


def test_shape_probe(capsys):
    """ShapeProbe (reference DebugLayer analogue) is identity and reports
    shape at trace time + value stats at runtime."""
    import jax
    import jax.numpy as jnp

    from dcvgan_tpu.utils.debug import ShapeProbe

    probe = ShapeProbe(tag="t", stats=True)
    x = jnp.arange(12.0).reshape(3, 4)

    @jax.jit
    def f(x):
        return probe.apply({}, x)

    y = f(x)
    jax.effects_barrier()
    assert (y == x).all()
    out = capsys.readouterr().out
    assert "[shape-probe:t] (3, 4)" in out and "mean=" in out
