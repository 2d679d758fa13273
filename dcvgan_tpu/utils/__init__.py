"""Host-side (numpy) helpers: uint8 conversion, grids, flow/segm visualization."""

from dcvgan_tpu.utils.video_np import (  # noqa: F401
    calc_optical_flow,
    geometric_info_in_color_format,
    make_video_grid,
    segm_color,
    videos_to_uint8,
    visualize_optical_flow,
)
