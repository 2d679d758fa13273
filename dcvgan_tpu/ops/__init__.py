"""Device-side ops: Pallas kernels for the hot paths."""

from dcvgan_tpu.ops.dequant import dequantize_video  # noqa: F401
