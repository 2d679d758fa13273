"""Observability: metric registry, console/file logging, TensorBoard."""

from dcvgan_tpu.logging.logger import Logger, MetricType  # noqa: F401
