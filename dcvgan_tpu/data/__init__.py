"""Host data pipeline: datasets, loaders, preprocessing, mock fixtures."""

from dcvgan_tpu.data.dataset import VideoDataset  # noqa: F401
from dcvgan_tpu.data.loader import VideoLoader  # noqa: F401
