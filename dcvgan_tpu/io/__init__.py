"""Host-side media I/O (images, videos).

TPU hosts are CPU VMs; image/video codecs stay host-side C++ via OpenCV
(the reference uses cv2 + scikit-video/ffmpeg — /root/reference/src/dataio.py).
This environment has no ffmpeg binary, so video container I/O goes through
OpenCV's bundled backends.
"""

from dcvgan_tpu.io.image import (  # noqa: F401
    read_img,
    resize_img,
    resize_video,
    save_video_as_images,
    write_img,
)
from dcvgan_tpu.io.video import (  # noqa: F401
    read_video,
    read_videos_parallel,
    write_video,
    write_videos_parallel,
)
