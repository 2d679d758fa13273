"""Video container I/O (reference: /root/reference/src/dataio.py:138-240).

The reference uses scikit-video/ffmpeg; this environment ships neither, so
mp4 read/write goes through OpenCV (its bundled codec backends). API and
array conventions are identical: uint8 (T, H, W, C), RGB.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Union

import cv2
import numpy as np
from joblib import Parallel, delayed


def read_video(path: Union[str, Path]) -> np.ndarray:
    """Read a video as uint8 RGB (T, H, W, C).

    Reference: dataio.read_video (/root/reference/src/dataio.py:138-155).
    """
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"could not open video: {path}")
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def write_video(video: np.ndarray, path: Union[str, Path], fps: int = 16) -> None:
    """Write uint8 RGB (T, H, W, C) video as mp4.

    Reference: dataio.write_video (/root/reference/src/dataio.py:187-206).
    """
    t, h, w = video.shape[:3]
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"could not open video writer for {path}")
    for frame in video:
        if frame.ndim == 2 or frame.shape[-1] == 1:
            frame = np.broadcast_to(
                frame.reshape(h, w, 1), (h, w, 3)
            ).astype(np.uint8)
        writer.write(cv2.cvtColor(np.ascontiguousarray(frame), cv2.COLOR_RGB2BGR))
    writer.release()


def read_videos_parallel(
    paths: Sequence[Union[str, Path]], n_jobs: int = 8, verbose: int = 0
) -> List[np.ndarray]:
    """Reference: dataio.read_videos_pararell (/root/reference/src/dataio.py:158-184)."""
    return Parallel(n_jobs=n_jobs, verbose=verbose, prefer="threads")(
        [delayed(read_video)(p) for p in paths]
    )


def write_videos_parallel(
    videos: Sequence[np.ndarray],
    paths: Sequence[Union[str, Path]],
    fps: int = 16,
    n_jobs: int = 8,
    verbose: int = 0,
) -> np.ndarray:
    """Reference: dataio.write_videos_pararell (/root/reference/src/dataio.py:209-240),
    including its (odd but observable) return of ``np.stack(videos)``."""
    Parallel(n_jobs=n_jobs, verbose=verbose, prefer="threads")(
        [delayed(write_video)(v, p, fps) for v, p in zip(videos, paths)]
    )
    return np.stack(videos)
