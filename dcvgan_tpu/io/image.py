"""Image I/O and resizing (reference: /root/reference/src/dataio.py:10-135).

All functions use RGB channel order and uint8 (T, H, W, C)/(H, W, C) numpy
arrays, matching the reference's conventions so the dataset's pixel-exact
decode oracle carries over.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Tuple, Union

import cv2
import numpy as np

_CV_MODES = {
    "nearest": cv2.INTER_NEAREST,
    "linear": cv2.INTER_LINEAR,
    "area": cv2.INTER_AREA,
    "cubic": cv2.INTER_CUBIC,
    "lanczos4": cv2.INTER_LANCZOS4,
}


def read_img(path: Union[str, Path], grayscale: bool = False) -> np.ndarray:
    """Read an image as uint8 RGB (H, W, C); grayscale gives (H, W, 1).

    Reference: dataio.read_img (/root/reference/src/dataio.py:10-34).
    """
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    if grayscale:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        img = np.expand_dims(img, -1)
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def write_img(
    img: np.ndarray, path: Union[str, Path], grayscale: bool = False
) -> None:
    """Write a uint8 RGB (H, W, C) image.

    Reference: dataio.write_img (/root/reference/src/dataio.py:37-56).
    """
    if grayscale:
        cv2.imwrite(str(path), img)
    else:
        cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def resize_img(
    img: np.ndarray, size: Tuple[int, int], mode: str = "linear"
) -> np.ndarray:
    """Resize (H, W, C) image to ``size`` = (W, H) cv2 convention.

    Reference: dataio.resize_img (/root/reference/src/dataio.py:79-111),
    same five interpolation modes.
    """
    out = cv2.resize(img, size, interpolation=_CV_MODES[mode])
    if img.ndim == 3 and out.ndim == 2:
        out = np.expand_dims(out, -1)
    return out


def resize_video(video: np.ndarray, *args: Any) -> np.ndarray:
    """Per-frame resize of a (T, H, W, C) video.

    Reference: dataio.resize_video (/root/reference/src/dataio.py:59-76);
    also covers the evidently-intended behavior of the reference's broken
    ``resize_vide`` call site (/root/reference/src/preprocess/isogd.py:102).
    """
    return np.stack([resize_img(frame, *args) for frame in video])


def save_video_as_images(
    video: np.ndarray, path: Path, grayscale: bool = False, ext: str = "jpg"
) -> None:
    """Dump (T, H, W, C) uint8 frames as ``path/NNN.<ext>``.

    Reference: dataio.save_video_as_images (/root/reference/src/dataio.py:114-135).
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    placeholder = str(path / ("{:03d}." + ext))
    for i, frame in enumerate(video):
        write_img(frame, placeholder.format(i), grayscale)
