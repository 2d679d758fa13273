"""Chalearn LAP IsoGD dataset preprocessing.

Behavioral port of /root/reference/src/preprocess/isogd.py:15-141 (fresh
implementation): read ``<root>/<mode>_list.txt`` of (color mp4, depth mp4,
label) triples, center the square crop on the detected face, compute
Farnebäck optical flow, save per-video color/depth frame images and
``optical-flow.npy`` plus preview mp4s, and emit ``list.txt``.

Deltas:
- the reference's flow-resize call is a fatal typo (``dataio.resize_vide``,
  /root/reference/src/preprocess/isogd.py:102); the evidently-intended
  nearest-resize is implemented here,
- ``face_recognition`` is an optional dependency (as in the reference,
  imported lazily); without it the crop falls back to the frame center
  instead of dropping every sample.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from joblib import Parallel, delayed

from dcvgan_tpu.data.preprocess import register
from dcvgan_tpu.io.image import resize_video, save_video_as_images
from dcvgan_tpu.io.video import read_video, write_video
from dcvgan_tpu.utils.video_np import calc_optical_flow, visualize_optical_flow


def detect_face(video: np.ndarray, num_frames_to_use: int = 6):
    """Average face location over sampled frames, or None.

    Reference detect_face (/root/reference/src/preprocess/isogd.py:15-44);
    returns (top, right, bottom, left) like face_recognition.
    """
    try:
        import face_recognition
    except ImportError:
        return None

    frames = np.linspace(0, len(video), num_frames_to_use, endpoint=False).astype(int)
    locs = []
    for t in frames:
        locations = face_recognition.face_locations(video[t])
        if locations:
            locs.append(np.asarray(locations[0]))
    if not locs:
        return None
    return np.stack(locs).mean(axis=0).astype(int)


def _preprocess_one(
    color_path: Path,
    depth_path: Path,
    label: str,
    save_path: Path,
    length: int,
    img_size: int,
) -> Optional[Tuple[str, int]]:
    try:
        if not (color_path.exists() and depth_path.exists()):
            print(f"sample not found, skipped: {color_path.parent}", file=sys.stderr)
            return None

        color = read_video(color_path)
        depth = read_video(depth_path)
        t, h, w, _ = color.shape
        if t < length + 1:
            return None

        # square crop centered on the face (reference :85-90); center of the
        # frame when no detector/face is available
        face = detect_face(color)
        if face is not None:
            top, right, bottom, left = face
            center_x = (top - left) // 2 + left  # reference arithmetic
        else:
            center_x = w // 2
        left_x = max(center_x - h // 2, 0)

        flow = calc_optical_flow(color)  # (T-1, H, W, 2)

        color = color[:, :, left_x : left_x + h]
        depth = depth[:, :, left_x : left_x + h]
        flow = flow[:, :, left_x : left_x + h]

        resize_to = (img_size, img_size)
        color = resize_video(color, resize_to, "linear")
        depth = resize_video(depth, resize_to, "nearest")
        flow = resize_video(flow, resize_to, "nearest")

        name = f"{color_path.parent.name}_{color_path.name[2:7]}_{label}"
        save_video_as_images(color, save_path / name / "color")
        save_video_as_images(depth, save_path / name / "depth")
        np.save(str(save_path / name / "optical-flow"), flow)

        for sub in ("color", "depth", "optical-flow"):
            (save_path / sub).mkdir(parents=True, exist_ok=True)
        write_video(color, save_path / "color" / (name + ".mp4"))
        write_video(depth, save_path / "depth" / (name + ".mp4"))
        write_video(
            visualize_optical_flow(flow), save_path / "optical-flow" / (name + ".mp4")
        )
        return name, t
    except Exception:
        import traceback

        traceback.print_exc()
        print(f"unexpected error, skipped: {color_path}", file=sys.stderr)
        return None


@register("isogd")
def preprocess_isogd_dataset(
    dataset_path: Path,
    save_path: Path,
    mode: str,
    length: int,
    img_size: int,
    n_jobs: int = -1,
) -> None:
    """Reference preprocess_isogd_dataset (/root/reference/src/preprocess/isogd.py:47-141)."""
    dataset_path, save_path = Path(dataset_path), Path(save_path)
    with open(dataset_path / f"{mode}_list.txt") as f:
        rows = f.readlines()

    jobs = []
    for row in rows:
        color, depth, label = row.strip().split(" ")
        jobs.append((dataset_path / color, dataset_path / depth, label))

    save_path.mkdir(parents=True, exist_ok=True)
    infos = Parallel(n_jobs=n_jobs, verbose=3, prefer="threads")(
        [
            delayed(_preprocess_one)(c, d, l, save_path, length, img_size)
            for c, d, l in jobs
        ]
    )

    with open(save_path / "list.txt", "w") as f:
        for info in infos:
            if info is None:
                continue
            f.write("{} {}\n".format(*info))
