"""Preprocessing integration tests over synthetic raw datasets — coverage
the reference entirely lacks (SURVEY.md §4: 'Untested entirely: …
preprocessing')."""

from pathlib import Path

import numpy as np
import pytest
import scipy.io

from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.data.preprocess import get_preprocessor
from dcvgan_tpu.io.video import write_video

T_RAW, H_RAW, W_RAW = 20, 60, 80


def make_surreal_raw(root: Path, n_videos=2):
    """Synthesize a SURREAL-style tree: mp4 + depth/segm/info .mat files."""
    rng = np.random.default_rng(0)
    run = root / "train" / "run0"
    for v in range(n_videos):
        seq = run / f"{v:02d}_01"
        seq.mkdir(parents=True, exist_ok=True)
        stem = f"{v:02d}_01_c0001"
        video = rng.integers(0, 255, (T_RAW, H_RAW, W_RAW, 3), np.uint8)
        write_video(video, seq / f"{stem}.mp4")

        depth = {
            f"depth_{i + 1}": np.where(
                rng.random((H_RAW, W_RAW)) < 0.3,
                rng.uniform(2, 5, (H_RAW, W_RAW)),
                1e10,
            )
            for i in range(T_RAW)
        }
        scipy.io.savemat(seq / f"{stem}_depth.mat", depth)
        segm = {
            f"segm_{i + 1}": rng.integers(0, 25, (H_RAW, W_RAW), np.uint8)
            for i in range(T_RAW)
        }
        scipy.io.savemat(seq / f"{stem}_segm.mat", segm)
        # 24 joints centered in the frame (so the edge filter keeps it)
        joints = np.zeros((2, 24, T_RAW))
        joints[0] = rng.uniform(W_RAW * 0.4, W_RAW * 0.6, (24, T_RAW))  # x
        joints[1] = rng.uniform(H_RAW * 0.3, H_RAW * 0.7, (24, T_RAW))  # y
        scipy.io.savemat(seq / f"{stem}_info.mat", {"joints2D": joints})


def test_surreal_preprocess_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    make_surreal_raw(raw)
    out = tmp_path / "processed" / "surreal" / "train"
    out.mkdir(parents=True)
    get_preprocessor("surreal")(raw, out, "train", 16, 32, 1)

    listing = (out / "list.txt").read_text().strip().splitlines()
    assert len(listing) == 2
    name, n_frames = listing[0].split(" ")
    assert int(n_frames) == T_RAW
    vdir = out / name
    assert (vdir / "depth.npy").exists()
    assert (vdir / "segm.npy").exists()
    assert len(list((vdir / "color").glob("*.jpg"))) == T_RAW
    # previews
    assert (out / "color" / f"{name}.mp4").exists()
    assert (out / "depth" / f"{name}.mp4").exists()
    assert (out / "segm" / f"{name}.mp4").exists()

    depth = np.load(vdir / "depth.npy")
    assert depth.shape == (T_RAW, 32, 32)

    # and the dataset can consume it with surreal-depth normalization
    ds = VideoDataset(
        name="surreal",
        preprocess_func=None,
        video_length=16,
        image_size=32,
        geometric_info="depth",
        processed_root=tmp_path / "processed",
    )
    sample = ds.sample(0, np.random.default_rng(0))
    assert sample["color"].shape == (16, 32, 32, 3)
    assert sample["depth"].shape == (16, 32, 32, 1)
    d = sample["depth"]
    assert d.max() <= 1.0 and d.min() >= -1.0

    # segmentation modality too
    ds_segm = VideoDataset(
        name="surreal",
        preprocess_func=None,
        video_length=16,
        image_size=32,
        geometric_info="segmentation",
        processed_root=tmp_path / "processed",
    )
    s = ds_segm.sample(0, np.random.default_rng(0))["segmentation"]
    assert s.shape == (16, 32, 32, 25)


def test_surreal_crop_deterministic(tmp_path):
    """Same raw video preprocessed twice -> identical crops (stable seed)."""
    raw = tmp_path / "raw"
    make_surreal_raw(raw, n_videos=1)
    outs = []
    for run in range(2):
        out = tmp_path / f"p{run}" / "surreal" / "train"
        out.mkdir(parents=True)
        get_preprocessor("surreal")(raw, out, "train", 16, 32, 1)
        name = (out / "list.txt").read_text().split()[0]
        outs.append(np.load(out / name / "depth.npy"))
    np.testing.assert_array_equal(outs[0], outs[1])


def make_isogd_raw(root: Path, n_videos=2):
    rng = np.random.default_rng(1)
    (root / "train").mkdir(parents=True, exist_ok=True)
    rows = []
    for v in range(n_videos):
        cdir = root / "train" / f"{v:03d}"
        cdir.mkdir(parents=True, exist_ok=True)
        color_rel = f"train/{v:03d}/M_{v:05d}.mp4"
        depth_rel = f"train/{v:03d}/K_{v:05d}.mp4"
        video = rng.integers(0, 255, (T_RAW, H_RAW, W_RAW, 3), np.uint8)
        write_video(video, root / color_rel)
        write_video(video, root / depth_rel)
        rows.append(f"{color_rel} {depth_rel} {v + 1}")
    (root / "train_list.txt").write_text("\n".join(rows) + "\n")


def test_isogd_preprocess_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    make_isogd_raw(raw)
    out = tmp_path / "processed" / "isogd" / "train"
    out.mkdir(parents=True)
    get_preprocessor("isogd")(raw, out, "train", 16, 32, 1)

    listing = (out / "list.txt").read_text().strip().splitlines()
    assert len(listing) == 2
    name, n_frames = listing[0].split(" ")
    assert int(n_frames) == T_RAW
    vdir = out / name
    assert len(list((vdir / "color").glob("*.jpg"))) == T_RAW
    assert len(list((vdir / "depth").glob("*.jpg"))) == T_RAW
    flow = np.load(vdir / "optical-flow.npy")
    assert flow.shape == (T_RAW - 1, 32, 32, 2)

    # consumable as both depth and optical-flow modalities
    for gi, ch in [("depth", 1), ("optical-flow", 2)]:
        ds = VideoDataset(
            name="isogd",
            preprocess_func=None,
            video_length=16,
            image_size=32,
            geometric_info=gi,
            processed_root=tmp_path / "processed",
        )
        sample = ds.sample(0, np.random.default_rng(0))
        assert sample[gi].shape == (16, 32, 32, ch)


def test_mug_preprocessor_is_documented_stub():
    with pytest.raises(NotImplementedError):
        get_preprocessor("mug")(Path("x"), Path("y"), "train", 16, 64, 1)


def test_synthetic_large_registry_and_size(tmp_path):
    """Variant names resolve through their base module; synthetic-large
    writes 256 videos whose first entries match ``synthetic``'s stream
    (one RNG stream, same seed)."""
    fn = get_preprocessor("synthetic-large")
    out = tmp_path / "large"
    fn(tmp_path, out, "train", 16, 16, 1)
    lines = (out / "list.txt").read_text().strip().splitlines()
    assert len(lines) == 256
    small = tmp_path / "small"
    get_preprocessor("synthetic")(tmp_path, small, "train", 16, 16, 1)
    import numpy as np

    a = np.load(out / "1" / "optical-flow.npy")
    b = np.load(small / "1" / "optical-flow.npy")
    np.testing.assert_array_equal(a, b)
