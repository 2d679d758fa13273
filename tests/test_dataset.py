"""Dataset + loader tests against the mock fixture.

Port of the reference's pixel-exact decode oracle
(/root/reference/src/test/test_dataset.py) to channels-last layout, plus
loader determinism/sharding tests the reference lacks.
"""

import numpy as np
import pytest

from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.data.loader import VideoLoader
from dcvgan_tpu.data.mock import COLOR_CYCLE, DEPTH_CYCLE

SIZE = 64
LENGTH = 16


def new_mock_dataset(mock_data_root, geometric_info="depth"):
    return VideoDataset(
        name="mock",
        dataset_path=None,
        preprocess_func=None,
        video_length=LENGTH,
        image_size=SIZE,
        geometric_info=geometric_info,
        extension="png",
        processed_root=mock_data_root.parent.parent,
    )


def test_batch_depth(mock_data_root):
    ds = new_mock_dataset(mock_data_root, "depth")
    assert len(ds) == 3
    assert list(ds[0].keys()) == ["color", "depth"]
    for i in range(len(ds)):
        batch = ds[i]
        color, depth = batch["color"], batch["depth"]
        assert color.shape == (LENGTH, SIZE, SIZE, 3)
        assert color.dtype == np.float32
        assert np.all(color >= -1.0) and np.all(color <= 1.0)
        assert depth.shape == (LENGTH, SIZE, SIZE, 1)
        assert np.all(depth >= -1.0) and np.all(depth <= 1.0)


def test_batch_optical_flow(mock_data_root):
    ds = new_mock_dataset(mock_data_root, "optical-flow")
    for i in range(len(ds)):
        batch = ds[i]
        assert list(batch.keys()) == ["color", "optical-flow"]
        flow = batch["optical-flow"]
        assert flow.shape == (LENGTH, SIZE, SIZE, 2)
        assert np.all(flow >= -1.0) and np.all(flow <= 1.0)


def test_flow_fp16_error_bound_at_full_magnitude(tmp_path):
    """The raw_uint8 ship mode sends optical flow as float16. Normalized
    flow (displacement / image_size) can approach +-1.0 for image-sized
    motion, where the fp16 grid is coarsest (~1e-3): pin the worst-case
    absolute error at <= 5e-4 across the FULL magnitude range, not just
    the small-motion regime the mock fixture exercises (ADVICE r4)."""
    from dcvgan_tpu.io.image import write_img

    size = 8
    root = tmp_path / "flowmax" / "train"
    vdir = root / "1"
    (vdir / "color").mkdir(parents=True)
    for j in range(17):
        write_img(np.zeros((size, size, 3), np.uint8),
                  vdir / "color" / f"{j:03d}.jpg")
    rng = np.random.default_rng(42)
    # raw displacements spanning the whole +-image_size envelope
    flow_raw = rng.uniform(-size, size, (17, size, size, 2)).astype(np.float32)
    np.save(vdir / "optical-flow.npy", flow_raw)
    (root / "list.txt").write_text("1 17\n")

    kwargs = dict(
        name="flowmax", preprocess_func=None, video_length=16,
        image_size=size, geometric_info="optical-flow",
        processed_root=tmp_path, extension="jpg",
    )
    exact = VideoDataset(raw_uint8=False, **kwargs).sample(
        0, np.random.default_rng(0))["optical-flow"]
    half = VideoDataset(raw_uint8=True, **kwargs).sample(
        0, np.random.default_rng(0))["optical-flow"]
    assert half.dtype == np.float16
    assert np.abs(exact).max() > 0.9  # the coarse end of the fp16 grid
    err = np.abs(half.astype(np.float32) - exact)
    assert err.max() <= 5e-4, err.max()


def test_batch_segmentation(mock_data_root):
    ds = new_mock_dataset(mock_data_root, "segmentation")
    for i in range(len(ds)):
        segm = ds[i]["segmentation"]
        assert segm.shape == (LENGTH, SIZE, SIZE, 25)
        # exact one-hot
        assert np.all(segm.sum(-1) == 1.0)
        assert set(np.unique(segm)) == {0.0, 1.0}


def test_color_video_pixel_exact(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    for i in range(len(ds)):
        color = ds.sample(i, np.random.default_rng(0))["color"]
        restored = ((color + 1) / 2 * 255).astype(np.uint8)
        # crop always starts at t=0 for the 17-frame fixture
        for j, frame in enumerate(restored):
            assert np.all(frame == COLOR_CYCLE[(i + j) % 3]), (i, j)


def test_depth_video_pixel_exact(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    for i in range(len(ds)):
        depth = ds.sample(i, np.random.default_rng(0))["depth"]
        restored = ((depth + 1) / 2 * 255).astype(np.uint8)
        for j, frame in enumerate(restored):
            assert np.all(frame == DEPTH_CYCLE[(i + j) % 3]), (i, j)


def test_surreal_depth_normalization(tmp_path):
    # Build a minimal surreal-style tree: depth.npy with background + a
    # linear human-depth ramp; check the [-1, 0.8] + bg=1.0 normalization
    # (reference: /root/reference/src/dataset.py:134-155).
    root = tmp_path / "surreal" / "train"
    vdir = root / "1"
    (vdir / "color").mkdir(parents=True)
    from dcvgan_tpu.io.image import write_img

    for j in range(17):
        write_img(np.zeros((8, 8, 3), np.uint8), vdir / "color" / f"{j:03d}.jpg")
    depth = np.full((17, 8, 8), 1e10, np.float64)
    depth[:, 2:6, 2:6] = np.linspace(2.0, 4.0, 16).reshape(4, 4)
    np.save(vdir / "depth.npy", depth)
    (root / "list.txt").write_text("1 17\n")

    ds = VideoDataset(
        name="surreal",
        preprocess_func=None,
        video_length=16,
        image_size=8,
        geometric_info="depth",
        processed_root=tmp_path,
    )
    d = ds.sample(0, np.random.default_rng(0))["depth"]
    assert d.shape == (16, 8, 8, 1)
    assert np.all(d[:, 0, 0] == 1.0)  # background
    human = d[:, 2:6, 2:6]
    assert human.min() == pytest.approx(-1.0)
    assert human.max() == pytest.approx(0.8)


def test_too_short_video_raises(tmp_path):
    root = tmp_path / "short" / "train"
    (root / "1" / "color").mkdir(parents=True)
    (root / "list.txt").write_text("1 16\n")
    ds = VideoDataset(
        name="short", preprocess_func=None, video_length=16,
        processed_root=tmp_path, extension="png",
    )
    with pytest.raises(ValueError, match="insufficient"):
        ds.sample(0, np.random.default_rng(0))


def test_loader_shapes_and_determinism(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    loader = VideoLoader(ds, batchsize=2, n_workers=2, seed=7)
    batches1 = list(loader.epoch_iterator(epoch=0))
    batches2 = list(loader.epoch_iterator(epoch=0))
    assert len(batches1) == 1  # 3 videos, batch 2, drop_last
    assert batches1[0]["color"].shape == (2, LENGTH, SIZE, SIZE, 3)
    assert batches1[0]["depth"].shape == (2, LENGTH, SIZE, SIZE, 1)
    for k in batches1[0]:
        np.testing.assert_array_equal(batches1[0][k], batches2[0][k])
    # different epoch -> different shuffle (probabilistically; 3 items)
    b_e1 = list(loader.epoch_iterator(epoch=1))
    assert len(b_e1) == 1


def test_loader_multihost_sharding(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    full = VideoLoader(ds, batchsize=2, seed=3)
    h0 = VideoLoader(ds, batchsize=2, seed=3, process_index=0, process_count=2)
    h1 = VideoLoader(ds, batchsize=2, seed=3, process_index=1, process_count=2)
    fb = next(iter(full.epoch_iterator(epoch=0)))
    b0 = next(iter(h0.epoch_iterator(epoch=0)))
    b1 = next(iter(h1.epoch_iterator(epoch=0)))
    assert b0["color"].shape[0] == 1 and b1["color"].shape[0] == 1
    np.testing.assert_array_equal(
        np.concatenate([b0["color"], b1["color"]]), fb["color"]
    )


def test_loader_partial_batch_multihost(mock_data_root):
    """drop_last=False: a trailing partial batch is yielded only when it
    splits evenly across hosts; otherwise it is dropped (ragged per-host
    batches would break cross-process global-array assembly)."""
    ds = new_mock_dataset(mock_data_root)  # 3 videos

    # single host, batch 2 -> one full batch + one partial batch of 1
    single = VideoLoader(ds, batchsize=2, seed=0, drop_last=False)
    batches = list(single.epoch_iterator(epoch=0))
    assert len(single) == 2 and len(batches) == 2
    assert batches[0]["color"].shape[0] == 2
    assert batches[1]["color"].shape[0] == 1

    # two hosts, batch 2 -> the partial batch of 1 cannot split evenly:
    # dropped consistently on BOTH hosts, and __len__ agrees
    h0 = VideoLoader(ds, batchsize=2, seed=0, drop_last=False,
                     process_index=0, process_count=2)
    h1 = VideoLoader(ds, batchsize=2, seed=0, drop_last=False,
                     process_index=1, process_count=2)
    b0 = list(h0.epoch_iterator(epoch=0))
    b1 = list(h1.epoch_iterator(epoch=0))
    assert len(h0) == 1 and len(b0) == 1 and len(b1) == 1
    assert b0[0]["color"].shape[0] == 1 and b1[0]["color"].shape[0] == 1


def test_mp4_roundtrip(tmp_path):
    # mp4 codecs are lossy; the reference tolerated atol=2 with ffmpeg
    # (/root/reference/src/test/test_dataio.py:40-48). OpenCV's mp4v
    # YUV conversion drifts up to ~5 on solid frames.
    from dcvgan_tpu.io.video import read_video, write_video

    video = np.stack(
        [np.full((64, 64, 3), v, np.uint8) for v in (10, 120, 230)] * 4
    )
    p = tmp_path / "v.mp4"
    write_video(video, p)
    back = read_video(p)
    assert back.shape == video.shape
    assert np.allclose(back.astype(int), video.astype(int), atol=5)


def test_img_roundtrip_exact(tmp_path):
    from dcvgan_tpu.io.image import read_img, write_img

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    write_img(img, p)
    np.testing.assert_array_equal(read_img(p), img)


def test_resize_modes():
    from dcvgan_tpu.io.image import resize_img, resize_video

    img = np.zeros((32, 32, 3), np.uint8)
    for mode in ("nearest", "linear", "area", "cubic", "lanczos4"):
        assert resize_img(img, (16, 16), mode).shape == (16, 16, 3)
    vid = np.zeros((4, 32, 32, 1), np.uint8)
    assert resize_video(vid, (16, 16), "nearest").shape == (4, 16, 16, 1)


def test_cache_decoded_identical_and_faster(mock_data_root):
    import time

    kwargs = dict(
        name="mock", preprocess_func=None, video_length=LENGTH,
        image_size=SIZE, geometric_info="depth", extension="png",
        processed_root=mock_data_root.parent.parent,
    )
    plain = VideoDataset(cache_decoded=False, **kwargs)
    cached = VideoDataset(cache_decoded=True, **kwargs)
    rng_seed = 5
    for i in range(len(plain)):
        a = plain.sample(i, np.random.default_rng(rng_seed))
        b = cached.sample(i, np.random.default_rng(rng_seed))
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # second epoch over the cached dataset decodes nothing (fast path)
    t0 = time.perf_counter()
    for _ in range(20):
        cached.sample(0, np.random.default_rng(0))
    cached_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        plain.sample(0, np.random.default_rng(0))
    plain_t = time.perf_counter() - t0
    assert cached_t < plain_t


def test_getitem_deterministic(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    a, b = ds[0], ds[0]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_fetch_batch_matches_epoch_iterator(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    loader = VideoLoader(ds, batchsize=2, n_workers=2, seed=11)
    fetched = loader.fetch_batch(epoch=5)
    streamed = next(iter(loader.epoch_iterator(epoch=5)))
    for k in fetched:
        assert fetched[k].shape == streamed[k].shape
        np.testing.assert_array_equal(fetched[k], streamed[k])


def test_fetch_batch_multihost_shards(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    full = VideoLoader(ds, batchsize=2, seed=3)
    h0 = VideoLoader(ds, batchsize=2, seed=3, process_index=0, process_count=2)
    h1 = VideoLoader(ds, batchsize=2, seed=3, process_index=1, process_count=2)
    f = full.fetch_batch(epoch=0)
    a, b = h0.fetch_batch(epoch=0), h1.fetch_batch(epoch=0)
    for k in f:
        np.testing.assert_array_equal(np.concatenate([a[k], b[k]]), f[k])


def test_train_cli_registry_fallback(mock_data_root, tmp_path):
    # Unknown dataset name must still build when a processed tree exists
    # (VERDICT r1 #10: the reference's eval() dispatch would die here).
    import shutil

    from dcvgan_tpu.cli.train import build_dataset
    from dcvgan_tpu.config import ExperimentConfig

    root = tmp_path / "processed"
    shutil.copytree(mock_data_root, root / "mystery" / "train")
    cfg = ExperimentConfig.from_dict(
        {
            "geometric_info": {"name": "depth", "channel": 1},
            "dataset": {
                "name": "mystery",
                "path": None,
                "processed_root": str(root),
                "extension": "png",
            },
        }
    )
    ds = build_dataset(cfg)
    assert len(ds) == 3

    cfg.dataset.name = "missing-and-no-tree"
    with pytest.raises(KeyError):
        build_dataset(cfg)


def test_loader_shard_divisor_drops_unshardable_partial(mock_data_root):
    """drop_last=False + shard_divisor (mesh data-axis size): a trailing
    partial batch the mesh cannot shard is dropped instead of failing at
    device_put (ADVICE r2)."""
    ds = new_mock_dataset(mock_data_root)  # 3 videos

    # batch 2, divisor 1 -> partial batch of 1 is yielded
    plain = VideoLoader(ds, batchsize=2, seed=0, drop_last=False)
    assert len(plain) == 2
    # divisor 2 -> the partial batch of 1 is not divisible: dropped
    sharded = VideoLoader(ds, batchsize=2, seed=0, drop_last=False,
                          shard_divisor=2)
    batches = list(sharded.epoch_iterator(epoch=0))
    assert len(sharded) == 1 and len(batches) == 1
    assert batches[0]["color"].shape[0] == 2
    plain.close(), sharded.close()


def test_loader_close_shuts_down_pool(mock_data_root):
    ds = new_mock_dataset(mock_data_root)
    with VideoLoader(ds, batchsize=2, seed=0) as loader:
        next(iter(loader.epoch_iterator(epoch=0)))
    # pool is down: further decode submissions must fail
    with pytest.raises(RuntimeError):
        loader._pool.submit(lambda: None)
    loader.close()  # idempotent
