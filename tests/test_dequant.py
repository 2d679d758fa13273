"""Device-side dequantization (Pallas kernel) + uint8 loader passthrough."""

import jax.numpy as jnp
import numpy as np
import pytest

from dcvgan_tpu.ops.dequant import dequantize_video


def ref_norm(x):
    return x.astype(np.float32) / 127.5 - 1.0


def test_dequant_xla_path_matches_host():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 16, 64, 64, 3), dtype=np.uint8)
    out = dequantize_video(jnp.asarray(x), jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref_norm(x), atol=1e-6)


def test_dequant_pallas_interpret_matches_host():
    """Exercise the actual Pallas kernel logic via the interpreter."""
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (3, 7, 11, 5), dtype=np.uint8)  # ragged: pads
    out = dequantize_video(jnp.asarray(x), jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref_norm(x), atol=1e-6)


def test_dequant_bf16_dtype():
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = dequantize_video(jnp.asarray(x), jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref_norm(x), atol=2e-2
    )


def test_dequant_rejects_float():
    with pytest.raises(TypeError):
        dequantize_video(jnp.zeros((2, 2), jnp.float32))


def test_dataset_raw_uint8_passthrough(mock_data_root):
    from dcvgan_tpu.data.dataset import VideoDataset

    kwargs = dict(
        name="mock", preprocess_func=None, video_length=16, image_size=64,
        geometric_info="depth", extension="png",
        processed_root=mock_data_root.parent.parent,
    )
    ds_raw = VideoDataset(raw_uint8=True, **kwargs)
    ds_f32 = VideoDataset(raw_uint8=False, **kwargs)
    raw = ds_raw.sample(0, np.random.default_rng(0))
    f32 = ds_f32.sample(0, np.random.default_rng(0))
    assert raw["color"].dtype == np.uint8
    assert raw["depth"].dtype == np.uint8
    np.testing.assert_allclose(ref_norm(raw["color"]), f32["color"], atol=1e-6)
    np.testing.assert_allclose(ref_norm(raw["depth"]), f32["depth"], atol=1e-6)


def test_train_step_accepts_uint8_batch():
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import ExperimentConfig
    from dcvgan_tpu.train.step import DCVGAN

    cfg = ExperimentConfig.from_dict(
        {
            "batchsize": 2,
            "video_length": 16,
            "image_size": 64,
            "geometric_info": {"name": "depth", "channel": 1},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": False, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32", "donate_state": False},
        }
    )
    cfg.validate()
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    rng = np.random.default_rng(0)
    u8 = {
        "color": rng.integers(0, 256, (2, 16, 64, 64, 3), dtype=np.uint8),
        "depth": rng.integers(0, 256, (2, 16, 64, 64, 1), dtype=np.uint8),
    }
    f32 = {k: ref_norm(v) for k, v in u8.items()}
    key = prng.base_key(0)
    _, m_u8 = gan.jitted_train_step(state, u8, key)
    _, m_f32 = gan.jitted_train_step(state, f32, key)
    for k in m_u8:
        assert float(m_u8[k]) == pytest.approx(float(m_f32[k]), rel=1e-5), k


def test_dataset_raw_segm_labels(mock_data_root):
    """Segmentation ships uint8 class labels under raw_uint8 (25x less
    transfer); on-device one-hot must equal the host one-hot branch."""
    from dcvgan_tpu.data.dataset import NUM_SEGM_PARTS, VideoDataset

    kwargs = dict(
        name="mock", preprocess_func=None, video_length=16, image_size=64,
        geometric_info="segmentation", extension="png",
        processed_root=mock_data_root.parent.parent,
    )
    raw = VideoDataset(raw_uint8=True, **kwargs).sample(0, np.random.default_rng(0))
    f32 = VideoDataset(raw_uint8=False, **kwargs).sample(0, np.random.default_rng(0))
    labels = raw["segmentation"]
    assert labels.dtype == np.uint8 and labels.shape == (16, 64, 64, 1)
    onehot = np.eye(NUM_SEGM_PARTS, dtype=np.float32)[labels[..., 0]]
    np.testing.assert_array_equal(onehot, f32["segmentation"])


def test_train_step_segm_label_ingest_equivalence():
    """The jitted train step produces identical metrics whether the
    segmentation batch arrives as host one-hot float32 or raw uint8 labels
    (one-hot expanded on device)."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import ExperimentConfig
    from dcvgan_tpu.train.step import DCVGAN

    cfg = ExperimentConfig.from_dict(
        {
            "batchsize": 2,
            "video_length": 16,
            "image_size": 64,
            "geometric_info": {"name": "segmentation", "channel": 25},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": False, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32", "donate_state": False},
        }
    )
    cfg.validate()
    gan = DCVGAN(cfg)
    key = prng.base_key(0)
    state = gan.init_state(key)

    rng = np.random.default_rng(0)
    color = rng.uniform(-1, 1, (2, 16, 64, 64, 3)).astype(np.float32)
    labels = rng.integers(0, 25, (2, 16, 64, 64, 1), dtype=np.uint8)
    onehot = np.eye(25, dtype=np.float32)[labels[..., 0]]

    _, m_onehot = gan.jitted_train_step(
        state, {"color": color, "segmentation": onehot}, key
    )
    _, m_labels = gan.jitted_train_step(
        state, {"color": color, "segmentation": labels}, key
    )
    for k in m_onehot:
        np.testing.assert_allclose(
            float(m_onehot[k]), float(m_labels[k]), rtol=1e-5,
            err_msg=f"metric {k} differs between one-hot and label ingest",
        )


def test_dataset_raw_flow_float16(mock_data_root):
    """Optical flow ships float16 under raw_uint8 (2x less transfer); it
    must match the float32 branch within half-precision tolerance."""
    from dcvgan_tpu.data.dataset import VideoDataset

    kwargs = dict(
        name="mock", preprocess_func=None, video_length=16, image_size=64,
        geometric_info="optical-flow", extension="png",
        processed_root=mock_data_root.parent.parent,
    )
    raw = VideoDataset(raw_uint8=True, **kwargs).sample(0, np.random.default_rng(0))
    f32 = VideoDataset(raw_uint8=False, **kwargs).sample(0, np.random.default_rng(0))
    flow16 = raw["optical-flow"]
    assert flow16.dtype == np.float16
    assert f32["optical-flow"].dtype == np.float32
    np.testing.assert_allclose(
        flow16.astype(np.float32), f32["optical-flow"], atol=2e-4
    )
