"""Native C++ host-pipeline kernels: bit-exactness vs numpy + build fallback."""

import numpy as np

from dcvgan_tpu import native


def test_native_library_builds():
    assert native.available(), "g++ build of libdcvgan_host.so failed"


def test_normalize_u8_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    got = native.normalize_u8(x, 127.5, -1.0)
    want = x.astype(np.float32) / 127.5 - 1.0
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_one_hot_matches_numpy():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 25, (16, 64, 64), dtype=np.uint8)
    got = native.one_hot(labels, 25)
    want = np.eye(25, dtype=np.float32)[labels]
    np.testing.assert_array_equal(got, want)


def test_scale_f32_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(16, 64, 64, 2)).astype(np.float32)
    got = native.scale_f32(x, 1.0 / 64.0)
    np.testing.assert_allclose(got, x / 64.0, rtol=1e-7)


def test_large_array_threaded():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (8, 16, 64, 64, 3), dtype=np.uint8)
    got = native.normalize_u8(x, 0.5, 1.0)
    want = x.astype(np.float32) / 0.5 + 1.0
    np.testing.assert_allclose(got, want)
