"""Model forward-shape and semantics tests.

Ports the reference's shape smoke tests
(/root/reference/src/test/test_generator.py, test_discriminator.py) to
channels-last layout and adds semantic checks the reference lacks:
output ranges, latent structure (content constant over time), BN state
mutation, dropout determinism switches, and segmentation binarization.
"""

import jax
import numpy as np
import pytest

from dcvgan_tpu.models import (
    ColorVideoGenerator,
    GeometricVideoGenerator,
    GradientDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)

IMAGE_SIZE = 64
VIDEO_LENGTH = 16
BATCH = 2

GEOMETRIC_INFOS = {"depth": 1, "optical-flow": 2, "segmentation": 25}


def ggen_rngs(seed=0):
    k = jax.random.key(seed)
    return {"params": k, "latent": jax.random.fold_in(k, 1)}


@pytest.mark.parametrize("name,ch", list(GEOMETRIC_INFOS.items()))
def test_geometric_video_generator_shapes(name, ch):
    model = GeometricVideoGenerator(
        dim_z_content=30, dim_z_motion=10, channel=ch, geometric_info=name,
        ngf=16, video_length=VIDEO_LENGTH,
    )
    variables = model.init(ggen_rngs(), BATCH, train=False)
    videos = model.apply(variables, BATCH, train=False, rngs={"latent": jax.random.key(1)})
    assert videos.shape == (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, ch)
    videos = np.asarray(videos)
    if name == "segmentation":
        np.testing.assert_allclose(videos.sum(-1), 1.0, atol=1e-5)
        assert np.all(videos >= 0)
    else:
        assert np.all(videos >= -1) and np.all(videos <= 1)


def test_ggen_content_code_constant_over_time():
    model = GeometricVideoGenerator(
        dim_z_content=8, dim_z_motion=4, channel=1, ngf=8,
        video_length=VIDEO_LENGTH,
    )
    variables = model.init(ggen_rngs(), BATCH, train=False)
    z = model.apply(
        variables, BATCH, rngs={"latent": jax.random.key(2)},
        method=model.sample_latents,
    )
    assert z.shape == (BATCH, VIDEO_LENGTH, 12)
    z = np.asarray(z)
    # content half identical across frames; motion half varies
    assert np.all(z[:, :, :8] == z[:, :1, :8])
    assert np.any(z[:, 0, 8:] != z[:, 1, 8:])


def test_ggen_train_mode_mutates_batch_stats():
    model = GeometricVideoGenerator(channel=1, ngf=8, video_length=4)
    variables = model.init(ggen_rngs(), BATCH, train=False)
    out, mutated = model.apply(
        variables, BATCH, train=True,
        rngs={"latent": jax.random.key(3)}, mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


@pytest.mark.parametrize("name,ch", [("depth", 1), ("optical-flow", 2)])
def test_color_video_generator_frame_forward(name, ch):
    model = ColorVideoGenerator(in_ch=ch, dim_z=10, geometric_info=name, ngf=16)
    k = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (BATCH, IMAGE_SIZE, IMAGE_SIZE, ch))
    z = jax.random.normal(jax.random.fold_in(k, 2), (BATCH, 10))
    variables = model.init({"params": k, "dropout": k}, x, z, train=False)
    y = model.apply(variables, x, z, train=False)
    assert y.shape == (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)
    y = np.asarray(y)
    assert np.all(y >= -1) and np.all(y <= 1)


def test_color_video_generator_videos():
    model = ColorVideoGenerator(in_ch=1, dim_z=10, ngf=16)
    k = jax.random.key(0)
    xs = jax.random.normal(k, (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 1))
    variables = model.init(
        {"params": k, "dropout": k, "latent": k}, xs, train=False,
        method=model.forward_videos,
    )
    ys = model.apply(
        variables, xs, train=True,
        rngs={"dropout": jax.random.fold_in(k, 1), "latent": jax.random.fold_in(k, 2)},
        mutable=["batch_stats"], method=model.forward_videos,
    )[0]
    assert ys.shape == (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 3)


def test_cgen_segmentation_binarization():
    model = ColorVideoGenerator(in_ch=25, dim_z=4, geometric_info="segmentation", ngf=8)
    k = jax.random.key(0)
    x = jax.nn.softmax(jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 25)), -1)
    z = jax.random.normal(k, (BATCH, 4))
    variables = model.init({"params": k, "dropout": k}, x, z, train=False)

    # gradient w.r.t. x must be zero: argmax binarization stops it
    def f(x_):
        return model.apply(variables, x_, z, train=False).sum()

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_cgen_dropout_train_vs_eval():
    model = ColorVideoGenerator(in_ch=1, dim_z=4, ngf=8)
    k = jax.random.key(0)
    x = jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1))
    z = jax.random.normal(k, (BATCH, 4))
    variables = model.init({"params": k, "dropout": k}, x, z, train=False)
    y_eval1 = model.apply(variables, x, z, train=False)
    y_eval2 = model.apply(variables, x, z, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval1), np.asarray(y_eval2))
    y_tr1, _ = model.apply(
        variables, x, z, train=True,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    y_tr2, _ = model.apply(
        variables, x, z, train=True,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))


def test_image_discriminator():
    model = ImageDiscriminator(ch_g=1, ch_c=3, use_noise=True, noise_sigma=0.2, ndf=16)
    k = jax.random.key(0)
    xg = jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1))
    xc = jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
    variables = model.init({"params": k, "noise": k}, xg, xc)
    y, _ = model.apply(
        variables, xg, xc, rngs={"noise": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == (BATCH, 4, 4)


def test_video_discriminator():
    model = VideoDiscriminator(ch_g=1, ch_c=3, use_noise=True, noise_sigma=0.2, ndf=16)
    k = jax.random.key(0)
    xg = jax.random.normal(k, (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 1))
    xc = jax.random.normal(k, (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 3))
    variables = model.init({"params": k, "noise": k}, xg, xc)
    y, _ = model.apply(
        variables, xg, xc, rngs={"noise": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == (BATCH, 4, 4, 4)  # T: 16→13→10→7→4


def test_gradient_discriminator():
    model = GradientDiscriminator(ch_g=1, ch_c=3, use_noise=True, noise_sigma=0.2, ndf=16)
    k = jax.random.key(0)
    xg = jax.random.normal(k, (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 1))
    xc = jax.random.normal(k, (BATCH, VIDEO_LENGTH, IMAGE_SIZE, IMAGE_SIZE, 3))
    variables = model.init({"params": k, "noise": k}, xg, xc)
    y, _ = model.apply(
        variables, xg, xc, rngs={"noise": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert y.shape == (BATCH, 3, 4, 4)  # (T-1): 15→12→9→6→3


def test_noise_layer_disabled_is_identity():
    model = ImageDiscriminator(ch_g=1, ch_c=3, use_noise=False, ndf=16)
    k = jax.random.key(0)
    xg = jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1))
    xc = jax.random.normal(k, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
    variables = model.init({"params": k}, xg, xc)
    y1, _ = model.apply(variables, xg, xc, mutable=["batch_stats"])
    y2, _ = model.apply(variables, xg, xc, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_conv2d_init_distribution():
    # 2D convs: N(0, 0.02); GRU: U(±1/sqrt(dm)) — reference init parity.
    model = GeometricVideoGenerator(channel=1, ngf=32, video_length=4)
    variables = model.init(ggen_rngs(), BATCH, train=False)
    w = np.asarray(variables["params"]["ups_1"]["kernel"]).ravel()
    assert abs(w.std() - 0.02) < 0.002
    assert abs(w.mean()) < 0.002


@pytest.fixture
def stacked_stem3d():
    # force the stacked branch on (default is 0 = direct everywhere; the
    # stacked lowering is kept as a probed negative, see models/layers.py)
    from dcvgan_tpu.models import layers

    old = layers.STACK3D_MAX_CIN_KT
    layers.STACK3D_MAX_CIN_KT = 128
    yield
    layers.STACK3D_MAX_CIN_KT = old


@pytest.mark.parametrize("cin", [1, 3, 40])  # 40*4=160 > 128: direct branch
def test_timestack_conv3d_matches_direct(cin, stacked_stem3d):
    # TimeStackConv3d's temporal-im2col branch (Cin*kt <= 128) must be
    # numerically identical (f32) to the direct 3D lowering, with the same
    # parameter tree; Cin*kt > 128 takes the direct branch by construction.
    import jax.numpy as jnp
    from jax import lax

    from dcvgan_tpu.models.layers import TimeStackConv3d

    m = TimeStackConv3d(features=8)
    x = jax.random.normal(jax.random.key(0), (2, 7, 16, 16, cin))
    variables = m.init({"params": jax.random.key(1)}, x)
    w = variables["params"]["kernel"]
    assert w.shape == (4, 4, 4, cin, 8)
    y = m.apply(variables, x)
    dn = lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
    )
    ref = lax.conv_general_dilated(
        x, w, (1, 2, 2), ((0, 0), (1, 1), (1, 1)), dimension_numbers=dn
    )
    assert y.shape == ref.shape == (2, 4, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("direct_bwd", [True, False])
def test_timestack_conv3d_gradients_match_direct(direct_bwd, stacked_stem3d):
    import jax.numpy as jnp
    from jax import lax

    from dcvgan_tpu.models import layers

    old = layers.STACK3D_DIRECT_BWD
    layers.STACK3D_DIRECT_BWD = direct_bwd
    try:
        _check_timestack_gradients()
    finally:
        layers.STACK3D_DIRECT_BWD = old


def _check_timestack_gradients():
    import jax.numpy as jnp
    from jax import lax

    from dcvgan_tpu.models.layers import TimeStackConv3d

    m = TimeStackConv3d(features=4)
    x = jax.random.normal(jax.random.key(2), (2, 6, 8, 8, 3))
    variables = m.init({"params": jax.random.key(3)}, x)

    def loss_stacked(w, x):
        return jnp.sum(m.apply({"params": {"kernel": w}}, x) ** 2)

    def loss_direct(w, x):
        dn = lax.conv_dimension_numbers(
            (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
        )
        y = lax.conv_general_dilated(
            x, w, (1, 2, 2), ((0, 0), (1, 1), (1, 1)), dimension_numbers=dn
        )
        return jnp.sum(y**2)

    w = variables["params"]["kernel"]
    gw1, gx1 = jax.grad(loss_stacked, (0, 1))(w, x)
    gw2, gx2 = jax.grad(loss_direct, (0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-4, atol=1e-4)
