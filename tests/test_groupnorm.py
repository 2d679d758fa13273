"""GroupNorm opt-in (``trainer.norm: group``) tests.

VERDICT r4 "next round" #3: the profile attributes ~33% of the fused step
to BatchNorm statistics (PERFORMANCE.md breakdown); ``trainer.norm: group``
swaps every BatchNorm in the five models for per-sample
:class:`ChannelGroupNorm` — no cross-batch reductions, no running stats, no
train/eval duality. Default stays "batch" = reference parity
(/root/reference/src/discriminator.py:91-102 BN placement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvgan_tpu import prng
from dcvgan_tpu.config import ConfigError, ExperimentConfig
from dcvgan_tpu.models.layers import ChannelGroupNorm
from dcvgan_tpu.train.step import DCVGAN

T, S = 16, 64


def tiny_config(**over):
    raw = {
        "batchsize": 2,
        "n_epochs": 1,
        "seed": 0,
        "video_length": T,
        "image_size": S,
        "geometric_info": {"name": "depth", "channel": 1},
        "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
        "cgen": {"dim_z_color": 4, "ngf": 8},
        "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
        "vdis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
        "gdis": {"use_noise": False, "noise_sigma": 0.2, "ndf": 8},
        "trainer": {
            "precision": "float32",
            "donate_state": False,
            "norm": "group",
        },
    }
    raw.update(over)
    cfg = ExperimentConfig.from_dict(raw)
    cfg.validate()
    return cfg


def fake_batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "color": rng.uniform(-1, 1, (b, T, S, S, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (b, T, S, S, 1)).astype(np.float32),
    }


def test_channel_group_norm_math():
    # 2 samples, 3x3 spatial, 8 channels in 2 groups of 4: per-sample,
    # per-group zero-mean unit-variance at init (scale ~ N(1, .02), bias 0)
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, (2, 3, 3, 8)).astype(np.float32)
    gn = ChannelGroupNorm(max_groups=2)
    vars_ = gn.init(jax.random.key(0), jnp.asarray(x))
    assert "batch_stats" not in vars_
    scale = np.asarray(vars_["params"]["scale"])
    y = np.asarray(gn.apply(vars_, jnp.asarray(x)))
    # undo the affine, check the normalized moments per (sample, group)
    yn = y / scale
    for b in range(2):
        for g in range(2):
            grp = yn[b, :, :, g * 4:(g + 1) * 4]
            assert abs(grp.mean()) < 1e-5
            assert abs(grp.var() - 1.0) < 1e-3


def test_group_count_adapts_to_channels():
    # 48 channels -> 24 groups (largest divisor <= 32); 5 -> 5; 7 -> 7
    for c, want in ((48, 24), (64, 32), (5, 5), (7, 7), (4, 4)):
        x = jnp.zeros((1, 2, 2, c))
        gn = ChannelGroupNorm()
        v = gn.init(jax.random.key(0), x)
        assert gn.apply(v, x).shape == x.shape
        g = min(32, c)
        while c % g:
            g -= 1
        assert g == want


def test_config_validation():
    with pytest.raises(ConfigError, match="trainer.norm"):
        tiny_config(trainer={"norm": "instance"})
    with pytest.raises(ConfigError, match="mesh.time"):
        tiny_config(
            trainer={"norm": "group"}, mesh={"data": 4, "time": 2}
        )
    # batch + time sharding stays legal
    tiny_config(trainer={"norm": "batch"}, mesh={"data": 4, "time": 2})


@pytest.fixture(scope="module")
def gan():
    return DCVGAN(tiny_config())


@pytest.fixture(scope="module")
def state0(gan):
    return gan.init_state(prng.base_key(0))


def test_no_batch_stats_anywhere(gan, state0):
    for name, ms in state0.models.items():
        assert not jax.tree.leaves(ms.batch_stats), (
            f"{name} still carries batch statistics under norm=group"
        )


def test_train_step_runs_and_updates(gan, state0):
    state1, metrics = gan.jitted_train_step(state0, fake_batch(), prng.base_key(0))
    assert int(state1.step) == 1
    for m in ("loss_idis", "loss_vdis", "loss_gdis", "loss_gen"):
        v = float(metrics[m])
        assert np.isfinite(v) and v > 0, m
    for name in ("ggen", "cgen", "idis", "vdis", "gdis"):
        before = jax.tree.leaves(getattr(state0, name).params)
        after = jax.tree.leaves(getattr(state1, name).params)
        assert any(
            not np.allclose(b, a) for b, a in zip(before, after)
        ), f"{name} params did not update"


def test_sampling_shapes(gan, state0):
    xg, xc = gan.sample_videos(state0, prng.base_key(1), 2)
    assert xg.shape == (2, T, S, S, 1)
    assert xc.shape == (2, T, S, S, 3)
    assert np.isfinite(np.asarray(xg)).all()
    assert np.isfinite(np.asarray(xc)).all()


def test_param_trees_match_batchnorm_variant(gan, state0):
    # same param names/shapes as the BatchNorm build: only the batch_stats
    # collection disappears, so checkpoints/optimizers/EMA machinery are
    # oblivious to the swap
    bn_gan = DCVGAN(tiny_config(trainer={
        "precision": "float32", "donate_state": False, "norm": "batch",
    }))
    bn_state = bn_gan.init_state(prng.base_key(0))
    for name in ("ggen", "cgen", "idis", "vdis", "gdis"):
        ours = jax.tree.structure(getattr(state0, name).params)
        theirs = jax.tree.structure(getattr(bn_state, name).params)
        assert ours == theirs, name


def test_checkpoint_roundtrip(gan, state0, tmp_path):
    from dcvgan_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpt")
    state1, _ = gan.jitted_train_step(state0, fake_batch(), prng.base_key(0))
    mgr.save(state1)
    mgr.wait()
    restored = mgr.restore(gan.init_state(prng.base_key(0)))
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state1), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
