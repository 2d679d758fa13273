"""Train-step tests: state transition, gating, determinism, finiteness.

The reference's trainer loop is entirely untested (SURVEY.md §4); these are
the convergence-smoke and semantics tests the rebuild adds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvgan_tpu import prng
from dcvgan_tpu.config import ExperimentConfig
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
        "trainer": {"precision": "float32", "donate_state": False},
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


@pytest.fixture(scope="module")
def gan():
    return DCVGAN(tiny_config())


@pytest.fixture(scope="module")
def state0(gan):
    return gan.init_state(prng.base_key(0))


def test_init_state_structure(gan, state0):
    assert int(state0.step) == 0
    for name, ms in state0.models.items():
        assert jax.tree.leaves(ms.params), name
        # generators + all critics have BN stats
        assert jax.tree.leaves(ms.batch_stats), name


def test_train_step_updates_all_models(gan, state0):
    batch = fake_batch()
    key = prng.base_key(0)
    state1, metrics = gan.jitted_train_step(state0, batch, key)
    assert int(state1.step) == 1
    for m in ("loss_idis", "loss_vdis", "loss_gdis", "loss_gen"):
        v = float(metrics[m])
        assert np.isfinite(v), m
        assert v > 0, m
    for name in ("ggen", "cgen", "idis", "vdis", "gdis"):
        before = jax.tree.leaves(getattr(state0, name).params)
        after = jax.tree.leaves(getattr(state1, name).params)
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed, f"{name} params did not update"


def test_train_step_deterministic(gan, state0):
    batch = fake_batch()
    key = prng.base_key(7)
    s_a, m_a = gan.jitted_train_step(state0, batch, key)
    s_b, m_b = gan.jitted_train_step(state0, batch, key)
    for la, lb in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for k in m_a:
        assert float(m_a[k]) == float(m_b[k])


def test_update_ratio_gating():
    # num_gen_update=2: D updates only on even iterations (1-based), i.e. the
    # reference's inverted-name gating (/root/reference/src/trainer.py:318).
    cfg = tiny_config(num_gen_update=2)
    gan = DCVGAN(cfg)
    state0 = gan.init_state(prng.base_key(0))
    batch = fake_batch()
    key = prng.base_key(0)
    state1, _ = gan.jitted_train_step(state0, batch, key)
    # iteration 1: 1 % 2 != 0 -> D params unchanged, G updated
    for name in ("idis", "vdis", "gdis"):
        for b, a in zip(
            jax.tree.leaves(getattr(state0, name).params),
            jax.tree.leaves(getattr(state1, name).params),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    changed = any(
        not np.allclose(b, a)
        for b, a in zip(
            jax.tree.leaves(state0.ggen.params),
            jax.tree.leaves(state1.ggen.params),
        )
    )
    assert changed
    # iteration 2: D updates
    state2, _ = gan.jitted_train_step(state1, batch, key)
    d_changed = any(
        not np.allclose(b, a)
        for b, a in zip(
            jax.tree.leaves(state1.idis.params),
            jax.tree.leaves(state2.idis.params),
        )
    )
    assert d_changed


def test_ggen_double_step_differs():
    batch = fake_batch()
    key = prng.base_key(0)
    g1 = DCVGAN(tiny_config())
    s1 = g1.init_state(prng.base_key(0))
    out1, _ = g1.jitted_train_step(s1, batch, key)
    g2 = DCVGAN(
        tiny_config(
            trainer={
                "precision": "float32",
                "ggen_double_step": True,
                "donate_state": False,
            }
        )
    )
    s2 = g2.init_state(prng.base_key(0))
    out2, _ = g2.jitted_train_step(s2, batch, key)
    # same init, same key: only the double ggen step differs
    same_init = all(
        np.allclose(b, a)
        for b, a in zip(jax.tree.leaves(s1.ggen.params), jax.tree.leaves(s2.ggen.params))
    )
    assert same_init
    differs = any(
        not np.allclose(b, a)
        for b, a in zip(
            jax.tree.leaves(out1.ggen.params), jax.tree.leaves(out2.ggen.params)
        )
    )
    assert differs
    # cgen gets a single step in both -> identical
    for b, a in zip(
        jax.tree.leaves(out1.cgen.params), jax.tree.leaves(out2.cgen.params)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))


def test_sample_videos_shapes_and_range(gan, state0):
    xg, xc = gan.sample_videos(state0, prng.base_key(3), 2)
    assert xg.shape == (2, T, S, S, 1)
    assert xc.shape == (2, T, S, S, 3)
    assert np.all(np.abs(np.asarray(xg)) <= 1.0)
    assert np.all(np.abs(np.asarray(xc)) <= 1.0)


def test_hinge_loss_step():
    cfg = tiny_config(loss="hinge-loss")
    gan = DCVGAN(cfg)
    state0 = gan.init_state(prng.base_key(0))
    _, metrics = gan.jitted_train_step(state0, fake_batch(), prng.base_key(0))
    assert np.isfinite(float(metrics["loss_gen"]))


def test_bf16_step_finite():
    cfg = tiny_config(trainer={"precision": "bfloat16", "donate_state": False})
    gan = DCVGAN(cfg)
    state0 = gan.init_state(prng.base_key(0))
    _, metrics = gan.jitted_train_step(state0, fake_batch(), prng.base_key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params remain f32
    assert jax.tree.leaves(state0.ggen.params)[0].dtype == jnp.float32


def test_remat_preserves_losses():
    """jax.checkpoint on the generators is semantics-preserving."""
    batch = fake_batch()
    key = prng.base_key(0)
    base = DCVGAN(tiny_config())
    s0 = base.init_state(prng.base_key(0))
    _, m_base = base.jitted_train_step(s0, batch, key)
    rm = DCVGAN(
        tiny_config(trainer={"precision": "float32", "donate_state": False,
                             "remat": True})
    )
    s1 = rm.init_state(prng.base_key(0))
    _, m_rm = rm.jitted_train_step(s1, batch, key)
    for k in m_base:
        assert float(m_base[k]) == pytest.approx(float(m_rm[k]), rel=1e-6), k


def test_critic_stat_reuse_flag():
    """critic_stat_reuse freezes BN stats in the G-phase critic forwards:
    D-phase losses are untouched, loss_gen differs, state stays finite,
    and critic running stats advance only through the D phase."""
    cfg_off = tiny_config()
    cfg_on = tiny_config(
        trainer={
            "precision": "float32",
            "donate_state": False,
            "critic_stat_reuse": True,
        }
    )
    gan_off, gan_on = DCVGAN(cfg_off), DCVGAN(cfg_on)
    state = gan_off.init_state(prng.base_key(0))
    batch = jax.device_put(fake_batch())
    key = prng.base_key(7)

    s_off, m_off = gan_off.jitted_train_step(state, batch, key)
    s_on, m_on = gan_on.jitted_train_step(state, batch, key)

    for k in ("loss_idis", "loss_vdis", "loss_gdis"):
        assert float(m_off[k]) == pytest.approx(float(m_on[k]), rel=1e-5), k
    assert float(m_off["loss_gen"]) != pytest.approx(
        float(m_on["loss_gen"]), rel=1e-6
    )
    for k, v in m_on.items():
        assert np.isfinite(float(v)), k
    # critic stats advance identically (G phase never persisted them)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s_off.vdis.batch_stats, s_on.vdis.batch_stats,
    )


def test_shared_fakes_flag():
    """shared_fakes: one generator forward per step (D sees stop-gradient,
    G differentiates through the same samples). All five models still
    update; losses finite; D losses differ from the fresh-fakes path only
    through the shared sample draw."""
    cfg = tiny_config(
        trainer={
            "precision": "float32",
            "donate_state": False,
            "shared_fakes": True,
        }
    )
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    batch = jax.device_put(fake_batch())

    s1, m1 = gan.jitted_train_step(state, batch, prng.base_key(7))
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    for name in ("ggen", "cgen", "idis", "vdis", "gdis"):
        before = jax.tree.leaves(getattr(state, name).params)[0]
        after = jax.tree.leaves(getattr(s1, name).params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), name
    # deterministic given (state, batch, key)
    s1b, m1b = gan.jitted_train_step(state, batch, prng.base_key(7))
    for k in m1:
        assert float(m1[k]) == float(m1b[k]), k


def test_critic_joint_batch_flag():
    """critic_joint_batch: each D-phase critic runs once on [real; fake]
    (2B). All five models update, losses are finite and deterministic, and
    when real == fake the split logits halves agree (same samples through
    the same joint-BN forward), making each D loss its exact fixed point
    value for that degenerate input."""
    cfg = tiny_config(
        trainer={
            "precision": "float32",
            "donate_state": False,
            "critic_joint_batch": True,
        }
    )
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    batch = jax.device_put(fake_batch())

    s1, m1 = gan.jitted_train_step(state, batch, prng.base_key(7))
    for k, v in m1.items():
        assert np.isfinite(float(v)), k
    for name in ("ggen", "cgen", "idis", "vdis", "gdis"):
        before = jax.tree.leaves(getattr(state, name).params)[0]
        after = jax.tree.leaves(getattr(s1, name).params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), name
    # deterministic given (state, batch, key)
    _, m1b = gan.jitted_train_step(state, batch, prng.base_key(7))
    for k in m1:
        assert float(m1[k]) == float(m1b[k]), k

    # degenerate oracle: feed the generator's own (eval-mode) samples as the
    # "real" batch with noise off -> y_real and y_fake see identical inputs
    # through one joint forward, so D losses hit the exact symmetric value
    # loss.dis(y, y) regardless of BN, on a no-noise config
    cfg_nn = tiny_config(
        idis={"use_noise": False, "ndf": 8},
        vdis={"use_noise": False, "ndf": 8},
        gdis={"use_noise": False, "ndf": 8},
        trainer={
            "precision": "float32",
            "donate_state": False,
            "critic_joint_batch": True,
            "shared_fakes": True,
        },
    )
    gan_nn = DCVGAN(cfg_nn)
    st = gan_nn.init_state(prng.base_key(0))
    key = prng.base_key(3)
    # reproduce the step's fake draw: train-mode generator forward under the
    # step's key schedule (step counter = 1)
    kstep = prng.for_step(key, jnp.asarray(1, jnp.int32))
    kg = prng.named(kstep, "g_fake")
    xg_f = gan_nn.ggen.apply(
        {"params": st.ggen.params, "batch_stats": st.ggen.batch_stats},
        2, train=True, rngs={"latent": prng.named(kg, "ggen_motion")},
        mutable=["batch_stats"],
    )[0]
    xc_f = gan_nn.cgen.apply(
        {"params": st.cgen.params, "batch_stats": st.cgen.batch_stats},
        xg_f, train=True,
        rngs={"latent": prng.named(kg, "cgen_color"),
              "dropout": prng.named(kg, "cgen_dropout")},
        mutable=["batch_stats"],
        method=type(gan_nn.cgen).forward_videos,
    )[0]
    batch_same = {
        "color": np.asarray(xc_f, np.float32),
        "depth": np.asarray(xg_f, np.float32),
    }
    _, m_same = gan_nn.jitted_train_step(st, batch_same, key)
    # BCE at y_real == y_fake: -log s(y) - log(1 - s(y)) >= 2 ln 2.
    for k in ("loss_idis", "loss_vdis", "loss_gdis"):
        assert float(m_same[k]) >= 2 * np.log(2.0) - 1e-4, k
    # and with identical halves, joint-batch BN statistics coincide with
    # per-pass statistics, so the D losses must equal the separate-forward
    # path's exactly — the joint path computes the same function
    cfg_sep = tiny_config(
        idis={"use_noise": False, "ndf": 8},
        vdis={"use_noise": False, "ndf": 8},
        gdis={"use_noise": False, "ndf": 8},
        trainer={
            "precision": "float32",
            "donate_state": False,
            "shared_fakes": True,
        },
    )
    _, m_sep = DCVGAN(cfg_sep).jitted_train_step(st, batch_same, key)
    for k in ("loss_idis", "loss_vdis", "loss_gdis"):
        assert float(m_same[k]) == pytest.approx(float(m_sep[k]), rel=1e-5), k
