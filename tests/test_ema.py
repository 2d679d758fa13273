"""Generator-EMA tests (trainer.ema_decay — beyond the reference).

Covers: EMA state init, the per-step update math, gating (EMA frozen on
iterations where the generators don't step), with_ema_params substitution,
and checkpoint roundtrip of the EMA tree.
"""

import jax
import numpy as np
import pytest

from dcvgan_tpu import prng
from dcvgan_tpu.config import ConfigError
from dcvgan_tpu.train.checkpoint import CheckpointManager
from dcvgan_tpu.train.step import DCVGAN

from tests.test_train_step import fake_batch, tiny_config

DECAY = 0.5  # large steps make the average visibly move in few iterations


def ema_config(**over):
    trainer = {"precision": "float32", "donate_state": False,
               "ema_decay": DECAY}
    trainer.update(over.pop("trainer", {}))
    return tiny_config(trainer=trainer, **over)


@pytest.fixture(scope="module")
def gan():
    return DCVGAN(ema_config())


@pytest.fixture(scope="module")
def state0(gan):
    return gan.init_state(prng.base_key(0))


def _leaves_allclose(a, b, atol=1e-6):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_init_seeds_ema_at_params(gan, state0):
    assert state0.ema is not None
    _leaves_allclose(state0.ema["ggen"], state0.ggen.params)
    _leaves_allclose(state0.ema["cgen"], state0.cgen.params)


def test_disabled_by_default():
    gan = DCVGAN(tiny_config())
    state = gan.init_state(prng.base_key(0))
    assert state.ema is None
    # and with_ema_params is the identity
    assert state.with_ema_params() is state


def test_update_math(gan, state0):
    """After each step, ema == d*ema_prev + (1-d)*params_new, leafwise."""
    state = state0
    key = prng.base_key(7)
    expected = {"ggen": state.ema["ggen"], "cgen": state.ema["cgen"]}
    for i in range(2):
        state, _ = gan.jitted_train_step(state, fake_batch(seed=i), key)
        expected = jax.tree.map(
            lambda e, p: e * DECAY + p * (1 - DECAY),
            expected,
            {"ggen": state.ggen.params, "cgen": state.cgen.params},
        )
        _leaves_allclose(state.ema["ggen"], expected["ggen"], atol=1e-5)
        _leaves_allclose(state.ema["cgen"], expected["cgen"], atol=1e-5)
    # and the average genuinely lags the live params after an update
    diffs = jax.tree.map(
        lambda e, p: float(np.max(np.abs(np.asarray(e - p)))),
        state.ema["ggen"], state.ggen.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_gating_freezes_ema():
    """num_dis_update=2: generators step on even iterations only
    (reference inverted-name gating); EMA must be bit-frozen on odd ones."""
    gan = DCVGAN(ema_config(num_dis_update=2))
    state = gan.init_state(prng.base_key(0))
    key = prng.base_key(3)
    # step 1: 1 % 2 != 0 -> no G update -> EMA untouched
    state1, _ = gan.jitted_train_step(state, fake_batch(seed=0), key)
    _leaves_allclose(state1.ema, state.ema, atol=0)
    _leaves_allclose(state1.ggen.params, state.ggen.params, atol=0)
    # step 2: G updates -> EMA moves
    state2, _ = gan.jitted_train_step(state1, fake_batch(seed=1), key)
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a - b)))),
        state2.ema, state1.ema,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_ema_is_a_pure_observer():
    """Enabling EMA must not change the live training trajectory: the same
    (state, batch, key) sequence yields bitwise-identical live params with
    ema_decay on vs off. (Across *executables* — e.g. the same run
    recompiled on the chip with the EMA ops fused in — only statistical
    equality holds; GAN training chaos amplifies reduction-order noise,
    measured in HEADTOHEAD.md's EMA section.)"""
    gan_off = DCVGAN(tiny_config())
    gan_on = DCVGAN(ema_config(trainer={"ema_decay": 0.99}))
    s_off = gan_off.init_state(prng.base_key(0))
    s_on = gan_on.init_state(prng.base_key(0))
    key = prng.base_key(5)
    for i in range(3):
        batch = fake_batch(seed=i)
        s_off, _ = gan_off.jitted_train_step(s_off, batch, key)
        s_on, _ = gan_on.jitted_train_step(s_on, batch, key)
    for field in ("ggen", "cgen", "idis", "vdis", "gdis"):
        m_off, m_on = getattr(s_off, field), getattr(s_on, field)
        _leaves_allclose(m_on.params, m_off.params, atol=0)
        _leaves_allclose(m_on.batch_stats, m_off.batch_stats, atol=0)


def test_with_ema_params_substitution(gan, state0):
    key = prng.base_key(11)
    state, _ = gan.jitted_train_step(state0, fake_batch(seed=4), key)
    swapped = state.with_ema_params()
    assert swapped.ema is None
    _leaves_allclose(swapped.ggen.params, state.ema["ggen"])
    _leaves_allclose(swapped.cgen.params, state.ema["cgen"])
    # critics + BN stats + opt state untouched
    _leaves_allclose(swapped.idis.params, state.idis.params, atol=0)
    _leaves_allclose(swapped.ggen.batch_stats, state.ggen.batch_stats, atol=0)
    assert int(swapped.step) == int(state.step)


def test_checkpoint_roundtrip_with_ema(gan, state0, tmp_path):
    mgr = CheckpointManager(tmp_path / "models")
    state = state0.replace(step=state0.step + 1)
    mgr.save(state)
    mgr.wait()
    template = gan.init_state(prng.base_key(0))
    restored = mgr.restore(template, 1)
    _leaves_allclose(restored.ema, state.ema, atol=0)
    mgr.close()


def test_legacy_checkpoint_restores_without_ema(tmp_path):
    """Checkpoints written before GANState grew the ``ema`` field (no
    ``ema`` entry on disk) must keep restoring into EMA-disabled states.
    The legacy layout is reproduced by saving the pre-ema field set."""
    import orbax.checkpoint as ocp

    gan = DCVGAN(tiny_config())
    state = gan.init_state(prng.base_key(0)).replace(step=jax.numpy.int32(5))
    legacy = {
        f: getattr(state, f)
        for f in ("step", "ggen", "cgen", "idis", "vdis", "gdis")
    }
    with ocp.CheckpointManager(
        tmp_path / "models", options=ocp.CheckpointManagerOptions(create=True)
    ) as mgr:
        mgr.save(5, args=ocp.args.StandardSave(legacy))
        mgr.wait_until_finished()

    template = gan.init_state(prng.base_key(0))
    assert template.ema is None
    restored = CheckpointManager(tmp_path / "models").restore(template, 5)
    assert restored.ema is None
    assert int(restored.step) == 5
    _leaves_allclose(restored.ggen.params, state.ggen.params, atol=0)


def test_enable_ema_on_existing_run_seeds_from_restored_params(tmp_path):
    """Turning trainer.ema_decay on for a run checkpointed without an EMA
    must resume (not crash) with the EMA seeded at the RESTORED generator
    params — both for new-style (explicit ema: None) and pre-ema-field
    (no entry) disk layouts."""
    import orbax.checkpoint as ocp

    gan_off = DCVGAN(tiny_config())
    state = gan_off.init_state(prng.base_key(1)).replace(step=jax.numpy.int32(3))

    # new-style layout: GANState with ema=None
    mgr = CheckpointManager(tmp_path / "new")
    mgr.save(state)
    mgr.wait()
    mgr.close()
    # pre-ema layout: the legacy field set, no ema entry at all
    legacy = {
        f: getattr(state, f)
        for f in ("step", "ggen", "cgen", "idis", "vdis", "gdis")
    }
    with ocp.CheckpointManager(
        tmp_path / "old", options=ocp.CheckpointManagerOptions(create=True)
    ) as omgr:
        omgr.save(3, args=ocp.args.StandardSave(legacy))
        omgr.wait_until_finished()

    gan_on = DCVGAN(ema_config())
    template = gan_on.init_state(prng.base_key(0))  # different init
    assert template.ema is not None
    for name in ("new", "old"):
        restored = CheckpointManager(tmp_path / name).restore(template, 3)
        assert restored.ema is not None
        assert int(restored.step) == 3
        _leaves_allclose(restored.ggen.params, state.ggen.params, atol=0)
        # seeded at the restored weights, not the template's random init
        _leaves_allclose(restored.ema["ggen"], state.ggen.params, atol=0)
        _leaves_allclose(restored.ema["cgen"], state.cgen.params, atol=0)


def test_disable_ema_drops_stored_average(gan, state0, tmp_path):
    """Turning EMA off for a run whose checkpoints carry one restores the
    live fields and drops the average (next save writes ema: None)."""
    mgr = CheckpointManager(tmp_path / "models")
    state, _ = gan.jitted_train_step(state0, fake_batch(seed=9),
                                     prng.base_key(9))
    mgr.save(state)
    mgr.wait()
    mgr.close()
    gan_off = DCVGAN(tiny_config())
    template = gan_off.init_state(prng.base_key(0))
    restored = CheckpointManager(tmp_path / "models").restore(
        template, int(state.step)
    )
    assert restored.ema is None
    _leaves_allclose(restored.ggen.params, state.ggen.params, atol=0)
    _leaves_allclose(restored.vdis.params, state.vdis.params, atol=0)


def test_with_reseeded_ema(gan, state0):
    """After a step the EMA lags the live params; re-seeding snaps it to
    them (the torch-import path relies on this). Identity when disabled."""
    state, _ = gan.jitted_train_step(state0, fake_batch(seed=2),
                                     prng.base_key(2))
    reseeded = state.with_reseeded_ema()
    _leaves_allclose(reseeded.ema["ggen"], state.ggen.params, atol=0)
    _leaves_allclose(reseeded.ema["cgen"], state.cgen.params, atol=0)
    off = DCVGAN(tiny_config()).init_state(prng.base_key(0))
    assert off.with_reseeded_ema() is off


def test_ema_decay_validation():
    with pytest.raises(ConfigError):
        ema_config(trainer={"ema_decay": 1.0})
    with pytest.raises(ConfigError):
        ema_config(trainer={"ema_decay": -0.1})
