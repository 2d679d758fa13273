"""Loss unit tests with golden values computed by torch's own ops —
something the reference never had (its losses are untested, SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from dcvgan_tpu.losses import (
    adversarial_dis_loss,
    adversarial_gen_loss,
    get_loss,
    hinge_dis_loss,
    hinge_gen_loss,
)


def rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


Y_REAL = rand((4, 4, 4), 0)
Y_FAKE = rand((4, 4, 4), 1)
Y_I, Y_V, Y_G = rand((4, 4, 4), 2), rand((4, 4, 4, 4), 3), rand((4, 3, 4, 4), 4)


def torch_bce_mean(y, target_val):
    # the reference divides a sum-reduced BCE by numel == mean
    # (/root/reference/src/loss.py:71,93-98)
    loss = tnn.BCEWithLogitsLoss(reduction="sum")
    t = torch.from_numpy(y)
    target = torch.full_like(t, target_val)
    return (loss(t, target) / t.numel()).item()


def test_adversarial_dis_matches_torch():
    expected = torch_bce_mean(Y_REAL, 1.0) + torch_bce_mean(Y_FAKE, 0.0)
    got = float(adversarial_dis_loss(jnp.asarray(Y_REAL), jnp.asarray(Y_FAKE)))
    assert got == pytest.approx(expected, rel=1e-6)


def test_adversarial_gen_matches_torch():
    expected = sum(torch_bce_mean(y, 1.0) for y in (Y_I, Y_V, Y_G))
    got = float(
        adversarial_gen_loss(jnp.asarray(Y_I), jnp.asarray(Y_V), jnp.asarray(Y_G))
    )
    assert got == pytest.approx(expected, rel=1e-6)


def test_hinge_dis_matches_torch():
    tr, tf = torch.from_numpy(Y_REAL), torch.from_numpy(Y_FAKE)
    expected = (
        torch.relu(1.0 - tr).mean() + torch.relu(1.0 + tf).mean()
    ).item()
    got = float(hinge_dis_loss(jnp.asarray(Y_REAL), jnp.asarray(Y_FAKE)))
    assert got == pytest.approx(expected, rel=1e-6)


def test_hinge_gen_matches_torch_and_omits_gdis():
    ti, tv = torch.from_numpy(Y_I), torch.from_numpy(Y_V)
    expected = (
        tnn.functional.softplus(-ti).mean() + tnn.functional.softplus(-tv).mean()
    ).item()
    got = float(hinge_gen_loss(jnp.asarray(Y_I), jnp.asarray(Y_V), jnp.asarray(Y_G)))
    assert got == pytest.approx(expected, rel=1e-6)
    # gdis term intentionally ignored (/root/reference/src/loss.py:190-193)
    got2 = float(
        hinge_gen_loss(jnp.asarray(Y_I), jnp.asarray(Y_V), jnp.asarray(Y_G * 100))
    )
    assert got2 == got


def test_registry():
    assert get_loss("adversarial-loss").dis is adversarial_dis_loss
    assert get_loss("hinge-loss").gen is hinge_gen_loss
    with pytest.raises(KeyError):
        get_loss("wasserstein")


def test_bf16_logits_computed_in_f32():
    y = jnp.asarray(Y_REAL, jnp.bfloat16)
    out = adversarial_dis_loss(y, y)
    assert out.dtype == jnp.float32
