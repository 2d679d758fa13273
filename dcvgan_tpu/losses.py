"""GAN objectives, as pure functions.

Reference: /root/reference/src/loss.py. Both flavors:

- ``adversarial``: BCE-with-logits against ones/zeros; the reference uses
  ``reduction="sum"`` divided by numel == mean
  (/root/reference/src/loss.py:71,93-98). Identities used here:
  BCEWithLogits(x, 1) = softplus(-x), BCEWithLogits(x, 0) = softplus(x).
- ``hinge``: D: mean(relu(1 - y_real)) + mean(relu(1 + y_fake)); G:
  mean(softplus(-y_i)) + mean(softplus(-y_v)) — the reference's generator
  hinge term **omits gdis** (/root/reference/src/loss.py:190-193); that
  observable behavior is reproduced, not "fixed".

Losses are computed in float32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp


def _f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def bce_logits_real(y: jax.Array) -> jax.Array:
    """mean BCEWithLogits(y, ones)."""
    return jnp.mean(jax.nn.softplus(-_f32(y)))


def bce_logits_fake(y: jax.Array) -> jax.Array:
    """mean BCEWithLogits(y, zeros)."""
    return jnp.mean(jax.nn.softplus(_f32(y)))


def adversarial_dis_loss(y_real: jax.Array, y_fake: jax.Array) -> jax.Array:
    """Reference AdversarialLoss.compute_dis_loss (/root/reference/src/loss.py:74-99)."""
    return bce_logits_real(y_real) + bce_logits_fake(y_fake)


def adversarial_gen_loss(
    y_fake_i: jax.Array, y_fake_v: jax.Array, y_fake_g: jax.Array
) -> jax.Array:
    """Reference AdversarialLoss.compute_gen_loss (/root/reference/src/loss.py:101-131)."""
    return (
        bce_logits_real(y_fake_i)
        + bce_logits_real(y_fake_v)
        + bce_logits_real(y_fake_g)
    )


def hinge_dis_loss(y_real: jax.Array, y_fake: jax.Array) -> jax.Array:
    """Reference HingeLoss.compute_dis_loss (/root/reference/src/loss.py:144-166)."""
    return jnp.mean(jax.nn.relu(1.0 - _f32(y_real))) + jnp.mean(
        jax.nn.relu(1.0 + _f32(y_fake))
    )


def hinge_gen_loss(
    y_fake_i: jax.Array, y_fake_v: jax.Array, y_fake_g: jax.Array
) -> jax.Array:
    """Reference HingeLoss.compute_gen_loss (/root/reference/src/loss.py:168-193).

    Note: y_fake_g is intentionally unused (reference quirk, documented above).
    """
    del y_fake_g
    return jnp.mean(jax.nn.softplus(-_f32(y_fake_i))) + jnp.mean(
        jax.nn.softplus(-_f32(y_fake_v))
    )


class LossPair(NamedTuple):
    dis: Callable[[jax.Array, jax.Array], jax.Array]
    gen: Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


LOSS_REGISTRY: Dict[str, LossPair] = {
    "adversarial-loss": LossPair(adversarial_dis_loss, adversarial_gen_loss),
    "hinge-loss": LossPair(hinge_dis_loss, hinge_gen_loss),
}


def get_loss(name: str) -> LossPair:
    """Loss lookup by config name (reference dispatch:
    /root/reference/src/train.py:81-89)."""
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss {name!r}; have {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
