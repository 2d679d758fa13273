"""Training state pytrees.

The whole five-model GAN state is one pytree, so the entire training
iteration — both adversarial phases, all five optimizer updates — is a
single jitted, donatable state transition ``(state, batch, key) -> state``
(the reference runs two separate eager phases with five ``optimizer.step()``
calls — /root/reference/src/trainer.py:285-363).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class ModelState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class GANState(struct.PyTreeNode):
    """Five model states + the global step (1-based, like the reference's
    ``self.iteration``)."""

    step: jnp.ndarray
    ggen: ModelState
    cgen: ModelState
    idis: ModelState
    vdis: ModelState
    gdis: ModelState

    @property
    def models(self):
        return {
            "ggen": self.ggen,
            "cgen": self.cgen,
            "idis": self.idis,
            "vdis": self.vdis,
            "gdis": self.gdis,
        }
