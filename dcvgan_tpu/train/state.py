"""Training state pytrees.

The whole five-model GAN state is one pytree, so the entire training
iteration — both adversarial phases, all five optimizer updates — is a
single jitted, donatable state transition ``(state, batch, key) -> state``
(the reference runs two separate eager phases with five ``optimizer.step()``
calls — /root/reference/src/trainer.py:285-363).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class ModelState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class GANState(struct.PyTreeNode):
    """Five model states + the global step (1-based, like the reference's
    ``self.iteration``).

    ``ema`` is ``None`` unless ``trainer.ema_decay > 0``: then it holds
    ``{"ggen": params, "cgen": params}`` — an exponential moving average of
    the generator parameters, updated on every generator optimizer step
    (beyond the reference, which keeps no parameter averages). Checkpoints
    written before this field existed restore through a legacy-structure
    fallback in :class:`~dcvgan_tpu.train.checkpoint.CheckpointManager`."""

    step: jnp.ndarray
    ggen: ModelState
    cgen: ModelState
    idis: ModelState
    vdis: ModelState
    gdis: ModelState
    ema: Any = None

    @property
    def models(self):
        return {
            "ggen": self.ggen,
            "cgen": self.cgen,
            "idis": self.idis,
            "vdis": self.vdis,
            "gdis": self.gdis,
        }

    def with_reseeded_ema(self) -> "GANState":
        """The state with its EMA re-seeded at the CURRENT generator params
        (identity when EMA is disabled). Use after replacing generator
        parameters wholesale (torch import, enabling EMA on a resumed run)
        so the average tracks the new weights instead of stale/random ones."""
        if self.ema is None:
            return self
        return self.replace(
            ema={
                "ggen": jax.tree.map(jnp.copy, self.ggen.params),
                "cgen": jax.tree.map(jnp.copy, self.cgen.params),
            }
        )

    def with_ema_params(self) -> "GANState":
        """The state with generator params swapped for their EMA (identity
        when EMA is disabled). BN running statistics stay the live models' —
        they are already exponential averages. The returned state drops the
        ``ema`` field so sampling/eval see one canonical structure."""
        if self.ema is None:
            return self
        return self.replace(
            ggen=self.ggen.replace(params=self.ema["ggen"]),
            cgen=self.cgen.replace(params=self.ema["cgen"]),
            ema=None,
        )
