"""Deterministic PRNG key discipline.

The reference draws from torch's implicit global RNG in six places per
training iteration (content/motion/GRU-init latents, color latent, and the
discriminators' Noise layers — /root/reference/src/generator.py:85,88,104,356
and /root/reference/src/discriminator.py:35-37), which is irreproducible
across process layouts. Here every random draw flows from one base key via
``fold_in(step)`` and *named* splits, so a training step is a pure function
of ``(params, batch, step)`` — deterministic per (step, replica), recompiles
never depend on RNG, and multi-host runs derive per-host keys explicitly.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

# Stable string->int tags so named folds never collide and never depend on
# call order (hash() is process-salted; this table is the fixed contract).
_NAMED_TAGS = {
    "ggen_content": 1,
    "ggen_motion": 2,
    "ggen_init": 3,
    "cgen_color": 4,
    "cgen_dropout": 5,
    "idis_noise": 6,
    "vdis_noise": 7,
    "gdis_noise": 8,
    "t_rand": 9,
    "d_fake": 10,
    "g_fake": 11,
    "params_init": 12,
    "eval": 13,
    "host": 14,
    "sample": 15,
    "joint": 16,  # critic_joint_batch: one noise stream for [real; fake]
    "serve-microbatch": 17,  # serving: server-owned coalesced-request stream
}


def base_key(seed: int) -> jax.Array:
    """The experiment's root key (reference seeds everything from
    ``configs['seed']``, /root/reference/src/train.py:31-45)."""
    return jax.random.key(seed)


def for_step(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the per-iteration key: pure in ``step``, no threading needed."""
    return jax.random.fold_in(key, step)


def for_host(key: jax.Array, process_index: int) -> jax.Array:
    """Per-host key for host-side data pipelines (multi-host training)."""
    return jax.random.fold_in(jax.random.fold_in(key, _NAMED_TAGS["host"]), process_index)


def named(key: jax.Array, name: str) -> jax.Array:
    """Split off a stably-named subkey."""
    return jax.random.fold_in(key, _NAMED_TAGS[name])


def named_keys(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Split one key into a dict of stably-named subkeys."""
    return {n: named(key, n) for n in names}


def normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard-normal draw (the reference's ``torch.empty(...).normal_()``)."""
    return jax.random.normal(key, shape, dtype)
