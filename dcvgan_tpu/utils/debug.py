"""Debug aids.

Reference: ``DebugLayer`` (/root/reference/src/util.py:173-183), an identity
``nn.Module`` that prints its input's shape — dropped into a Sequential to
localize shape bugs. The JAX analogue differs because tracing: shapes are
known at *trace* time (printed once per compile, not per step), while value
statistics need ``jax.debug.print`` to surface at runtime from inside jit.
"""

from __future__ import annotations

import jax
from flax import linen as nn


class ShapeProbe(nn.Module):
    """Identity layer that reports activation shape/dtype at trace time,
    and per-call value statistics at runtime when ``stats=True``.

    Usage: insert into any module body, e.g.
    ``x = ShapeProbe(tag="after-down3")(x)``; remove when done (costs one
    print per compile, and with ``stats`` a device->host sync per call).
    """

    tag: str = ""
    stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        label = f"shape-probe{':' + self.tag if self.tag else ''}"
        print(f"[{label}] {x.shape} {x.dtype}")
        if self.stats:
            jax.debug.print(
                "[" + label + "] mean={m:.4f} std={s:.4f} min={lo:.4f} max={hi:.4f}",
                m=x.mean(),
                s=x.std(),
                lo=x.min(),
                hi=x.max(),
            )
        return x
