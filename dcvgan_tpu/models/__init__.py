"""Pure-functional flax models: two generators, three discriminators.

All models are channels-last ``(B, T, H, W, C)`` (TPU-native layout; the
reference's ``(B, C, T, H, W)`` exists only at numpy/logging boundaries) and
take explicit ``train`` flags + named PRNG streams instead of module state.
"""

from dcvgan_tpu.models.cgen import ColorVideoGenerator  # noqa: F401
from dcvgan_tpu.models.discriminators import (  # noqa: F401
    GradientDiscriminator,
    ImageDiscriminator,
    VideoDiscriminator,
)
from dcvgan_tpu.models.ggen import GeometricVideoGenerator  # noqa: F401
