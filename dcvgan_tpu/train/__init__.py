"""Training runtime: model bundle, state, jitted step, trainer loop."""

from dcvgan_tpu.train.state import GANState, ModelState  # noqa: F401
from dcvgan_tpu.train.step import DCVGAN  # noqa: F401
