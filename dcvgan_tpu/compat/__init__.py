"""Compatibility bridges to the PyTorch reference implementation."""

from dcvgan_tpu.compat.torch_import import (  # noqa: F401
    cgen_from_torch,
    gdis_from_torch,
    ggen_from_torch,
    idis_from_torch,
    load_reference_state_dicts,
    vdis_from_torch,
)
