"""SPMD device-mesh utilities (the reference has no distributed layer at
all — ``util.current_device()`` hardcodes one GPU,
/root/reference/src/util.py:16-28; SURVEY.md §2.5)."""

from dcvgan_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    batch_size_divisor,
    create_mesh,
    data_axes,
    multihost_init,
    replicate,
    shard_batch,
)
