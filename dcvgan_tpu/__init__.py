"""dcvgan-tpu: a TPU-native (JAX/XLA/Pallas) video-generation framework.

A ground-up rebuild of the capabilities of raahii/dcvgan (DCVGAN, ICIP 2019):
two-stage conditional video GAN — a recurrent-latent geometric generator
(depth / optical-flow / segmentation) followed by a per-frame colorization
U-Net — trained against image, video, and temporal-gradient discriminators.

Unlike the single-GPU PyTorch reference this package is designed TPU-first:

- channels-last ``(B, T, H, W, C)`` tensors everywhere on device,
- pure-functional flax models with explicit PRNG threading,
- one jitted train step containing all five model updates,
- ``jax.sharding.Mesh`` data parallelism with XLA collectives over ICI,
- Orbax checkpointing with real resume (the reference is save-only),
- device-resident evaluation metrics.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
