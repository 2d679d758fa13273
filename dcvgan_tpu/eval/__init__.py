"""Evaluation: batched sampling, video metrics (IS / FID / PRD)."""

from dcvgan_tpu.eval.sampler import generate_samples  # noqa: F401
