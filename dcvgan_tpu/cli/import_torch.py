"""Convert a reference (PyTorch) training run into a dcvgan-tpu run dir.

Bridges users off the reference: takes the reference's
``<result_dir>/models/<name>_params_<iter:05d>.pth`` snapshots
(/root/reference/src/trainer.py:78-86) plus a migrated config, writes an
Orbax checkpoint our ``cli.infer`` / trainer-resume consume directly::

    python -m dcvgan_tpu.cli.import_torch <torch_models_dir> <iteration> \
        --config configs/mug-depth.yml --out result/imported-run

Weight mapping parity is exact (see dcvgan_tpu/compat/torch_import.py and
tests/test_torch_parity.py).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence

import jax

from dcvgan_tpu import prng
from dcvgan_tpu.config import load_config, save_config
from dcvgan_tpu.compat.torch_import import load_reference_state_dicts
from dcvgan_tpu.train.checkpoint import CheckpointManager
from dcvgan_tpu.train.step import DCVGAN


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("torch_models_dir", type=Path)
    parser.add_argument("iteration", type=int)
    parser.add_argument("--config", "-c", required=True)
    parser.add_argument("--out", "-o", type=Path, required=True)
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(cfg.seed))

    converted = load_reference_state_dicts(args.torch_models_dir, args.iteration)
    if not converted:
        raise FileNotFoundError(
            f"no <name>_params_{args.iteration:05d}.pth files in "
            f"{args.torch_models_dir}"
        )

    for name, (params, stats) in converted.items():
        ms = getattr(state, name)
        # structural check: imported tree must match the built model
        ref_struct = jax.tree.structure(ms.params)
        got_struct = jax.tree.structure(
            jax.tree.map(lambda x: x, params)
        )
        if ref_struct != got_struct:
            raise ValueError(
                f"{name}: imported parameter tree does not match the model "
                f"built from {args.config} — check ngf/dim_z settings.\n"
                f"model: {ref_struct}\nimported: {got_struct}"
            )
        new_ms = ms.replace(params=params, batch_stats=stats or ms.batch_stats)
        state = state.replace(**{name: new_ms})
    state = state.replace(step=jax.numpy.asarray(args.iteration, jax.numpy.int32))
    # the EMA (if the config enables one) was seeded at the random init
    # params — re-seed it at the imported weights so default-EMA readers
    # (cli.infer, cli.serve) sample the imported generators
    state = state.with_reseeded_ema()

    args.out.mkdir(parents=True, exist_ok=True)
    save_config(cfg, args.out / "config.yml")
    ckpt = CheckpointManager(args.out / "models")
    ckpt.save(state, force=True)
    ckpt.wait()
    print(
        f"imported {sorted(converted)} at iteration {args.iteration} "
        f"-> {args.out}"
    )


if __name__ == "__main__":
    main()
