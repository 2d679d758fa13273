"""Orbax checkpointing with resume.

The reference is save-only — pickled module objects + per-iteration
state-dict snapshots, optimizer state never saved, no resume path
(/root/reference/src/trainer.py:70-86, SURVEY.md §5.4). Here the full
:class:`GANState` (params, BN stats, optimizer state, step) round-trips
through Orbax; ``snapshot_interval`` semantics match the reference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax
import orbax.checkpoint as ocp

from dcvgan_tpu.train.state import GANState


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager for GANState."""

    def __init__(self, directory: Union[str, Path], max_to_keep: Optional[int] = None):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: GANState, force: bool = False) -> None:
        step = int(state.step)
        if step in self._mgr.all_steps():
            return  # idempotent per step (interval + final save can collide)
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: GANState, step: Optional[int] = None) -> GANState:
        """Restore into the structure/shardings of ``template``.

        Checkpoints written before :class:`GANState` grew the ``ema`` field
        have no ``ema`` entry in their on-disk structure; when the template's
        ``ema`` is ``None`` (EMA disabled) such checkpoints restore through a
        legacy-structure fallback. A checkpoint that *does* carry an EMA tree
        cannot be restored into an EMA-disabled template — reload with the
        run's own config (its ``trainer.ema_decay``) instead."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if step not in self._mgr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint for step {step} under {self.directory}; "
                f"available steps: {sorted(self._mgr.all_steps())}"
            )
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        except ValueError as e:
            if "ema" not in str(e) or template.ema is not None:
                raise
            # pre-ema checkpoint: restore the legacy field set and rewrap
            legacy = {
                f: getattr(abstract, f)
                for f in ("step", "ggen", "cgen", "idis", "vdis", "gdis")
            }
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(legacy)
            )
            return GANState(ema=None, **restored)

    def close(self) -> None:
        self._mgr.close()
