"""Orbax checkpointing with resume.

The reference is save-only — pickled module objects + per-iteration
state-dict snapshots, optimizer state never saved, no resume path
(/root/reference/src/trainer.py:70-86, SURVEY.md §5.4). Here the full
:class:`GANState` (params, BN stats, optimizer state, step) round-trips
through Orbax; ``snapshot_interval`` semantics match the reference.
"""

from __future__ import annotations

import logging
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

    def _disk_has_ema(self, step: int) -> Optional[bool]:
        """Whether the on-disk checkpoint carries an EMA tree.

        Reads the checkpoint's structural metadata rather than parsing
        restore-error strings. Returns ``None`` when the metadata is
        unreadable (restore then proceeds without EMA-aware fallbacks)."""
        absl_logger = logging.getLogger("absl")
        prev_level = absl_logger.level
        try:
            # read from disk: the manager's item_metadata() only works for
            # steps it saved/restored itself in this process. The probe
            # reads an item directory, so orbax warns about the (absent,
            # irrelevant) checkpoint-level metadata file — silence it.
            absl_logger.setLevel(logging.ERROR)
            meta = ocp.StandardCheckpointer().metadata(
                self.directory / str(step) / "default"
            )
            tree = meta.item_metadata.tree
        except Exception:
            return None
        finally:
            absl_logger.setLevel(prev_level)
        if not isinstance(tree, dict) or "ema" not in tree:
            return False  # pre-ema layout: no such entry at all
        # a real EMA is a {"ggen": ..., "cgen": ...} dict; a disabled one
        # is a None placeholder (rendered as a leaf metadata entry when the
        # metadata is read back from disk)
        return isinstance(tree["ema"], dict)

    def _restore_without_ema(self, step: int, template: GANState) -> GANState:
        """Restore a checkpoint that carries no EMA tree.

        Handles both no-EMA disk layouts: the current one (explicit
        ``ema: None`` entry) and the pre-ema one (no entry at all)."""
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, template.replace(ema=None)
        )
        try:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        except ValueError as primary:
            legacy = {
                f: getattr(abstract, f)
                for f in ("step", "ggen", "cgen", "idis", "vdis", "gdis")
            }
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(legacy)
                )
            except ValueError:
                # not a layout difference (e.g. a genuine shape mismatch):
                # surface the original, informative error
                raise primary from None
            return GANState(ema=None, **restored)

    def restore(self, template: GANState, step: Optional[int] = None) -> GANState:
        """Restore into the structure/shardings of ``template``.

        EMA transitions are handled structurally (checkpoint metadata, not
        error-string matching):

        - template has EMA, checkpoint doesn't (EMA newly enabled on an
          existing run, or a pre-``ema``-field checkpoint): the live fields
          restore and the EMA is seeded at the restored generator params.
        - template has no EMA, checkpoint does (EMA disabled mid-run): the
          live fields restore and the stored average is dropped with a
          warning — the next save writes ``ema: None``.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if step not in self._mgr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint for step {step} under {self.directory}; "
                f"available steps: {sorted(self._mgr.all_steps())}"
            )
        want_ema = template.ema is not None
        disk_ema = self._disk_has_ema(step)
        if not want_ema:
            if disk_ema:
                # satisfy the on-disk structure with the ema's known shape
                # (it mirrors the generator params), then drop the average
                abstract = jax.tree.map(
                    ocp.utils.to_shape_dtype_struct,
                    template.replace(
                        ema={
                            "ggen": template.ggen.params,
                            "cgen": template.cgen.params,
                        }
                    ),
                )
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(abstract)
                )
                logging.getLogger(__name__).warning(
                    "checkpoint step %d carries an EMA tree but EMA is "
                    "disabled in the config; dropping the stored average",
                    step,
                )
                return restored.replace(ema=None)
            return self._restore_without_ema(step, template)
        if disk_ema is False:
            restored = self._restore_without_ema(step, template)
            return restored.replace(ema=template.ema).with_reseeded_ema()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.close()
