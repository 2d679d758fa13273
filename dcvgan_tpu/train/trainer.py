"""Training runtime: the epoch/step loop around the jitted train step.

Reference: ``Trainer`` (/root/reference/src/trainer.py:23-392). Interval
semantics (log / log_samples / snapshot / evaluation) and the metric set
are preserved; the mechanics are TPU-native:

- one compiled step; losses stay on device and are fetched only at
  ``log_interval`` flushes, keeping dispatch asynchronous,
- batches stream through the prefetching host loader onto the mesh
  (``data``-axis sharded),
- checkpoints are Orbax (full state incl. optimizer + step) with resume —
  the reference is save-only,
- optional ``jax.profiler`` trace capture (the reference's only profiling
  artifact is ``nvidia-smi -l 3``, SURVEY.md §5.1).
"""

from __future__ import annotations

import signal
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

from dcvgan_tpu import prng
from dcvgan_tpu.config import ExperimentConfig, flatten_config, save_config
from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.data.loader import VideoLoader
from dcvgan_tpu.eval.sampler import generate_samples
from dcvgan_tpu.logging.logger import Logger, MetricType
from dcvgan_tpu.parallel.mesh import (
    batch_size_divisor,
    create_mesh,
    replicate,
    shard_batch,
)
from dcvgan_tpu.train.checkpoint import CheckpointManager
from dcvgan_tpu.train.state import GANState
from dcvgan_tpu.train.step import DCVGAN
from dcvgan_tpu.utils.video_np import (
    ensure_float_video,
    geometric_info_in_color_format,
    make_video_grid,
    videos_to_uint8,
)


class Trainer:
    NUM_LOG, ROWS_LOG, COLS_LOG = 25, 5, 5  # 5×5 TB sample grids (reference :42)

    def __init__(
        self,
        config: ExperimentConfig,
        dataset: VideoDataset,
        logger: Optional[Logger] = None,
        evaluator=None,
    ):
        self.config = config
        self.dataset = dataset
        self.geometric_info = config.geometric_info.name

        run_dir = Path(config.log_dir) / config.experiment_name
        tb_dir = Path(config.tensorboard_dir) / config.experiment_name
        self.run_dir = run_dir
        self.logger = logger or Logger(run_dir, tb_dir)

        # provenance copy of the config (reference :64)
        run_dir.mkdir(parents=True, exist_ok=True)
        save_config(config, run_dir / "config.yml")

        if config.trainer.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.mesh = create_mesh(config)
        self.gan = DCVGAN(config)
        self.loader = VideoLoader(
            dataset,
            batchsize=config.batchsize,
            n_workers=config.dataset.n_workers,
            seed=config.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            shard_divisor=batch_size_divisor(self.mesh),
        )
        self.ckpt = CheckpointManager(run_dir / "models")
        self.evaluator = evaluator
        if evaluator is not None and batch_size_divisor(self.mesh) > 1:
            # Protocol-scale eval (3k-10k samples) scales with the mesh's
            # batch-parallel size instead of running replicated per chip.
            # An eval batch that doesn't split stays on the (correct,
            # replicated) single-program path.
            try:
                evaluator.set_mesh(self.mesh)
            except ValueError as e:
                self.logger.info(f"eval stays unsharded: {e}")
        self.base_key = prng.base_key(config.seed)

        # init or resume
        state = self.gan.init_state(self.base_key)
        state = replicate(state, self.mesh)
        if config.trainer.resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            self.logger.info(
                f"resumed from checkpoint at step {int(state.step)}"
            )
        self.state: GANState = state
        self.epoch = int(self.state.step) // max(1, len(self.loader))
        # a mid-epoch checkpoint resumes INSIDE its epoch: the first
        # iterator after resume skips the already-trained batches (the
        # per-(seed, epoch, batch) shuffle/crop RNG makes the remaining
        # batches identical to the uninterrupted run's)
        self._resume_skip = int(self.state.step) % max(1, len(self.loader))

    # ------------------------------------------------------------------ logs
    def log_hparams(self) -> None:
        self.logger.tf_log_hparams(flatten_config(self.config))

    def _log_geo_histograms(self, x: np.ndarray, tag: str, step: int) -> None:
        """Channel-0 histogram under the reference tag
        (/root/reference/src/trainer.py:134-135,160-161) plus per-channel
        tags when the rendered geometry has multiple channels (e.g. the
        HSV-wheel flow rendering)."""
        self.logger.tf_log_histogram(x[..., 0], tag, step)
        # channel 0 already lives under the base tag; only the extra
        # channels get per-channel tags
        for c in range(1, x.shape[-1]):
            self.logger.tf_log_histogram(x[..., c], f"{tag}/ch{c}", step)

    @property
    def eval_state(self) -> GANState:
        """The state sampling/eval should read: the EMA generators when
        ``trainer.ema_decay > 0`` and ``trainer.ema_eval`` (identity
        otherwise)."""
        if self.config.trainer.ema_eval:
            return self.state.with_ema_params()
        return self.state

    def log_samples(self, iteration: int) -> None:
        """5×5 grid of geometry|color sample videos + histograms to TB
        (reference log_samples, /root/reference/src/trainer.py:109-169)."""
        key = prng.named(prng.for_step(self.base_key, iteration), "sample")
        xg, xc = generate_samples(
            self.gan, self.eval_state, key, self.NUM_LOG, self.NUM_LOG
        )
        self._log_geo_histograms(xg, "geospace_fake", iteration)
        self.logger.tf_log_histogram(xc[..., 0], "colorspace_fake", iteration)
        grid_g = make_video_grid(xg, self.ROWS_LOG, self.COLS_LOG)
        grid_c = make_video_grid(xc, self.ROWS_LOG, self.COLS_LOG)
        fake = np.concatenate([grid_g, grid_c], axis=3)  # side by side on W
        self.logger.tf_log_video(fake, "fake_samples", iteration)

        # real batch for comparison (dedicated epoch id outside the training
        # sequence so the shuffle is independent but the seed stays valid)
        real = self.loader.fetch_batch(
            epoch=2**31 + iteration, limit=self.NUM_LOG
        )
        n = min(self.NUM_LOG, real["color"].shape[0])
        rows = cols = int(np.sqrt(n))
        if rows * cols >= 1:
            xc_real = videos_to_uint8(real["color"][: rows * cols])
            xg_raw = real[self.geometric_info][: rows * cols]
            if self.geometric_info == "segmentation" and xg_raw.dtype == np.uint8:
                # raw class labels (device-normalize ingest path) -> one-hot
                # for the palette renderer
                from dcvgan_tpu import native
                from dcvgan_tpu.data.dataset import NUM_SEGM_PARTS

                xg_raw = native.one_hot(xg_raw[..., 0], NUM_SEGM_PARTS)
            xg_real = geometric_info_in_color_format(
                ensure_float_video(xg_raw),
                self.geometric_info,
            )
            self._log_geo_histograms(xg_real, "geospace_real", iteration)
            self.logger.tf_log_histogram(xc_real[..., 0], "colorspace_real", iteration)
            grid = np.concatenate(
                [
                    make_video_grid(xg_real, rows, cols),
                    make_video_grid(xc_real, rows, cols),
                ],
                axis=3,
            )
            self.logger.tf_log_video(grid, "real_samples", iteration)

    def evaluate(self, iteration: int) -> None:
        """Quantitative GAN metrics (reference evaluate,
        /root/reference/src/trainer.py:171-224); delegated to the injected
        evaluator (see dcvgan_tpu.eval)."""
        if self.evaluator is None or not self.config.evaluation.metrics:
            return
        if not getattr(self, "_eval_fingerprint_logged", False):
            self.logger.debug(
                f"eval extractor: {self.evaluator.extractor.fingerprint}"
            )
            self._eval_fingerprint_logged = True
        key = prng.named(prng.for_step(self.base_key, iteration), "eval")
        scores = self.evaluator.evaluate(self.gan, self.eval_state, key)
        for name, score in scores.items():
            if name not in self.logger.metrics:
                # evaluators may emit derived metrics (e.g. prd_f1_8)
                self.logger.define(name, MetricType.Float)
            self.logger.update(name, float(score))

    # ------------------------------------------------------------------ loop
    def train(self) -> GANState:
        cfg = self.config
        logger = self.logger

        # Preemption safety: TPU VMs get SIGTERM on maintenance/preemption.
        # Trap it (and SIGINT) into a flag checked once per step so train()
        # exits through the final force-checkpoint below instead of dying
        # mid-dispatch; resume then continues from the trapped step.
        # Installed first so even the initial sample/eval compiles are
        # covered.
        self._stop = threading.Event()
        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(
                    sig, lambda *_: self._stop.set()
                )
        try:
            return self._train_loop(cfg, logger)
        finally:
            # restored only AFTER the final forced checkpoint: repeated
            # SIGTERMs during the save must not kill the very write the
            # trap exists to protect
            for sig, handler in prev_handlers.items():
                signal.signal(sig, handler)

    def _train_loop(self, cfg, logger) -> GANState:
        logger.define("loss_gen", MetricType.Loss)
        logger.define("loss_idis", MetricType.Loss)
        logger.define("loss_vdis", MetricType.Loss)
        logger.define("loss_gdis", MetricType.Loss)
        logger.define("iters_per_sec", MetricType.Float, priority=-2)
        for m in cfg.evaluation.metrics:
            logger.define(m, MetricType.Float)

        self.log_hparams()
        logger.debug("(trainer)")
        logger.debug(f"epochs: {cfg.n_epochs}", 1)
        logger.debug(f"devices: {jax.device_count()} ({jax.devices()[0].platform})", 1)
        logger.debug(f"mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}", 1)
        logger.debug("(start training)")

        if int(self.state.step) == 0:
            self.log_samples(0)
            self.evaluate(0)
        logger.print_header()

        if cfg.trainer.profile:
            jax.profiler.start_trace(str(self.run_dir / "profile"))

        # BN-semantics switch (SURVEY.md §2.5): global-batch statistics under
        # plain jit (sync BN, default) vs per-replica statistics via
        # shard_map. mesh.time > 1 time-shards the 3D critics.
        if cfg.mesh.time > 1:
            step_fn = self.gan.time_sharded_train_step(self.mesh)
        elif cfg.trainer.sync_batchnorm:
            step_fn = self.gan.jitted_train_step
        else:
            step_fn = self.gan.sharded_train_step(self.mesh)
        pending: List[Dict[str, jax.Array]] = []
        t_last_flush = time.time()
        iters_since_flush = 0
        # host-side iteration mirror: fetching state.step each iteration
        # would force a device sync per step and serialize dispatch
        iteration = int(self.state.step)

        try:
            for _ in range(self.epoch, cfg.n_epochs):
                if self._stop.is_set():
                    break
                self.epoch += 1
                skip, self._resume_skip = self._resume_skip, 0
                for batch in self.loader.epoch_iterator(
                    epoch=self.epoch - 1, start_batch=skip
                ):
                    if self._stop.is_set():
                        break
                    device_batch = shard_batch(batch, self.mesh)
                    self.state, metrics = step_fn(
                        self.state, device_batch, self.base_key
                    )
                    pending.append(metrics)
                    iters_since_flush += 1
                    iteration += 1

                    # dispatch backpressure: wait for the step enqueued
                    # max_inflight_steps ago so host-side buffers of
                    # in-flight batches stay bounded (see config docstring).
                    # A scalar FETCH, not block_until_ready (which this
                    # environment's tunneled backend can return from before
                    # execution finishes — bench.py's timing note), amortized
                    # to one round-trip every k/2 steps.
                    k = cfg.trainer.max_inflight_steps
                    if (
                        k
                        and len(pending) >= k
                        and iters_since_flush % max(1, k // 2) == 0
                    ):
                        float(pending[-k]["loss_gen"])

                    if iteration % cfg.snapshot_interval == 0:
                        self.ckpt.save(self.state)
                    if iteration % cfg.log_samples_interval == 0:
                        self.log_samples(iteration)
                    if iteration % cfg.evaluation_interval == 0:
                        self.evaluate(iteration)
                    if iteration % cfg.log_interval == 0:
                        # single host sync for the whole window
                        host_metrics = jax.device_get(pending)
                        pending = []
                        for m in host_metrics:
                            for k, v in m.items():
                                logger.update(k, float(v))
                        now = time.time()
                        logger.update(
                            "iters_per_sec",
                            iters_since_flush / max(1e-9, now - t_last_flush),
                        )
                        t_last_flush, iters_since_flush = now, 0
                        logger.update("iteration", iteration)
                        logger.update("epoch", self.epoch)
                        logger.log()
                        logger.clear()
        finally:
            if cfg.trainer.profile:
                jax.profiler.stop_trace()

        if self._stop.is_set():
            logger.info(
                f"interrupted (preemption/SIGTERM) at iteration {iteration}; "
                "saving checkpoint for resume"
            )
        # final snapshot + samples (reference :391-392)
        self.ckpt.save(self.state, force=True)
        self.ckpt.wait()
        if not self._stop.is_set():
            self.log_samples(int(self.state.step))
        return self.state
