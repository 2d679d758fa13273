"""End-to-end slice: train on the mock dataset, checkpoint, resume, infer.

This is SURVEY.md §7 step 6 — the minimum end-to-end milestone — plus the
resume path the reference never had.
"""

from pathlib import Path

import numpy as np
import pytest

from dcvgan_tpu.config import ExperimentConfig
from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.train.trainer import Trainer


def e2e_config(tmp_path: Path, mock_root: Path, n_epochs=1) -> ExperimentConfig:
    cfg = ExperimentConfig.from_dict(
        {
            "experiment_name": "e2e",
            "batchsize": 2,
            "n_epochs": n_epochs,
            "seed": 0,
            "video_length": 16,
            "image_size": 64,
            "log_dir": str(tmp_path / "result"),
            "tensorboard_dir": str(tmp_path / "runs"),
            "log_interval": 1,
            "log_samples_interval": 1000,
            "snapshot_interval": 1,
            "evaluation_interval": 1000000,
            "geometric_info": {"name": "depth", "channel": 1},
            "dataset": {
                "name": "mock",
                "path": "unused",
                "n_workers": 1,
                "processed_root": str(mock_root.parent.parent),
            },
            "evaluation": {"batchsize": 2, "num_samples": 2, "metrics": []},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32"},
        }
    )
    cfg.validate()
    return cfg


@pytest.fixture(scope="module")
def mock_ds(tmp_path_factory):
    from dcvgan_tpu.data.mock import generate_mock_dataset

    root = tmp_path_factory.mktemp("e2e_data") / "processed" / "mock" / "train"
    generate_mock_dataset(root)
    return root


def make_dataset(cfg) -> VideoDataset:
    return VideoDataset(
        name="mock",
        preprocess_func=None,
        video_length=cfg.video_length,
        image_size=cfg.image_size,
        geometric_info="depth",
        extension="png",
        processed_root=cfg.dataset.processed_root,
    )


def test_train_checkpoint_resume(tmp_path, mock_ds):
    cfg = e2e_config(tmp_path, mock_ds, n_epochs=1)
    ds = make_dataset(cfg)
    trainer = Trainer(cfg, ds)
    state = trainer.train()
    assert int(state.step) == 1  # 3 videos, batch 2, drop_last -> 1 iter/epoch

    run_dir = Path(cfg.log_dir) / cfg.experiment_name
    assert (run_dir / "config.yml").exists()
    assert (run_dir / "log").exists()
    assert (run_dir / "models").exists()
    assert list(Path(cfg.tensorboard_dir).glob("**/events.*"))

    # ---- resume: a fresh Trainer picks up step 1 and continues to 2 epochs
    cfg2 = e2e_config(tmp_path, mock_ds, n_epochs=2)
    trainer2 = Trainer(cfg2, ds)
    assert int(trainer2.state.step) == 1, "resume did not restore step"
    state2 = trainer2.train()
    assert int(state2.step) == 2

    # resumed params differ from a fresh init (training happened)
    import jax

    fresh = trainer2.gan.init_state(trainer2.base_key)
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree.leaves(state2.ggen.params), jax.tree.leaves(fresh.ggen.params)
        )
    )
    assert changed


def test_sigterm_graceful_checkpoint(tmp_path, mock_ds):
    """Preemption safety: SIGTERM mid-run exits the loop cleanly through a
    forced checkpoint (TPU VMs get SIGTERM on preemption), and a fresh
    Trainer resumes from it."""
    import signal
    import threading

    cfg = e2e_config(tmp_path, mock_ds, n_epochs=10**6)  # can't finish
    ds = make_dataset(cfg)
    trainer = Trainer(cfg, ds)
    before_handler = signal.getsignal(signal.SIGTERM)
    timer = threading.Timer(3.0, lambda: signal.raise_signal(signal.SIGTERM))
    timer.start()
    try:
        state = trainer.train()  # returns instead of dying
    finally:
        timer.cancel()
    assert trainer._stop.is_set()
    assert trainer.ckpt.latest_step() == int(state.step)
    log_text = (Path(cfg.log_dir) / cfg.experiment_name / "log").read_text()
    assert "interrupted" in log_text
    # SIGTERM handler restored to its pre-train() disposition
    assert signal.getsignal(signal.SIGTERM) is before_handler

    resumed = Trainer(e2e_config(tmp_path, mock_ds, n_epochs=10**6), ds)
    assert int(resumed.state.step) == int(state.step)


def test_infer_cli_roundtrip(tmp_path, mock_ds):
    # train one step, then run the inference CLI against the run dir
    cfg = e2e_config(tmp_path, mock_ds, n_epochs=1)
    ds = make_dataset(cfg)
    Trainer(cfg, ds).train()
    run_dir = Path(cfg.log_dir) / cfg.experiment_name

    from dcvgan_tpu.cli.infer import main as infer_main

    save_dir = tmp_path / "generated"
    infer_main([str(run_dir), "-1", str(save_dir), "-n", "2", "-b", "2"])
    color = sorted((save_dir / "color").glob("*.mp4"))
    geo = sorted((save_dir / "depth").glob("*.mp4"))
    assert len(color) == 2 and len(geo) == 2

    from dcvgan_tpu.io.video import read_video

    v = read_video(color[0])
    assert v.shape == (16, 64, 64, 3)


def test_trainer_with_evaluation(tmp_path, mock_ds):
    """Trainer loop with in-loop IS/FID evaluation over the mock dataset."""
    cfg = e2e_config(tmp_path, mock_ds, n_epochs=1)
    cfg.evaluation.metrics = ["is", "fid"]
    cfg.evaluation.num_samples = 2
    cfg.evaluation.batchsize = 2

    from dcvgan_tpu.cli.train import build_evaluator

    ds = make_dataset(cfg)
    evaluator = build_evaluator(cfg, ds)
    trainer = Trainer(cfg, ds, evaluator=evaluator)
    # force an eval at step 0 + after the step
    trainer.evaluate(0)
    assert "is" in trainer.logger.metrics
    assert trainer.logger.metrics["is"].value is not None
    assert np.isfinite(trainer.logger.metrics["fid"].value)
