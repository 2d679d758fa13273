"""Train the UNMODIFIED torch reference on the synthetic dataset (CPU) for
the head-to-head quality comparison (BASELINE.md: "FVD/IS parity with a
locally-trained reference run").

The reference's dataset contract (/root/reference/src/dataset.py:74,86-97,
126-131,157-166) is `data/processed/<name>/<mode>/` with `list.txt`,
per-video `color/NNN.jpg` + `depth/NNN.jpg` — which our synthetic tree
already matches. `PROCESSED_PATH` is the RELATIVE path "data/processed"
(dataset.py:14), so this runner works from a scratch cwd with
`data/processed/isogd` symlinked at the synthetic tree; the dataset name
must be one of isogd/mug/surreal because train.py resolves the
preprocessor by eval() on the name (/root/reference/src/train.py:95) —
"isogd" selects the grayscale-frames depth branch (dataset.py:157-166),
which is the synthetic tree's format. The preprocessed dir exists, so no
reference preprocessing ever runs.

Everything the reference writes lands under --out (default
results/headtohead/refrun): its own log/tensorboard dirs, model snapshots,
and an archive of every eval's generated mp4 sample set (via the evan shim)
for post-hoc re-scoring under the shared protocol.

Usage::

    python tools/run_reference.py [--iters 1600] [--batch 8] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REFERENCE_SRC = Path("/root/reference/src")
SYNTH_TREE = REPO / "data" / "processed" / "synthetic"
N_VIDEOS_PER_EPOCH = 64  # dcvgan_tpu/data/preprocess/synthetic.py N_VIDEOS

CONFIG_TEMPLATE = """\
# Head-to-head reference run: matched with configs/headtohead-tpu.yml.
experiment_name: headtohead-ref
batchsize: {batch}
n_epochs: {epochs}
seed: {seed}
video_length: 16
image_size: 64
log_dir: log
tensorboard_dir: runs
log_interval: 20
log_samples_interval: 1000000
snapshot_interval: {snapshot}
evaluation_interval: {eval_interval}
loss: adversarial-loss
num_gen_update: 1
num_dis_update: 1
geometric_info:
  name: depth
  channel: 1
dataset:
  name: isogd
  path: unused
  n_workers: 0
  number_limit: -1
evaluation:
  batchsize: {eval_batch}
  num_samples: {eval_samples}
  metrics: [is, fid]
ggen:
  dim_z_content: 40
  dim_z_motion: 10
  ngf: 32
  optimizer: {{lr: 0.0002, decay: 0.00001}}
cgen:
  dim_z_color: 10
  ngf: 32
  optimizer: {{lr: 0.0002, decay: 0.00001}}
idis:
  use_noise: true
  noise_sigma: 0.1
  ndf: 32
  optimizer: {{lr: 0.0002, decay: 0.00001}}
vdis:
  use_noise: true
  noise_sigma: 0.1
  ndf: 32
  optimizer: {{lr: 0.0002, decay: 0.00001}}
gdis:
  use_noise: false
  noise_sigma: 0.2
  ndf: 32
  optimizer: {{lr: 0.0002, decay: 0.00001}}
"""


def ensure_synthetic_tree() -> Path:
    train = SYNTH_TREE / "train"
    if not (train / "list.txt").exists():
        sys.path.insert(0, str(REPO))
        from dcvgan_tpu.data.preprocess.synthetic import (
            preprocess_synthetic_dataset,
        )

        print(f">> generating synthetic tree at {train}")
        preprocess_synthetic_dataset(Path("unused"), train, "train", 16, 64, 1)
    return train


def ensure_ref_mp4s(train: Path) -> Path:
    """Write the <root>/color preview-mp4 reference set the eval protocol
    compares against (/root/reference/src/trainer.py:205)."""
    color_dir = train / "color"
    lines = (train / "list.txt").read_text().split()
    n_videos = len(lines) // 2
    done = len(list(color_dir.glob("*.mp4"))) if color_dir.exists() else 0
    if done >= n_videos:
        return color_dir
    sys.path.insert(0, str(REPO))
    from dcvgan_tpu.io.image import read_img
    from dcvgan_tpu.io.video import write_video

    color_dir.mkdir(exist_ok=True)
    for vid in sorted(p for p in train.iterdir() if p.is_dir() and p.name != "color"):
        frames = sorted((vid / "color").glob("*.jpg"))
        video = np.stack([read_img(f) for f in frames])
        write_video(video, color_dir / f"{vid.name}.mp4")
    print(f">> wrote {n_videos} reference mp4s to {color_dir}")
    return color_dir


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=1600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-interval", type=int, default=200)
    ap.add_argument("--eval-samples", type=int, default=128)
    ap.add_argument("--eval-batch", type=int, default=32)
    ap.add_argument("--snapshot", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path,
                    default=REPO / "results" / "headtohead" / "refrun")
    args = ap.parse_args(argv)

    train_tree = ensure_synthetic_tree()
    ensure_ref_mp4s(train_tree)

    out = args.out.resolve()  # the runner chdir's into the workdir below
    out.mkdir(parents=True, exist_ok=True)
    workdir = out / "workdir"
    (workdir / "data" / "processed").mkdir(parents=True, exist_ok=True)
    link = workdir / "data" / "processed" / "isogd"
    if not link.exists():
        link.symlink_to(SYNTH_TREE)

    iters_per_epoch = N_VIDEOS_PER_EPOCH // args.batch
    epochs = max(1, args.iters // iters_per_epoch)
    cfg_path = workdir / "config-ref.yml"
    cfg_path.write_text(CONFIG_TEMPLATE.format(
        batch=args.batch, epochs=epochs, snapshot=args.snapshot,
        eval_interval=args.eval_interval, eval_batch=args.eval_batch,
        eval_samples=args.eval_samples, seed=args.seed,
    ))

    # shims first, then the reference on the path, then run in the workdir
    sys.path.insert(0, str(REPO))
    from tools import reference_shims

    reference_shims.install(archive_dir=out / "eval_samples",
                            eval_batchsize=args.eval_batch)
    sys.path.insert(0, str(REFERENCE_SRC))
    os.chdir(workdir)

    # tensorboardX add_video needs moviepy (not installed): save the sample
    # grid as an mp4 artifact instead, leaving the reference module untouched.
    import logger as ref_logger  # noqa: E402  (reference module)

    def tf_log_video(self, videos, tag, iteration):
        from dcvgan_tpu.io.video import write_video

        grid = np.asarray(videos)[0].transpose(0, 2, 3, 1)  # (T,C,H,W)->(T,H,W,C)
        path = Path(self.path) / f"samples_{tag}_{iteration:06d}.mp4"
        write_video(grid.astype("uint8"), path)

    ref_logger.Logger.tf_log_video = tf_log_video

    # torch>=2 compat: the reference's VideoDataLoader re-sets `.dataset`
    # after DataLoader init (/root/reference/src/dataset.py:22-24), which
    # modern torch forbids. The base __init__ already sets `.dataset`, so
    # the subclass init reduces to it exactly.
    import torch.utils.data  # noqa: E402
    import dataset as ref_dataset  # noqa: E402  (reference module)

    def _vdl_init(self, *args, **kwargs):
        # single-process loading: this is a 1-CPU host, and worker
        # processes would fork after JAX (the evan shim) is loaded —
        # os.fork() in a multithreaded process risks deadlock.
        kwargs["num_workers"] = 0
        kwargs.pop("worker_init_fn", None)
        torch.utils.data.DataLoader.__init__(self, *args, **kwargs)

    ref_dataset.VideoDataLoader.__init__ = _vdl_init

    # joblib's default loky (process) backend re-imports the reference
    # modules in fresh workers where the skvideo/colorlog shims don't
    # exist; force the threading backend (this is a 1-CPU host anyway).
    import functools  # noqa: E402

    import joblib  # noqa: E402
    import dataio as ref_dataio  # noqa: E402  (reference module)
    import util as ref_util  # noqa: E402  (reference module)

    threaded = functools.partial(joblib.Parallel, backend="threading")
    ref_dataio.Parallel = threaded
    ref_util.Parallel = threaded

    import train as ref_train  # noqa: E402  (reference entry point)

    sys.argv = ["train.py", "--config", str(cfg_path)]
    print(f">> reference training: {epochs} epochs x {iters_per_epoch} iters "
          f"(batch {args.batch}) in {workdir}")
    ref_train.main()


if __name__ == "__main__":
    main()
