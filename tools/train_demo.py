"""Post-process a training run into committed artifacts (VERDICT r1 #2).

Parses the run's console log table into ``metrics.csv``, renders loss and
relative-FID trajectory charts (matplotlib, static PNG), and renders sample
frame-strips from every saved checkpoint so sample evolution is visible::

    python tools/train_demo.py <run_dir> <out_dir>

``<run_dir>`` is the trainer's ``result/<...>/<experiment>`` directory (log,
config.yml, models/). Artifacts: metrics.csv, losses.png, fid.png,
samples_step_NNNNNN.png (geometry | color strips), final_samples.mp4.
"""

from __future__ import annotations

import argparse
import csv
import re
from pathlib import Path

import numpy as np

# dataviz reference palette (validated categorical slots 1-4, light mode)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
TEXT, TEXT2, GRID = "#0b0b0b", "#52514e", "#e6e5e1"

def parse_log(run_dir: Path):
    """Extract (header, rows) from the fixed-width metric table in the log."""
    header = None
    rows = []
    for line in (run_dir / "log").read_text().splitlines():
        body = re.sub(r"^\[[^\]]+\]\s*", "", line)
        cols = body.split()
        if cols[:2] == ["epoch", "iteration"]:
            header = cols
            continue
        if header and len(cols) == len(header):
            try:
                rows.append([float(c) if c != "-" else None for c in cols[:-2]]
                            + cols[-2:])
            except ValueError:
                continue
    if header is None:
        raise SystemExit(f"no metric table found in {run_dir}/log")
    return header, rows


def write_csv(header, rows, out: Path) -> None:
    with out.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for r in rows:
            w.writerow(["" if c is None else c for c in r])


def _style_axes(ax, title, xlabel, ylabel):
    ax.set_title(title, color=TEXT, fontsize=11, loc="left")
    ax.set_xlabel(xlabel, color=TEXT2, fontsize=9)
    ax.set_ylabel(ylabel, color=TEXT2, fontsize=9)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=8)


def plot_curves(header, rows, out_dir: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    col = {name: i for i, name in enumerate(header)}
    it = np.array([r[col["iteration"]] for r in rows], dtype=float)

    # losses: one axis, four series in fixed categorical order
    fig, ax = plt.subplots(figsize=(7, 3.4), dpi=150, facecolor="#fcfcfb")
    ax.set_facecolor("#fcfcfb")
    for name, c in zip(["loss_gen", "loss_idis", "loss_vdis", "loss_gdis"], SERIES):
        y = np.array(
            [np.nan if r[col[name]] is None else r[col[name]] for r in rows],
            dtype=float,
        )
        ax.plot(it, y, color=c, linewidth=1.4, label=name)
    _style_axes(ax, "Training losses", "iteration", "loss")
    ax.legend(frameon=False, fontsize=8, labelcolor=TEXT2)
    fig.tight_layout()
    fig.savefig(out_dir / "losses.png")
    plt.close(fig)

    # relative FID (seeded extractor): single series, no legend
    for metric in ("fid", "is"):
        if metric not in col:
            continue
        pts = [
            (r[col["iteration"]], r[col[metric]])
            for r in rows
            if r[col[metric]] is not None
        ]
        if not pts:
            continue
        x, y = zip(*pts)
        fig, ax = plt.subplots(figsize=(7, 3.0), dpi=150, facecolor="#fcfcfb")
        ax.set_facecolor("#fcfcfb")
        ax.plot(x, y, color=SERIES[0], linewidth=2.0, marker="o", markersize=4)
        label = "relative FVD (seeded extractor)" if metric == "fid" else metric
        _style_axes(ax, label, "iteration", metric)
        fig.tight_layout()
        fig.savefig(out_dir / f"{metric}.png")
        plt.close(fig)


def render_checkpoint_samples(run_dir: Path, out_dir: Path, n_samples=4, stride=2):
    """For every checkpoint step: a (geometry | color) frame-strip PNG."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.eval.sampler import generate_samples
    from dcvgan_tpu.io.image import write_img
    from dcvgan_tpu.io.video import write_video
    from dcvgan_tpu.train.checkpoint import CheckpointManager
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config(run_dir / "config.yml")
    gan = DCVGAN(cfg)
    template = gan.init_state(prng.base_key(cfg.seed))
    ckpt = CheckpointManager(run_dir / "models")
    steps = sorted(ckpt._mgr.all_steps())
    key = prng.base_key(123)

    for step in steps:
        state = ckpt.restore(template, step=step)
        xg, xc = generate_samples(gan, state, key, n_samples, n_samples)
        # frame strips: rows = samples, cols = frames (every `stride`-th)
        frames = list(range(0, xc.shape[1], stride))
        strip_c = np.concatenate(
            [np.concatenate([v[t] for t in frames], axis=1) for v in xc], axis=0
        )
        strip_g = np.concatenate(
            [np.concatenate([v[t] for t in frames], axis=1) for v in xg], axis=0
        )
        strip = np.concatenate([strip_g, strip_c], axis=0)
        write_img(strip, out_dir / f"samples_step_{step:06d}.png")
        print(f"step {step}: wrote samples strip")

    if steps:
        grid = np.concatenate(list(xc), axis=2)  # (T, H, n*W, 3) final step
        write_video(grid, out_dir / "final_samples.mp4")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", type=Path)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--no-samples", action="store_true")
    args = parser.parse_args(argv)
    args.out_dir.mkdir(parents=True, exist_ok=True)

    header, rows = parse_log(args.run_dir)
    write_csv(header, rows, args.out_dir / "metrics.csv")
    plot_curves(header, rows, args.out_dir)
    print(f"wrote metrics.csv + charts ({len(rows)} rows)")
    if not args.no_samples:
        render_checkpoint_samples(args.run_dir, args.out_dir)


if __name__ == "__main__":
    main()
