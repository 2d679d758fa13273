"""Render the head-to-head chart + table from the two trajectory files.

Inputs (written by the head-to-head pipeline):
- ``results/headtohead/refrun/eval_samples/scores.jsonl`` — the torch
  reference run's in-training scores (computed live by the evan shim with
  the committed extractor; ``eval_index * 200`` = iteration).
- ``results/headtohead/tpu_scores.json`` — our run's checkpoints, sampled
  to mp4 (tools/headtohead_sample.py) and scored by tools/score_iters.py
  under the identical protocol.

Output: ``results/headtohead/headtohead.png`` (FID + IS panels, one axis
each) and a markdown table on stdout.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
H2H = REPO / "results" / "headtohead"

# dataviz reference palette (validated categorical slots 1-2, light mode)
TPU, REF = "#2a78d6", "#eb6834"
TEXT, TEXT2, GRID = "#0b0b0b", "#52514e", "#e6e5e1"


def load_ref(run="refrun"):
    rows = {}
    path = H2H / run / "eval_samples" / "scores.jsonl"
    for line in path.read_text().splitlines():
        d = json.loads(line)
        it = d["eval_index"] * 200
        rows.setdefault(it, {})[d["metric"]] = d["value"]
    return dict(sorted(rows.items()))


def load_tpu(name="tpu_scores.json"):
    rows = json.loads((H2H / name).read_text())
    return {r["iteration"]: {"is": r["is"], "fid": r["fid"]} for r in rows}


def seeds_figure():
    """FID trajectories for both frameworks across every seed leg present:
    results/headtohead/refrun-seed<N>/ directories on the reference side,
    tpu_scores_seed<N>.json files on ours (seed 0 is the unsuffixed pair)."""
    # seed 0 (the unsuffixed baseline pair) owns the solid style; extra
    # seed legs cycle the non-solid styles so no leg can collide with it
    extra_styles = ["--", ":", "-."]
    runs = [
        ("dcvgan-tpu seed 0", load_tpu(), TPU, "-"),
        ("torch ref seed 0", load_ref(), REF, "-"),
    ]
    for p in sorted(H2H.glob("tpu_scores_seed*.json")):
        n = p.stem.removeprefix("tpu_scores_seed")
        if not n.isdigit():  # EMA-leg files (tpu_scores_seedN_ema*.json)
            continue
        if n == "0":
            continue  # already present as the unsuffixed baseline
        runs.append((f"dcvgan-tpu seed {n}", load_tpu(p.name), TPU,
                     extra_styles[(int(n) - 1) % len(extra_styles)]))
    for p in sorted(H2H.glob("refrun-seed*")):
        if not (p / "eval_samples" / "scores.jsonl").exists():
            continue
        n = p.name.removeprefix("refrun-seed")
        if not n.isdigit() or n == "0":
            continue
        runs.append((f"torch ref seed {n}", load_ref(p.name), REF,
                     extra_styles[(int(n) - 1) % len(extra_styles)]))
    if len(runs) == 2:
        print("no extra seed trajectories present; skipping seeds figure")
        return
    runs.sort(key=lambda r: r[0])
    fig, ax = plt.subplots(figsize=(6.4, 4.2), dpi=150)
    for name, data, color, ls in runs:
        xs = sorted(data)
        ax.plot(xs, [data[x]["fid"] for x in xs], color=color, lw=2, ls=ls,
                marker="o", ms=3.5, label=name)
    ax.set_title("FID by seed (lower is better)", color=TEXT, fontsize=11)
    ax.set_xlabel("iteration", color=TEXT2, fontsize=9)
    ax.grid(color=GRID, lw=0.8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=8)
    ax.legend(frameon=False, fontsize=9, labelcolor=TEXT2)
    fig.tight_layout()
    out = H2H / "headtohead-seeds.png"
    fig.savefig(out)
    print(f"wrote {out}")

    ordered = sorted(runs, key=lambda r: (not r[0].startswith("torch"), r[0]))
    heads = [
        ("ref" if name.startswith("torch") else "tpu") + " s" + name.split()[-1]
        for name, *_ in ordered
    ]
    print("\n| iter | " + " | ".join(heads) + " |")
    print("|---|" + "---|" * len(ordered))
    cols = [r[1] for r in ordered]
    for it in sorted(set().union(*cols)):
        cells = " | ".join(
            f"{c[it]['fid']:.1f}" if it in c else "—" for c in cols
        )
        print(f"| {it} | {cells} |")


def ema_figure():
    """Live vs EMA-sampled FID within each EMA head-to-head run
    (tpu_scores_seedN_ema{,_live}.json pairs — the same checkpoints,
    generators read either live or through GANState.with_ema_params)."""
    pairs = []
    for p in sorted(H2H.glob("tpu_scores_seed*_ema.json")):
        seed = p.stem.removeprefix("tpu_scores_seed").removesuffix("_ema")
        live = H2H / f"tpu_scores_seed{seed}_ema_live.json"
        if live.exists():
            pairs.append((seed, load_tpu(live.name), load_tpu(p.name)))
    if not pairs:
        print("no EMA trajectory pairs present; skipping ema figure")
        return
    fig, axes = plt.subplots(1, len(pairs), figsize=(5.6 * len(pairs), 4.2),
                             dpi=150, squeeze=False)
    for ax, (seed, live, ema) in zip(axes[0], pairs):
        # the decay isn't recorded in the score files, so don't claim one
        for name, data, ls in (("live params", live, "-"),
                               ("EMA params", ema, "--")):
            xs = sorted(data)
            ax.plot(xs, [data[x]["fid"] for x in xs], color=TPU, lw=2, ls=ls,
                    marker="o", ms=3.5, label=name)
        ax.set_title(f"seed {seed}: live vs EMA sampling (FID, lower better)",
                     color=TEXT, fontsize=11)
        ax.set_xlabel("iteration", color=TEXT2, fontsize=9)
        ax.grid(color=GRID, lw=0.8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=TEXT2, labelsize=8)
        ax.legend(frameon=False, fontsize=9, labelcolor=TEXT2)
    fig.tight_layout()
    out = H2H / "headtohead-ema.png"
    fig.savefig(out)
    print(f"wrote {out}")

    for seed, live, ema in pairs:
        print(f"\nseed {seed}:\n| iter | live FID | EMA FID | live IS | EMA IS |")
        print("|---|---|---|---|---|")
        for it in sorted(set(live) | set(ema)):
            lv, em = live.get(it, {}), ema.get(it, {})
            print(f"| {it} | {lv.get('fid', float('nan')):.1f} | "
                  f"{em.get('fid', float('nan')):.1f} | "
                  f"{lv.get('is', float('nan')):.3f} | "
                  f"{em.get('is', float('nan')):.3f} |")


def main():
    ref, tpu = load_ref(), load_tpu()

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), dpi=150)
    for ax, metric, title in zip(
        axes, ["fid", "is"], ["FID (lower is better)", "IS (higher is better)"]
    ):
        for name, data, color in (
            ("dcvgan-tpu", tpu, TPU),
            ("torch reference", ref, REF),
        ):
            xs = sorted(data)
            ys = [data[x][metric] for x in xs]
            ax.plot(xs, ys, color=color, lw=2, marker="o", ms=4, label=name)
            # selective direct label at the last point
            ax.annotate(
                f"{ys[-1]:.0f}" if metric == "fid" else f"{ys[-1]:.2f}",
                (xs[-1], ys[-1]),
                textcoords="offset points", xytext=(6, -3),
                color=color, fontsize=9,
            )
        ax.set_title(title, color=TEXT, fontsize=11)
        ax.set_xlabel("iteration", color=TEXT2, fontsize=9)
        ax.grid(color=GRID, lw=0.8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=TEXT2, labelsize=8)
    axes[0].legend(frameon=False, fontsize=9, labelcolor=TEXT2)
    fig.suptitle(
        "Head-to-head on the synthetic dataset: matched configs, one "
        "committed extractor, 128 samples/eval",
        color=TEXT, fontsize=11,
    )
    fig.tight_layout()
    out = H2H / "headtohead.png"
    fig.savefig(out)
    print(f"wrote {out}")

    print("\n| iter | ref FID | tpu FID | ref IS | tpu IS |")
    print("|---|---|---|---|---|")
    for it in sorted(set(ref) | set(tpu)):
        r, t = ref.get(it, {}), tpu.get(it, {})
        print(
            f"| {it} | {r.get('fid', float('nan')):.1f} | "
            f"{t.get('fid', float('nan')):.1f} | "
            f"{r.get('is', float('nan')):.3f} | "
            f"{t.get('is', float('nan')):.3f} |"
        )

    seeds_figure()
    ema_figure()


if __name__ == "__main__":
    main()
