"""Close the torch-importer loop on the head-to-head reference run
(round-2 VERDICT #1, final sub-item): convert the reference run's trained
``*_params_*.pth`` snapshots through ``cli.import_torch`` and verify the
imported model IS the torch model —

1. **Numerics on trained weights** (the strong check): drive the
   reference's OWN pickled modules (``*_model.pth`` +
   ``load_state_dict`` of the iteration params,
   /root/reference/src/trainer.py:70-86) and our imported run with
   IDENTICAL latents through every generator stage — GRU motion path,
   content+motion decode to geometry video, U-Net colorization — and
   report max|err|. Passing means that given the same z both frameworks
   emit the same videos, so sample sets score identically by
   construction.
2. **Score closure** (the protocol-level check): sample ``--n`` videos
   from the imported run through our own sampler + mp4 protocol
   (tools/headtohead_score.py), score them with the committed extractor
   against the full real set, and print them next to the torch run's own
   archived eval score at the same iteration
   (results/headtohead/refrun/eval_samples/scores.jsonl). The two draws
   use different RNG streams, so they agree only up to 128-sample FID
   noise — the numerics check above is what pins equality.

Runs entirely on CPU (forced — the torch side is CPU and the parity diff
must be float32-deterministic).

Usage::

    python tools/headtohead_import_check.py [--iteration 1600] [--n 128]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REFERENCE_SRC = Path("/root/reference/src")
MODELS_DIR = (
    REPO / "results" / "headtohead" / "refrun.partial.r2" / "workdir"
    / "log" / "headtohead-ref" / "models"
)
SCORES_JSONL = REPO / "results" / "headtohead" / "refrun" / "eval_samples" / "scores.jsonl"


def _force_cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


def load_torch_models(models_dir: Path, iteration: int):
    """The reference's own pickled modules, with the trained params loaded."""
    import torch

    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    # the reference's optional deps (colorlog/skvideo/evan) aren't installed;
    # the head-to-head shims stand in. `util` must be imported before
    # `generator` (their circular from-import only resolves in that order).
    from tools import reference_shims

    reference_shims.install()
    import util  # noqa: F401  (reference module, primes the circular import)

    out = {}
    for name in ("ggen", "cgen"):
        model = torch.load(
            models_dir / f"{name}_model.pth",
            map_location="cpu",
            weights_only=False,
        )
        sd = torch.load(
            models_dir / f"{name}_params_{iteration:05d}.pth",
            map_location="cpu",
            weights_only=False,
        )
        model.load_state_dict(sd)
        model.eval()
        out[name] = model
    return out


def check_numerics(tmodels, gan, state, batch: int = 4, seed: int = 7):
    """Identical latents through both frameworks; returns max|err| per stage."""
    import numpy as np
    import torch
    import jax.numpy as jnp
    import flax.linen as nn
    from dcvgan_tpu.models.ggen import GeometricVideoGenerator

    tggen, tcgen = tmodels["ggen"], tmodels["cgen"]
    ggen, cgen = gan.ggen, gan.cgen
    B, T = batch, ggen.video_length
    dzc, dzm = ggen.dim_z_content, ggen.dim_z_motion
    rng = np.random.default_rng(seed)
    errs = {}

    # --- GRU motion path (reference sample_z_m with explicit noise,
    # /root/reference/src/generator.py:90-101)
    h0 = rng.normal(size=(B, dzm)).astype(np.float32)
    e = rng.normal(size=(B, T, dzm)).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(h0)
        zm_t = []
        for t in range(T):
            h = tggen.recurrent(torch.from_numpy(e[:, t]), h)
            zm_t.append(h.numpy().copy())
    zm_torch = np.stack(zm_t, axis=1)  # (B, T, dzm)
    cell_params = state.ggen.params["recurrent"]["cell"]
    zm_ours = np.asarray(
        nn.RNN(nn.GRUCell(features=dzm)).apply(
            {"params": {"cell": cell_params}},
            jnp.asarray(e),
            initial_carry=jnp.asarray(h0),
        )
    )
    errs["ggen.gru"] = float(np.abs(zm_ours - zm_torch).max())

    # --- geometry decode on the GRU output (content repeated over time,
    # reference sample_z_content + sample_videos,
    # /root/reference/src/generator.py:103-141)
    zc = rng.normal(size=(B, dzc)).astype(np.float32)
    z = np.concatenate(
        [np.repeat(zc[:, None, :], T, axis=1), zm_torch], axis=-1
    ).reshape(B * T, dzc + dzm)
    with torch.no_grad():
        xg_torch = tggen.main(
            torch.from_numpy(z).view(B * T, -1, 1, 1)
        ).numpy()  # (B*T, C, 64, 64)
    xg_ours = np.asarray(
        ggen.apply(
            {"params": state.ggen.params, "batch_stats": state.ggen.batch_stats},
            jnp.asarray(z),
            False,
            method=GeometricVideoGenerator.decode,
        )
    )  # (B*T, 64, 64, C)
    errs["ggen.video"] = float(
        np.abs(xg_ours.transpose(0, 3, 1, 2) - xg_torch).max()
    )

    # --- colorization U-Net on that geometry (one z_color per video,
    # repeated per frame — reference forward_videos,
    # /root/reference/src/generator.py:404-435)
    dz_color = cgen.dim_z
    z_color = rng.normal(size=(B, dz_color)).astype(np.float32)
    z_rep = np.repeat(z_color[:, None, :], T, axis=1).reshape(B * T, dz_color)
    with torch.no_grad():
        xc_torch = tcgen(
            torch.from_numpy(xg_torch),
            torch.from_numpy(z_rep).view(B * T, -1, 1, 1),
        ).numpy()  # (B*T, 3, 64, 64)
    xc_ours = np.asarray(
        cgen.apply(
            {"params": state.cgen.params, "batch_stats": state.cgen.batch_stats},
            jnp.asarray(xg_torch.transpose(0, 2, 3, 1)),
            jnp.asarray(z_rep),
            train=False,
        )
    )
    errs["cgen.video"] = float(
        np.abs(xc_ours.transpose(0, 3, 1, 2) - xc_torch).max()
    )
    return errs


def torch_archived_score(iteration: int):
    scores = {}
    if SCORES_JSONL.exists():
        for line in SCORES_JSONL.read_text().splitlines():
            row = json.loads(line)
            if row["eval_index"] * 200 == iteration:
                scores[row["metric"]] = row["value"]
    return scores


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models-dir", type=Path, default=MODELS_DIR)
    ap.add_argument("--iteration", type=int, default=1600)
    ap.add_argument("--config", default=str(REPO / "configs" / "headtohead-tpu.yml"))
    ap.add_argument("--out", type=Path, default=None,
                    help="imported run dir (default result/headtohead/imported-ref-ITER)")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", type=Path,
                    default=REPO / "results" / "headtohead" / "import_check.json")
    args = ap.parse_args(argv)

    _force_cpu()
    out = args.out or (
        REPO / "result" / "headtohead" / f"imported-ref-{args.iteration}"
    )

    # 1. the actual CLI conversion surface
    from dcvgan_tpu.cli import import_torch

    import_torch.main(
        [str(args.models_dir), str(args.iteration), "-c", args.config, "-o", str(out)]
    )

    from dcvgan_tpu.cli.infer import load_run

    cfg, gan, state = load_run(out, -1)
    tmodels = load_torch_models(args.models_dir, args.iteration)

    # 2. numerics on the trained weights. The torch side computes in
    # float32, so the comparison model must too (the run config's
    # trainer.precision is bfloat16 — comparing against THAT only measures
    # bf16 rounding, ~0.4%/stage; sampling below still uses the run's own
    # precision).
    import dataclasses

    from dcvgan_tpu.train.step import DCVGAN

    cfg_f32 = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, precision="float32")
    )
    errs = check_numerics(tmodels, DCVGAN(cfg_f32), state)
    print(f">> max|err| per stage (f32): {errs}", file=sys.stderr)

    # 3. sample through our pipeline + score under the shared protocol
    from dcvgan_tpu import prng
    from dcvgan_tpu.eval.sampler import generate_samples
    from dcvgan_tpu.io.video import write_videos_parallel
    from tools.headtohead_score import score_dirs

    sample_dir = (
        REPO / "results" / "headtohead"
        / f"imported_samples_iter{args.iteration:06d}"
    )
    sample_dir.mkdir(parents=True, exist_ok=True)
    key = prng.base_key(args.seed)
    wrote = len(list(sample_dir.glob("*.mp4")))
    while wrote < args.n:
        _, xc = generate_samples(
            gan, state, prng.for_step(key, wrote), args.batch, args.batch,
            with_geo=False,
        )
        take = min(args.batch, args.n - wrote)
        write_videos_parallel(
            xc[:take], [sample_dir / f"{wrote + i:06d}.mp4" for i in range(take)]
        )
        wrote += take
        print(f">> sampled {wrote}/{args.n}", file=sys.stderr)

    real_dir = REPO / "data" / "processed" / "synthetic" / "train" / "color"
    ours = score_dirs(sample_dir, real_dir)
    torch_scores = torch_archived_score(args.iteration)

    report = {
        "iteration": args.iteration,
        "max_abs_err": errs,
        "imported_scores": {k: round(float(v), 4) for k, v in ours.items()},
        "torch_archived_scores": {
            k: round(float(v), 4) for k, v in torch_scores.items()
        },
        "n_samples": args.n,
    }
    print(json.dumps(report, indent=1))
    args.json_out.parent.mkdir(parents=True, exist_ok=True)
    existing = []
    if args.json_out.exists():
        existing = [
            r for r in json.loads(args.json_out.read_text())
            if r["iteration"] != args.iteration
        ]
    existing.append(report)
    existing.sort(key=lambda r: r["iteration"])
    args.json_out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
