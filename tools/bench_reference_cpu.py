"""Controlled same-host CPU throughput ratio: reference torch vs dcvgan-tpu.

BASELINE.md's ">=5x A100 step throughput" north star cannot be measured in
this environment (no GPU exists here). What CAN be measured is a controlled
framework-efficiency ratio: both frameworks execute the identical mug-depth
adversarial iteration (five models, D phase + G phase, Adam updates every
step, reference loop structure per /root/reference/src/trainer.py:269-363)
on THIS host's CPU with synthetic data. Hardware is the controlled variable,
so the ratio isolates the framework (graph construction + kernel dispatch +
compilation) from the accelerator.

The torch side IMPORTS the reference from /root/reference/src and drives it
with a loop that mirrors trainer.py's hot loop exactly, including its
quirks: fakes are NOT detached in the D phase (the D backward pays generator
backprop), and `opt_ggen.step()` runs twice in the G phase
(/root/reference/src/trainer.py:304-305,355-359). The JAX side runs
dcvgan_tpu's fused train step on the CPU backend in float32 (torch CPU has
no fast bf16 path; float32-vs-float32 is the fair comparison).

Usage::

    python tools/bench_reference_cpu.py [--batch 8] [--iters 4] [--warmup 2]

Writes results/cpu_ratio.json and prints one JSON line. Each side runs in a
fresh subprocess so backend/env configuration cannot leak between them.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REFERENCE_SRC = "/root/reference/src"


# --------------------------------------------------------------------------
# torch side (runs inside a subprocess with --side torch)
# --------------------------------------------------------------------------
def run_torch_side(batch: int, iters: int, warmup: int) -> dict:
    sys.path.insert(0, REFERENCE_SRC)
    import numpy as np
    import torch
    import torch.optim as optim

    import util  # noqa: F401  (must import before generator: circular import)
    import discriminator as D
    import generator as G
    import loss as L

    torch.manual_seed(0)
    np.random.seed(0)
    t_len, size = 16, 64

    # mug-depth flagship hyperparameters (configs/mug-depth.yml)
    ggen = G.GeometricVideoGenerator(40, 10, 1, "depth", 64, t_len)
    cgen = G.ColorVideoGenerator(1, 10, "depth", 64, t_len)
    idis = D.ImageDiscriminator(1, 3, False, 0.1, 64)
    vdis = D.VideoDiscriminator(1, 3, False, 0.1, 64)
    gdis = D.GradientDiscriminator(1, 3, False, 0.2, 32)
    models = {"ggen": ggen, "cgen": cgen, "idis": idis, "vdis": vdis, "gdis": gdis}
    for m in models.values():
        m.apply(util.init_weights)
    opts = {
        n: optim.Adam(m.parameters(), lr=2e-4, betas=(0.5, 0.999), weight_decay=1e-5)
        for n, m in models.items()
    }
    loss = L.AdversarialLoss()

    xc_real = torch.rand(batch, 3, t_len, size, size) * 2 - 1
    xg_real = torch.rand(batch, 1, t_len, size, size) * 2 - 1

    def step(iteration: int) -> None:
        # mirrors /root/reference/src/trainer.py:279-363 (num_gen_update =
        # num_dis_update = 1, so every gate passes)
        t_rand = np.random.randint(t_len)
        for m in (idis, vdis, gdis):
            m.train()
            m.zero_grad()
        y_real_i = idis(xg_real[:, :, t_rand], xc_real[:, :, t_rand])
        y_real_v = vdis(xg_real, xc_real)
        y_real_g = gdis(xg_real, xc_real)
        xg_fake = ggen.sample_videos(batch)
        xc_fake = cgen.forward_videos(xg_fake)
        y_fake_i = idis(xg_fake[:, :, t_rand], xc_fake[:, :, t_rand])
        y_fake_v = vdis(xg_fake, xc_fake)
        y_fake_g = gdis(xg_fake, xc_fake)
        loss_dis = (
            loss.compute_dis_loss(y_real_i, y_fake_i)
            + loss.compute_dis_loss(y_real_v, y_fake_v)
            + loss.compute_dis_loss(y_real_g, y_fake_g)
        )
        loss_dis.backward()
        opts["idis"].step()
        opts["vdis"].step()
        opts["gdis"].step()

        for m in (ggen, cgen):
            m.train()
            m.zero_grad()
        xg_fake = ggen.sample_videos(batch)
        xc_fake = cgen.forward_videos(xg_fake)
        y_fake_i = idis(xg_fake[:, :, t_rand], xc_fake[:, :, t_rand])
        y_fake_v = vdis(xg_fake, xc_fake)
        y_fake_g = gdis(xg_fake, xc_fake)
        loss_gen = loss.compute_gen_loss(y_fake_i, y_fake_v, y_fake_g)
        loss_gen.backward()
        opts["ggen"].step()
        opts["cgen"].step()
        opts["ggen"].step()

    for i in range(warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(iters):
        step(warmup + i)
    dt = time.perf_counter() - t0
    return {
        "framework": f"torch-{__import__('torch').__version__}",
        "iters_per_sec": iters / dt,
        "sec_per_iter": dt / iters,
        "threads": __import__("torch").get_num_threads(),
    }


# --------------------------------------------------------------------------
# jax side (runs inside a subprocess with --side jax + JAX_PLATFORMS=cpu)
# --------------------------------------------------------------------------
def run_jax_side(batch: int, iters: int, warmup: int) -> dict:
    import jax

    # the environment's sitecustomize pins JAX_PLATFORMS=axon (the tunneled
    # TPU), so the env var alone cannot force CPU; jax.config before backend
    # init is the supported escape hatch (same as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, str(REPO))
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.train.step import DCVGAN

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.batchsize = batch
    cfg.trainer.precision = "float32"  # fair vs torch CPU float32
    cfg.trainer.donate_state = True

    gan = DCVGAN(cfg)
    key = prng.base_key(0)
    state = gan.init_state(key)

    rng = np.random.default_rng(0)
    t_len, size = cfg.video_length, cfg.image_size
    device_batch = {
        "color": rng.uniform(-1, 1, (batch, t_len, size, size, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (batch, t_len, size, size, 1)).astype(np.float32),
    }

    assert jax.devices()[0].platform == "cpu", (
        f"jax side must run on CPU, got {jax.devices()[0].platform}"
    )

    step_fn = gan.jitted_train_step
    t_compile0 = time.perf_counter()
    for i in range(max(1, warmup)):
        state, metrics = step_fn(state, device_batch, prng.for_step(key, i))
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t_compile0

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, device_batch, prng.for_step(key, 100 + i))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    return {
        "framework": f"jax-{jax.__version__}",
        "iters_per_sec": iters / dt,
        "sec_per_iter": dt / iters,
        "compile_plus_warmup_s": compile_s,
        "backend": jax.devices()[0].platform,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--side", choices=["torch", "jax"], default=None)
    args = parser.parse_args()

    if args.side == "torch":
        print(json.dumps(run_torch_side(args.batch, args.iters, args.warmup)))
        return
    if args.side == "jax":
        print(json.dumps(run_jax_side(args.batch, args.iters, args.warmup)))
        return

    sides = {}
    for side in ("torch", "jax"):
        env = dict(os.environ)
        if side == "jax":
            env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [
                sys.executable,
                __file__,
                "--side",
                side,
                "--batch",
                str(args.batch),
                "--iters",
                str(args.iters),
                "--warmup",
                str(args.warmup),
            ],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        sides[side] = json.loads(out.stdout.strip().splitlines()[-1])

    ratio = sides["jax"]["iters_per_sec"] / sides["torch"]["iters_per_sec"]
    result = {
        "metric": "cpu_step_rate_ratio_jax_over_torch",
        "value": round(ratio, 3),
        "unit": "x",
        "batch": args.batch,
        "iters": args.iters,
        "host_cpus": os.cpu_count(),
        "torch": sides["torch"],
        "jax": sides["jax"],
        "note": (
            "same host CPU, same mug-depth adversarial iteration, float32 "
            "both sides; reference loop mirrored incl. non-detached D-phase "
            "fakes and double opt_ggen.step()"
        ),
    }
    out_path = REPO / "results" / "cpu_ratio.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
