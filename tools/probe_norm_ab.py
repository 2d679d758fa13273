"""Measured A/B: trainer.norm=batch vs group, step rate + MFU on device.

VERDICT r4 "what's weak" #5 / "next round" #3: BatchNorm statistics cost
~33% of the fused train step (PERFORMANCE.md profile breakdown) and the
norm-swap was the one semantic lever never measured. This probe times the
flagship (mug-depth) training step at batch 20 and 128 under both norms
with the SAME rtt-hardened measurement core the benchmark uses
(bench.measure_rate: min-of-N adjacent RTT probes, adaptive scan length
until the work dominates the tunnel, median of 3 reps — see
tests/test_bench.py).

Writes results/norm_ab.json. Run on the TPU chip::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_norm_ab.py
"""

from __future__ import annotations

import copy
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo-root benchmark: shared measurement core)

BATCHES = (20, 128)
OUT = REPO / "results" / "norm_ab.json"


def main() -> None:
    import jax

    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN
    from dcvgan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(REPO)
    t0 = time.monotonic()

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = False

    device_kind = jax.devices()[0].device_kind
    peak = bench._peak_flops(device_kind)
    n_chips = jax.device_count()
    rtt_probe = bench._make_rtt_probe()
    key = prng.base_key(0)

    rows = []
    for norm in ("batch", "group"):
        cfg_n = copy.deepcopy(cfg)
        cfg_n.trainer.norm = norm
        cfg_n.validate()
        mesh = create_mesh(cfg_n)
        gan = DCVGAN(cfg_n)
        state = replicate(gan.init_state(key), mesh)
        for b in BATCHES:
            batch = shard_batch(
                bench._make_batch(b, cfg.video_length, cfg.image_size), mesh
            )
            meas, flops = bench._train_measurement(
                gan, state, key, batch, b, rtt_probe
            )
            row = {"norm": norm, "batch": b, "device": device_kind}
            if meas.get("invalid"):
                row["invalid"] = meas["invalid"]
            else:
                rate = meas["units_per_sec"]
                row.update(
                    iters_per_sec=round(rate, 3),
                    videos_per_sec=round(rate * b, 1),
                    gflops_per_step=round(flops / 1e9, 1) if flops else None,
                    mfu=(
                        round(flops * rate / (peak * n_chips), 4)
                        if peak and flops
                        else None
                    ),
                    rtt_s=meas["rtt_s"],
                    net_s=meas["net_s"],
                    spread=meas["spread"],
                )
            rows.append(row)
            print(
                f"[norm_ab +{time.monotonic() - t0:6.1f}s] {row}",
                file=sys.stderr, flush=True,
            )
            OUT.parent.mkdir(parents=True, exist_ok=True)
            OUT.write_text(json.dumps(rows, indent=1))

    # speedup summary (group vs batch at equal batch size)
    summary = {}
    by = {(r["norm"], r["batch"]): r for r in rows if "iters_per_sec" in r}
    for b in BATCHES:
        if ("batch", b) in by and ("group", b) in by:
            summary[f"group_speedup_b{b}"] = round(
                by[("group", b)]["iters_per_sec"]
                / by[("batch", b)]["iters_per_sec"],
                4,
            )
    OUT.write_text(json.dumps({"rows": rows, "summary": summary}, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
