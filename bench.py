"""Benchmark: mug-depth training throughput + batched inference rate.

Runs on whatever accelerator is visible (one TPU v5e chip under the driver).
Prints ONE JSON line at the end:

    {"metric": "infer_videos_per_sec_per_chip", "value": ..., "unit":
     "videos/s", "vs_baseline": value / 1000, "train_iters_per_sec": ...,
     "train_sweep": {...}, "train_mfu": ...}

``vs_baseline`` is measured against the BASELINE.md north-star target of
1,000 generated 16x64x64 videos/sec/chip. ``train_sweep`` reports step rate,
videos/s and MFU at batch 20/64/128; ``train_mfu`` is the best MFU across
the sweep (model FLOPs per step from XLA's compiled cost analysis divided by
measured step time and chip peak bf16 FLOP/s).

The run is STAGED and TIME-BUDGETED (round 4): results accumulate stage by
stage (flagship batch and the headline inference number first); each stage
gets its own single retry; a stage is skipped when the remaining budget
can't cover it; and a SIGALRM backstop at ``BENCH_BUDGET_S`` (default
1500 s) prints whatever has been measured so far. Stage progress goes to
stderr; the single JSON line is the only stdout output.

Timing methodology — hardened in round 5 after BENCH_r04.json shipped
physically impossible numbers (VERDICT.md round-4 headline: a one-shot
mean-of-5 RTT probe measured 2,918 ms through a cold tunnel, every warm
stage then finished faster than the subtracted RTT, and a
``max(1e-9, elapsed - rtt)`` clamp turned each stage into ``steps / 1e-9``).
The measurement core (:func:`measure_rate`, unit-tested with a fake clock in
``tests/test_bench.py``) now enforces:

1. **RTT = min of >= 5 probes**, re-probed immediately before every timed
   repetition — never a one-shot mean taken minutes earlier (a single cold
   outlier poisons a mean; the min of adjacent probes tracks the warm
   tunnel).
2. **The timed work must dominate the tunnel**: each stage's on-device scan
   length is grown adaptively until ``elapsed >= RTT_DOMINANCE x rtt``
   (one warm re-estimate jump, then doubling); a stage that cannot reach
   dominance is recorded as *invalid*, never extrapolated.
3. **No clamping, ever**: ``elapsed - rtt <= 0`` marks the stage invalid
   (``"invalid"`` list in the JSON + nonzero exit) instead of flooring the
   denominator.
4. **Median of 3 timed repetitions** with the relative spread reported, so
   a single tunnel hiccup cannot land in the headline.
5. **Plausibility gates before emitting**: MFU must lie in (0, 1], train
   iters/s in (0, 1e4), videos/s in (0, 1e6); violations null the field and
   fail the run. The previous round's ``BENCH_r*.json`` (the newest one
   that itself passes the gates) is loaded for a delta line; >2x divergence
   raises a ``regression_flags`` entry.
6. **Exit code tells the truth**: rc != 0 whenever the headline is missing,
   any stage was invalid or errored, or the budget backstop fired — a green
   rc now means "every number in this line was actually measured".

Primary numbers run the iteration loop **on device** inside one jitted
``lax.scan`` and fetch a single dependent scalar (the device executes in
order, so that fetch waits for everything). Python-dispatch-loop rates are
reported alongside as ``dispatched_*`` for reference.
"""

import json
import math
import os
import re
import signal
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

TRAIN_SWEEP = (20, 64, 128)  # flagship batch first, then utilization probes

# B=256 is the saturation sweet spot: a full staged-bench A/B measured
# B=512 at parity (5396 vs 5426 videos/s — inside run variance; an
# isolated scan probe's +2% did not survive the rtt-corrected harness),
# and B=1024 OOMs the per-frame U-Net's temps. 256 also keeps the
# headline comparable across BENCH_r0*.json history.
INFER_BATCH = 256
INFER_SCAN_ITERS = 20
DISPATCH_ITERS = 10

RTT_DOMINANCE = 10.0  # accept a timing only when elapsed >= 10x rtt
TIMED_REPS = 3
RTT_PROBES = 5

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()

# results accumulate here so the alarm handler can dump a partial line
RESULTS: dict = {
    "metric": "infer_videos_per_sec_per_chip",
    "value": None,
    "unit": "videos/s",
    "vs_baseline": None,
}
_PRINTED = False


# --------------------------------------------------------------------------
# measurement core (pure logic; unit-tested with a fake clock)
# --------------------------------------------------------------------------

def min_rtt(probe, n: int = RTT_PROBES) -> float:
    """Min of ``n`` round-trip probes. The *min* (not mean) is the robust
    estimator here: probes are lower-bounded by the true warm RTT and a
    single cold outlier (BENCH_r04: 2.9 s after a 941 s setup) otherwise
    poisons the whole stage."""
    return min(probe() for _ in range(max(1, n)))


def measure_rate(
    make_runner,
    initial_units: int,
    rtt_probe,
    *,
    clock=time.perf_counter,
    dominance: float = RTT_DOMINANCE,
    max_units: int = 4096,
    max_grows: int = 4,
    reps: int = TIMED_REPS,
    rtt_probes: int = RTT_PROBES,
) -> dict:
    """Tunnel-robust rate measurement. Never clamps, never extrapolates.

    ``make_runner(units)`` returns a zero-arg callable that executes
    ``units`` work units back-to-back *on device* and blocks until a
    dependent scalar arrives (its creation may compile; it must also warm
    itself so the first timed call is steady-state). ``rtt_probe()``
    measures one host<->device round trip in seconds.

    Returns ``{"units_per_sec", "units", "rtt_s", "net_s", "spread",
    "reps_net_s"}`` on success or ``{"invalid": reason, ...}`` when the
    work cannot be made to dominate the tunnel or the timed repetitions
    still come out non-positive after RTT subtraction.
    """
    rtt = min_rtt(rtt_probe, rtt_probes)
    units = max(1, int(initial_units))
    runner = make_runner(units)
    grows = 0
    while True:
        t0 = clock()
        runner()
        elapsed = clock() - t0
        if elapsed >= dominance * rtt:
            break
        grows += 1
        if units >= max_units or grows > max_grows:
            return {
                "invalid": (
                    f"work cannot dominate rtt: {units} units ran in "
                    f"{elapsed:.3f}s vs rtt {rtt:.3f}s "
                    f"(need >= {dominance * rtt:.3f}s)"
                ),
                "units": units,
                "rtt_s": round(rtt, 4),
                "elapsed_s": round(elapsed, 4),
            }
        net = elapsed - rtt
        if net > 0:
            # jump straight to the projected dominant length, with margin
            per_unit = net / units
            units = min(
                max_units,
                max(units * 2, math.ceil(dominance * rtt * 1.3 / per_unit)),
            )
        else:
            units = min(max_units, units * 8)
        runner = make_runner(units)

    nets = []
    for _ in range(max(1, reps)):
        r = min_rtt(rtt_probe, min(3, rtt_probes))  # adjacent re-probe
        t0 = clock()
        runner()
        nets.append(clock() - t0 - r)
    med = statistics.median(nets)
    if med <= 0:
        return {
            "invalid": (
                f"elapsed <= rtt across {len(nets)} timed reps "
                f"(median net {med:.4f}s, rtt {rtt:.4f}s)"
            ),
            "units": units,
            "rtt_s": round(rtt, 4),
            "reps_net_s": [round(x, 4) for x in nets],
        }
    return {
        "units_per_sec": units / med,
        "units": units,
        "rtt_s": round(rtt, 4),
        "net_s": round(med, 4),
        "spread": round((max(nets) - min(nets)) / med, 4),
        "reps_net_s": [round(x, 4) for x in nets],
    }


# plausibility bounds for this model family on current single-chip hardware:
# train steps are O(1-100)/s, a 16x64x64 two-stage sample pipeline tops out
# well under 1e6 videos/s/chip, and MFU is a fraction of peak by definition.
PLAUSIBLE_BOUNDS = {
    "iters_per_sec": (0.0, 1e4),
    "videos_per_sec": (0.0, 1e6),
    "mfu": (0.0, 1.0),
}


def _plausible(kind: str, value) -> bool:
    lo, hi = PLAUSIBLE_BOUNDS[kind]
    try:
        v = float(value)
    except (TypeError, ValueError):
        return False
    return math.isfinite(v) and lo < v <= hi


def validate_results(results: dict) -> list:
    """Null out physically impossible numbers and return the violation list.

    BENCH_r04.json shipped MFU 290,447,291 with rc=0; this gate converts
    that failure mode into explicit ``"invalid"`` entries + nonzero exit.
    """
    bad = []

    def _check(container, field, kind):
        v = container.get(field)
        if v is not None and not _plausible(kind, v):
            bad.append(f"{field}={v}")
            container[field] = None

    for b, point in (results.get("train_sweep") or {}).items():
        for field, kind in (
            ("iters_per_sec", "iters_per_sec"),
            ("videos_per_sec", "videos_per_sec"),
            ("mfu", "mfu"),
        ):
            v = point.get(field)
            if v is not None and not _plausible(kind, v):
                bad.append(f"train_sweep[{b}].{field}={v}")
                point[field] = None
    _check(results, "value", "videos_per_sec")
    _check(results, "train_iters_per_sec", "iters_per_sec")
    _check(results, "best_train_videos_per_sec", "videos_per_sec")
    _check(results, "train_mfu", "mfu")
    _check(results, "train_fast_iters_per_sec", "iters_per_sec")
    _check(results, "train_fastest_iters_per_sec", "iters_per_sec")
    _check(results, "dispatched_train_iters_per_sec", "iters_per_sec")
    _check(results, "dispatched_videos_per_sec_per_chip", "videos_per_sec")
    if results.get("value") is None:
        results["vs_baseline"] = None
    if bad:
        results.setdefault("invalid", []).extend(bad)
    return bad


def load_previous_bench(repo: Path):
    """Newest driver-recorded BENCH_r*.json whose own headline passes the
    plausibility gates (r04's 5.12e12 must not become the comparison
    baseline). Returns (filename, parsed_results) or (None, None)."""

    def round_num(p: Path) -> int:
        m = re.search(r"(\d+)", p.stem)
        return int(m.group(1)) if m else -1  # digit-less names sort last

    candidates = sorted(
        repo.glob("BENCH_r*.json"), key=round_num, reverse=True
    )
    for path in candidates:
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        parsed = data.get("parsed") if isinstance(data, dict) else None
        if not isinstance(parsed, dict):
            parsed = data if isinstance(data, dict) else None
        if not parsed:
            continue
        if _plausible("videos_per_sec", parsed.get("value")):
            return path.name, parsed
    return None, None


def compare_previous(results: dict, repo: Path = REPO) -> None:
    """Attach a previous-round delta; flag >2x divergence (catches both
    corruption like r04's and genuine regressions)."""
    name, prev = load_previous_bench(repo)
    if not prev:
        return
    entry = {"file": name, "value": prev.get("value")}
    cur = results.get("value")
    if cur and prev.get("value"):
        ratio = float(cur) / float(prev["value"])
        entry["headline_ratio"] = round(ratio, 3)
        if not (0.5 <= ratio <= 2.0):
            results.setdefault("regression_flags", []).append(
                f"headline {float(cur):.1f} vs {name} "
                f"{float(prev['value']):.1f} "
                f"(ratio {ratio:.2f} outside [0.5, 2])"
            )
    pm = prev.get("train_mfu")
    cm = results.get("train_mfu")
    if cm and pm and _plausible("mfu", pm):
        entry["train_mfu"] = pm
        rat = float(cm) / float(pm)
        entry["train_mfu_ratio"] = round(rat, 3)
        if not (0.5 <= rat <= 2.0):
            results.setdefault("regression_flags", []).append(
                f"train_mfu {cm} vs {name} {pm} (ratio {rat:.2f})"
            )
    results["previous_round"] = entry


def final_rc(results: dict) -> int:
    """0 only when every emitted number was actually measured and sane."""
    if results.get("value") is None:
        return 1
    if results.get("invalid") or results.get("errors"):
        return 1
    if results.get("partial"):
        return 1
    return 0


# --------------------------------------------------------------------------
# staging harness
# --------------------------------------------------------------------------

def _emit_and_exit(code: int) -> None:
    global _PRINTED
    if not _PRINTED:
        _PRINTED = True
        print(json.dumps(RESULTS), flush=True)
    os._exit(code)


def _alarm(signum, frame):  # pragma: no cover - timing-dependent
    RESULTS["partial"] = "budget_exhausted"
    _note(f"SIGALRM at +{time.monotonic() - _T0:.0f}s: emitting partial")
    try:
        validate_results(RESULTS)
    except Exception:  # noqa: BLE001 - the JSON line must still go out
        RESULTS.setdefault("errors", {})["epilogue"] = "validate failed"
    _emit_and_exit(final_rc(RESULTS))


def _note(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _stage(name: str, fn, est_s: float = 60.0, retries: int = 1):
    """Run one stage; skip if the remaining budget can't cover it; retry
    once on failure (the tunneled backend occasionally drops a call).
    A stage returning an ``{"invalid": ...}`` dict is recorded as invalid —
    not retried (the condition is systematic, not transient)."""
    if _remaining() < est_s:
        _note(f"skip {name}: est {est_s:.0f}s > remaining {_remaining():.0f}s")
        RESULTS.setdefault("skipped", []).append(name)
        return None
    for attempt in range(retries + 1):
        t0 = time.monotonic()
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 - stage isolation by design
            _note(f"{name}: attempt {attempt + 1} failed: {e!r}")
            if attempt == retries or _remaining() < est_s:
                RESULTS.setdefault("errors", {})[name] = repr(e)[:300]
                return None
            continue
        if isinstance(out, dict) and out.get("invalid"):
            _note(f"{name}: INVALID: {out['invalid']}")
            RESULTS.setdefault("invalid", []).append(
                f"{name}: {out['invalid']}"
            )
            return None
        _note(f"{name}: ok in {time.monotonic() - t0:.1f}s")
        return out


# peak bf16 matmul FLOP/s per chip, by device_kind substring
_PEAK_BF16 = (
    ("v6 lite", 918e12),
    ("v6e", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12),
    ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def _peak_flops(device_kind: str):
    kind = device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def _initial_steps(b: int) -> int:
    """Starting scan length per timed run (adapted upward by measure_rate
    until the work dominates the measured RTT)."""
    return max(4, int(round(400 / b)))


def _make_rtt_probe():
    import jax
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    z = noop(jnp.float32(0.0))
    float(z)  # compile + first fetch outside any measurement

    def probe() -> float:
        t0 = time.perf_counter()
        float(noop(z))
        return time.perf_counter() - t0

    return probe


def _make_batch(b: int, t: int, s: int) -> dict:
    import numpy as np

    rng = np.random.default_rng(0)
    return {
        "color": rng.uniform(-1, 1, (b, t, s, s, 3)).astype(np.float32),
        "depth": rng.uniform(-1, 1, (b, t, s, s, 1)).astype(np.float32),
    }


def _train_measurement(gan, state, key, device_batch, b, rtt_probe):
    """measure_rate over on-device lax.scan train iterations.

    Returns (measurement_dict, flops_per_step)."""
    import jax
    import jax.numpy as jnp

    from dcvgan_tpu import prng

    flops_box = {}

    def make_runner(steps: int):
        def body(carry, i):
            st, _ = carry
            st, metrics = gan.train_step(st, device_batch, prng.for_step(key, i))
            return (st, metrics["loss_gen"]), None

        def scan(st):
            (st, last_loss), _ = jax.lax.scan(
                body, (st, jnp.float32(0.0)), jnp.arange(steps)
            )
            return last_loss

        compiled = jax.jit(scan).lower(state).compile()
        if "flops" not in flops_box:
            try:
                cost = compiled.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                # XLA's cost analysis counts a while-loop body ONCE, not x
                # trip count (verified: totals are linear in batch size and
                # invariant to the scan length) => already per-step.
                flops_box["flops"] = float(cost["flops"])
            except Exception:
                flops_box["flops"] = None
        float(compiled(state))  # warm run (already compiled)
        return lambda: float(compiled(state))

    meas = measure_rate(make_runner, _initial_steps(b), rtt_probe)
    return meas, flops_box.get("flops")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dcvgan_tpu import prng
    from dcvgan_tpu.config import load_config
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from dcvgan_tpu.train.step import DCVGAN
    from dcvgan_tpu.utils.compile_cache import enable_compile_cache

    # machine-fingerprinted persistent cache: cold compiles through the dev
    # tunnel cost 40-200 s per jit signature; warm repeats take ~2 min total
    enable_compile_cache(REPO)

    cfg = load_config(REPO / "configs" / "mug-depth.yml")
    cfg.trainer.precision = "bfloat16"
    cfg.trainer.donate_state = False  # state is reused across timed variants

    mesh = create_mesh(cfg)
    gan = DCVGAN(cfg)
    key = prng.base_key(0)

    def _setup():
        # model init + rtt-probe compile are remote calls outside any stage;
        # retried once like stage bodies (the tunneled backend occasionally
        # drops a call — the old whole-run retry existed for exactly this)
        return replicate(gan.init_state(key), mesh), _make_rtt_probe()

    try:
        state, rtt_probe = _setup()
    except Exception as e:  # noqa: BLE001 - one retry, as _stage does
        _note(f"setup attempt 1 failed: {e!r}")
        state, rtt_probe = _setup()
    t, s = cfg.video_length, cfg.image_size
    n_chips = jax.device_count()
    device_kind = jax.devices()[0].device_kind
    peak = _peak_flops(device_kind)
    RESULTS.update(
        {
            "train_batchsize": cfg.batchsize,
            "infer_batchsize": INFER_BATCH,
            "n_chips": n_chips,
            "device": device_kind,
            "peak_bf16_flops": peak,
        }
    )
    _note(
        f"setup done: {device_kind}, "
        f"rtt(min of {RTT_PROBES})={min_rtt(rtt_probe) * 1e3:.1f}ms"
    )

    def _sweep_point(b: int):
        device_batch = shard_batch(_make_batch(b, t, s), mesh)
        meas, flops_per_step = _train_measurement(
            gan, state, key, device_batch, b, rtt_probe
        )
        if meas.get("invalid"):
            return meas
        iters_per_sec = meas["units_per_sec"]
        mfu = None
        if peak and flops_per_step:
            mfu = round(flops_per_step * iters_per_sec / (peak * n_chips), 4)
        return {
            "iters_per_sec": round(iters_per_sec, 3),
            "videos_per_sec": round(iters_per_sec * b, 1),
            "gflops_per_step": (
                round(flops_per_step / 1e9, 1) if flops_per_step else None
            ),
            "mfu": mfu,
            "timing": {
                k: meas[k] for k in ("units", "rtt_s", "net_s", "spread")
            },
        }

    def _refresh_train_summary():
        sweep = RESULTS.get("train_sweep", {})
        flagship = sweep.get(str(cfg.batchsize))
        if flagship and flagship.get("iters_per_sec") is not None:
            RESULTS["train_iters_per_sec"] = flagship["iters_per_sec"]
        vps = [
            v["videos_per_sec"]
            for v in sweep.values()
            if v.get("videos_per_sec") is not None
        ]
        if vps:
            RESULTS["best_train_videos_per_sec"] = max(vps)
        mfus = [v["mfu"] for v in sweep.values() if v.get("mfu") is not None]
        if mfus:
            RESULTS["train_mfu"] = max(mfus)

    # ---- stage 1: flagship-batch training rate (the most important number)
    sweep_batches = list(dict.fromkeys((cfg.batchsize,) + TRAIN_SWEEP))
    b0 = sweep_batches[0]
    point = _stage(f"train_b{b0}", lambda: _sweep_point(b0), est_s=240)
    if point is not None:
        RESULTS.setdefault("train_sweep", {})[str(b0)] = point
        _refresh_train_summary()

    # ---- stage 2: headline inference throughput (device-side scan)
    def _infer_scan_stage():
        def make_runner(iters: int):
            def infer_body(acc, i):
                _, xc = gan.sample_videos(
                    state, prng.for_step(key, i), INFER_BATCH
                )
                return acc + jnp.sum(xc[0, 0, 0, 0]).astype(jnp.float32), None

            def infer_scan(z):
                acc, _ = jax.lax.scan(infer_body, z, jnp.arange(iters))
                return acc

            compiled = jax.jit(infer_scan).lower(jnp.float32(0.0)).compile()
            float(compiled(jnp.float32(0.0)))  # warm
            return lambda: float(compiled(jnp.float32(0.0)))

        meas = measure_rate(make_runner, INFER_SCAN_ITERS, rtt_probe)
        if meas.get("invalid"):
            return meas
        meas["videos_per_sec_per_chip"] = (
            INFER_BATCH * meas["units_per_sec"] / n_chips
        )
        return meas

    infer_meas = _stage("infer_scan", _infer_scan_stage, est_s=180)
    if infer_meas is not None:
        vps = infer_meas["videos_per_sec_per_chip"]
        RESULTS["value"] = round(vps, 2)
        RESULTS["vs_baseline"] = round(vps / 1000.0, 4)
        RESULTS["infer_timing"] = {
            k: infer_meas[k] for k in ("units", "rtt_s", "net_s", "spread")
        }

    # ---- stage 3+: the rest of the train sweep
    for b in sweep_batches[1:]:
        point = _stage(f"train_b{b}", lambda b=b: _sweep_point(b), est_s=240)
        if point is not None:
            RESULTS.setdefault("train_sweep", {})[str(b)] = point
            _refresh_train_summary()

    # ---- stage: fast paths (shared_fakes; + critic_joint_batch)
    import copy

    b = cfg.batchsize
    device_batch = shard_batch(_make_batch(b, t, s), mesh)

    def _variant_rate(cfg_variant):
        meas, _ = _train_measurement(
            DCVGAN(cfg_variant), state, key, device_batch, b, rtt_probe
        )
        return meas

    cfg_fast = copy.deepcopy(cfg)
    cfg_fast.trainer.shared_fakes = True
    fast = _stage("train_fast", lambda: _variant_rate(cfg_fast), est_s=180)
    if fast is not None:
        RESULTS["train_fast_iters_per_sec"] = round(fast["units_per_sec"], 3)

        cfg_fast2 = copy.deepcopy(cfg_fast)
        cfg_fast2.trainer.critic_joint_batch = True
        fastest = _stage(
            "train_fastest", lambda: _variant_rate(cfg_fast2), est_s=180
        )
        if fastest is not None:
            RESULTS["train_fastest_iters_per_sec"] = round(
                fastest["units_per_sec"], 3
            )

    # ---- stage: dispatched train variant (one python call per step)
    def _disp_train_stage():
        step_fn = gan.jitted_train_step
        st0, metrics = step_fn(state, device_batch, key)
        float(metrics["loss_gen"])  # warm + compile

        def make_runner(iters: int):
            def run():
                st, m = st0, metrics
                for _ in range(iters):
                    st, m = step_fn(st, device_batch, key)
                float(m["loss_gen"])

            return run

        return measure_rate(make_runner, DISPATCH_ITERS, rtt_probe)

    disp_train = _stage("dispatched_train", _disp_train_stage, est_s=120)
    if disp_train is not None:
        RESULTS["dispatched_train_iters_per_sec"] = round(
            disp_train["units_per_sec"], 3
        )

    # ---- stage: dispatched inference variant
    def _disp_infer_stage():
        def sample(carry, st, k):
            xg, xc = gan.sample_videos(st, k, INFER_BATCH)
            return carry + jnp.sum(xc[0, 0, 0, 0]).astype(jnp.float32)

        sample_fn = jax.jit(sample)
        float(sample_fn(jnp.float32(0.0), state, key))  # warm + compile

        def make_runner(iters: int):
            def run():
                carry = jnp.float32(0.0)
                for i in range(iters):
                    carry = sample_fn(carry, state, prng.for_step(key, i))
                float(carry)

            return run

        meas = measure_rate(make_runner, DISPATCH_ITERS, rtt_probe)
        if meas.get("invalid"):
            return meas
        meas["videos_per_sec_per_chip"] = (
            INFER_BATCH * meas["units_per_sec"] / n_chips
        )
        return meas

    disp_infer = _stage("dispatched_infer", _disp_infer_stage, est_s=120)
    if disp_infer is not None:
        RESULTS["dispatched_videos_per_sec_per_chip"] = round(
            disp_infer["videos_per_sec_per_chip"], 2
        )
        if RESULTS["value"]:
            # ratio of the headline (device-side scan) rate to the
            # python-dispatch-loop rate; >>1 means the host<->chip link
            # (here: a network tunnel) bounds dispatched serving, not the
            # chip itself
            RESULTS["device_vs_dispatch_ratio"] = round(
                RESULTS["value"] / disp_infer["videos_per_sec_per_chip"], 1
            )


# --------------------------------------------------------------------------
# legacy probe-tool API (tools/probe_*.py, tools/conv_microbench.py)
# --------------------------------------------------------------------------

def _scalar_rtt(n: int = RTT_PROBES) -> float:
    """Min of ``n`` scalar round-trip probes (pre-round-5 name; the probe
    tools consume a single rtt float for their own timing math)."""
    return min_rtt(_make_rtt_probe(), n)


def _scan_steps(b: int) -> int:
    """Pre-round-5 name for the initial scan length heuristic."""
    return _initial_steps(b)


def _train_rate(gan, state, key, device_batch, steps, rtt):
    """Pre-round-5 signature: (iters_per_sec, flops_per_step).

    ``steps``/``rtt`` are accepted for compatibility but superseded by the
    hardened core, which re-probes the RTT adjacent to each timed rep and
    grows the scan length until the work dominates it. Raises RuntimeError
    instead of ever returning a clamped/fictional rate (the r04 failure)."""
    del steps, rtt
    b = int(next(iter(device_batch.values())).shape[0])
    meas, flops = _train_measurement(
        gan, state, key, device_batch, b, _make_rtt_probe()
    )
    if meas.get("invalid"):
        raise RuntimeError(f"no valid measurement: {meas['invalid']}")
    return meas["units_per_sec"], flops


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(BUDGET_S))
    try:
        main()
    except Exception:  # emit whatever was measured before dying
        import traceback

        traceback.print_exc()
        RESULTS["partial"] = "main_exception"
    # the epilogue must never cost us the JSON line: a crash in
    # validation/comparison marks the run errored (rc=1) but still emits
    try:
        bad = validate_results(RESULTS)
        if bad:
            _note(f"plausibility violations: {bad}")
        compare_previous(RESULTS)
    except Exception:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        RESULTS.setdefault("errors", {})["epilogue"] = (
            "validate/compare failed; see stderr"
        )
    _emit_and_exit(final_rc(RESULTS))
