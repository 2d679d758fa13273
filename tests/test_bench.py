"""Unit tests for bench.py's timing math — with a fake clock, on CPU.

BENCH_r04.json recorded 5.12e12 videos/s with rc=0 because a one-shot
mean-of-5 RTT probe through a cold tunnel (2,918 ms) exceeded every warm
stage's elapsed time and a ``max(1e-9, elapsed - rtt)`` clamp turned each
stage into ``steps / 1e-9`` (VERDICT.md round 4). That failure was testable
without a TPU; these tests pin the hardened behavior:

- RTT is the min of adjacent probes (one cold outlier cannot poison it),
- the timed work is grown until it dominates the RTT,
- impossible measurements become explicit ``invalid`` markers + rc != 0,
  never fictional rates.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    compare_previous,
    final_rc,
    load_previous_bench,
    measure_rate,
    min_rtt,
    validate_results,
)


class FakeTunnel:
    """Deterministic host<->device tunnel simulator driving a fake clock.

    ``probe()`` consumes ``probe_values`` (then ``probe_default``) — the
    RTT the *probe* observes. A runner's blocking fetch costs
    ``runner_rtt`` plus ``units x per_unit`` of device work.
    """

    def __init__(self, runner_rtt=0.3, per_unit=0.1, probe_values=None,
                 probe_default=None):
        self.t = 0.0
        self.runner_rtt = runner_rtt
        self.per_unit = per_unit
        self.probe_values = list(probe_values or [])
        self.probe_default = (
            probe_default if probe_default is not None else runner_rtt
        )
        self.compiles = 0

    def clock(self):
        return self.t

    def probe(self):
        v = (self.probe_values.pop(0) if self.probe_values
             else self.probe_default)
        self.t += v
        return v

    def make_runner(self, units):
        self.compiles += 1

        def run():
            self.t += self.runner_rtt + units * self.per_unit

        return run

    def measure(self, initial_units=4, **kw):
        return measure_rate(
            self.make_runner, initial_units, self.probe,
            clock=self.clock, **kw,
        )


class TestMeasureRate:
    def test_converges_to_true_rate(self):
        # true rate = 1 / per_unit = 10 units/s; warm tunnel rtt 0.3 s
        env = FakeTunnel(runner_rtt=0.3, per_unit=0.1)
        out = env.measure(initial_units=4)
        assert "invalid" not in out
        assert abs(out["units_per_sec"] - 10.0) < 0.01
        # work was grown until elapsed >= 10x rtt
        assert out["units"] * 0.1 + 0.3 >= 10 * 0.3
        assert out["spread"] == 0.0
        assert len(out["reps_net_s"]) == 3

    def test_min_rtt_ignores_cold_outlier(self):
        # first probe is a 3 s cold-tunnel outlier; min-of-N must use 0.3
        env = FakeTunnel(runner_rtt=0.3, per_unit=0.1,
                         probe_values=[3.0], probe_default=0.3)
        out = env.measure(initial_units=4)
        assert "invalid" not in out
        assert out["rtt_s"] == 0.3
        assert abs(out["units_per_sec"] - 10.0) < 0.01

    def test_r04_scenario_yields_invalid_not_fiction(self):
        # The BENCH_r04 failure shape: the probe persistently over-measures
        # (2.9 s) while real work is tiny — the old code emitted
        # steps / 1e-9; the new code must refuse to report a rate.
        env = FakeTunnel(runner_rtt=0.3, per_unit=1e-4,
                         probe_default=2.9)
        out = env.measure(initial_units=20, max_units=4096)
        assert out.get("invalid"), out
        assert "units_per_sec" not in out

    def test_stale_rtt_only_biases_when_work_dominates(self):
        # Same stale 2.9 s probe, but enough per-unit work exists: the
        # adaptive grow reaches dominance and the reported rate is within
        # ~10% of truth (20 units/s) instead of off by 1e9.
        env = FakeTunnel(runner_rtt=0.3, per_unit=0.05, probe_default=2.9)
        out = env.measure(initial_units=20)
        assert "invalid" not in out
        assert 18.0 < out["units_per_sec"] < 22.0

    def test_elapsed_below_rtt_in_reps_is_invalid(self):
        # adaptation sees tiny probes (passes dominance trivially); the rep
        # probes then exceed the run's elapsed => refuse, don't clamp
        env = FakeTunnel(runner_rtt=0.12, per_unit=0.0,
                         probe_values=[0.01] * 5, probe_default=0.5)
        out = env.measure(initial_units=1)
        assert out.get("invalid"), out
        assert "timed reps" in out["invalid"]
        assert "units_per_sec" not in out

    def test_zero_work_never_divides_by_zero(self):
        env = FakeTunnel(runner_rtt=0.3, per_unit=0.0, probe_default=0.3)
        out = env.measure(initial_units=1, max_units=8)
        assert out.get("invalid")

    def test_min_rtt_is_min(self):
        vals = iter([1.0, 0.2, 0.7, 0.4, 0.9])
        assert min_rtt(lambda: next(vals), 5) == 0.2


# The exact garbage BENCH_r04.json shipped with rc=0 — every value is the
# honest number x 1e9 via the clamp.
R04_GARBAGE = {
    "metric": "infer_videos_per_sec_per_chip",
    "value": 5.12e12,
    "unit": "videos/s",
    "vs_baseline": 5.12e9,
    "train_sweep": {
        "20": {"iters_per_sec": 2e10, "videos_per_sec": 4e11,
               "gflops_per_step": 2235.4, "mfu": 226939471.321},
        "128": {"iters_per_sec": 4e9, "videos_per_sec": 5.12e11,
                "gflops_per_step": 14304.5, "mfu": 290447291.1373},
    },
    "train_iters_per_sec": 2e10,
    "train_mfu": 290447291.1373,
    "dispatched_videos_per_sec_per_chip": 2.56e12,
}

R02_SANE = {
    "metric": "infer_videos_per_sec_per_chip",
    "value": 5401.49,
    "unit": "videos/s",
    "vs_baseline": 5.4015,
    "train_sweep": {
        "20": {"iters_per_sec": 9.79, "videos_per_sec": 195.8,
               "gflops_per_step": 2235.4, "mfu": 0.2276},
        "128": {"iters_per_sec": 5.4, "videos_per_sec": 691.2,
                "gflops_per_step": 14304.5, "mfu": 0.392},
    },
    "train_iters_per_sec": 9.79,
    "train_mfu": 0.392,
}


class TestValidation:
    def test_r04_garbage_is_nulled_and_fails(self):
        results = json.loads(json.dumps(R04_GARBAGE))
        bad = validate_results(results)
        assert bad, "the r04 artifact must trip the plausibility gate"
        assert results["value"] is None
        assert results["vs_baseline"] is None
        assert results["train_mfu"] is None
        assert results["train_sweep"]["20"]["iters_per_sec"] is None
        assert results["train_sweep"]["128"]["mfu"] is None
        assert results["invalid"]
        assert final_rc(results) == 1

    def test_sane_results_pass_with_rc0(self):
        results = json.loads(json.dumps(R02_SANE))
        assert validate_results(results) == []
        assert results["value"] == 5401.49
        assert final_rc(results) == 0

    def test_partial_and_errors_fail_rc(self):
        results = json.loads(json.dumps(R02_SANE))
        results["partial"] = "budget_exhausted"
        assert final_rc(results) == 1
        results = json.loads(json.dumps(R02_SANE))
        results["errors"] = {"train_b64": "RuntimeError"}
        assert final_rc(results) == 1
        assert final_rc({"value": None}) == 1

    def test_mfu_bounds_are_exclusive_zero_inclusive_one(self):
        results = {"value": 100.0, "train_mfu": 1.0}
        assert validate_results(results) == []
        results = {"value": 100.0, "train_mfu": 0.0}
        assert validate_results(results)
        results = {"value": 100.0, "train_mfu": 1.0001}
        assert validate_results(results)


class TestPreviousRound:
    def _write(self, repo, name, parsed):
        (repo / name).write_text(json.dumps({"n": 1, "parsed": parsed}))

    def test_skips_implausible_newest(self, tmp_path):
        self._write(tmp_path, "BENCH_r02.json", R02_SANE)
        self._write(tmp_path, "BENCH_r04.json", R04_GARBAGE)
        name, prev = load_previous_bench(tmp_path)
        assert name == "BENCH_r02.json"
        assert prev["value"] == 5401.49

    def test_accepts_raw_unwrapped_format(self, tmp_path):
        (tmp_path / "BENCH_r03.json").write_text(json.dumps(R02_SANE))
        name, prev = load_previous_bench(tmp_path)
        assert name == "BENCH_r03.json"

    def test_no_files(self, tmp_path):
        assert load_previous_bench(tmp_path) == (None, None)

    def test_compare_flags_large_divergence(self, tmp_path):
        self._write(tmp_path, "BENCH_r02.json", R02_SANE)
        results = {"value": 16000.0, "train_mfu": 0.39}
        compare_previous(results, tmp_path)
        assert results["previous_round"]["file"] == "BENCH_r02.json"
        assert results["previous_round"]["headline_ratio"] > 2.5
        assert results["regression_flags"]
        # and a within-2x result raises no flag
        results = {"value": 5426.0, "train_mfu": 0.389}
        compare_previous(results, tmp_path)
        assert "regression_flags" not in results
        assert results["previous_round"]["headline_ratio"] == 1.005
