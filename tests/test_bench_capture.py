"""Outage-tolerant headline-bench capture (round-5 obligations).

The axon relay has multi-hour outages; two driver captures (BENCH_r03/r04)
were lost to bench.py's old single-shot 240 s give-up.  These tests pin the
replacement behavior without touching any backend:

* a forced-unreachable run (``MLBM_SIMULATE_OUTAGE``) still emits one JSON
  line, and that line carries a ``last_good`` object naming the newest
  hardware-verified headline (value/date/commit scanned from the green
  ``BENCH_r*.json`` artifacts) — a red capture must convey the current
  verified number, matching the reference's always-yields-a-number bench
  protocol (CooLBM_MRT_combustion.cpp:4376-4380, 415-426);
* the kernel config used by the bench resolves from the committed autotune
  table (``ops/tuned.json``) with CLI flags overriding — the tuner must
  have a production consumer.
"""
import argparse
import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)          # no jax import at module level
    return mod


def test_simulated_outage_emits_last_good():
    env = dict(os.environ, MLBM_SIMULATE_OUTAGE="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--probe-budget", "3", "--probe-every", "1"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
    assert r.returncode == 2
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert "unreachable" in rec["error"]
    lg = rec["last_good"]
    assert lg is not None, "error JSON must carry the last verified number"
    assert lg["value"] > 0
    assert lg["source"].startswith("BENCH_r")
    # the newest GREEN artifact wins, not merely the newest artifact
    greens = []
    import glob
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as fh:
            parsed = (json.load(fh).get("parsed") or {})
        if parsed.get("value"):
            greens.append((os.path.basename(path), parsed["value"]))
    assert (lg["source"], lg["value"]) == greens[-1]


def test_probe_retry_recovers_mid_wait(tmp_path):
    """A relay that returns mid-wait lets the bench proceed: flip the
    probe's forced-failure flag off between retries via a sentinel file
    consumed by a stub probe (we only test the wait loop, not the bench)."""
    bench = _load_bench()
    calls = {"n": 0}

    def fake_probe(timeout_s=75.0):
        calls["n"] += 1
        return calls["n"] >= 3            # down twice, then up

    orig = bench._probe_subprocess
    bench._probe_subprocess = fake_probe
    try:
        assert bench._wait_for_backend(budget_s=60.0, every_s=0.01)
    finally:
        bench._probe_subprocess = orig
    assert calls["n"] == 3


def test_resolve_kernel_config_tuned_table_and_cli_override(tmp_path):
    bench = _load_bench()
    from multiphase_lbm_tpu.ops import autotune

    shape, dtype = (9, 64, 64), "float32"
    table_path = str(tmp_path / "tuned.json")
    autotune.save_table(
        table_path, "pallas_sc", shape, dtype,
        [{"config": {"tile": 32, "nsub": 4, "halo": 24},
          "mlups": 123.0, "ms_per_step": 1.0, "spread": 0.01}])

    def ns(**kw):
        return argparse.Namespace(tile=None, nsub=None, halo=None,
                                  tuned=table_path, **kw)

    cfg, source = bench._resolve_kernel_config(ns(), shape, dtype)
    assert cfg == {"tile": 32, "nsub": 4, "halo": 24}
    assert "tuned table" in source

    # explicit CLI flag overrides the table entry
    args = ns()
    args.nsub = 10
    cfg, source = bench._resolve_kernel_config(args, shape, dtype)
    assert cfg == {"tile": 32, "nsub": 10, "halo": 24}
    assert "CLI override" in source

    # unknown shape -> builtin defaults
    cfg, source = bench._resolve_kernel_config(ns(), (9, 128, 128), dtype)
    assert cfg == {"tile": 128, "nsub": 8, "halo": 16}
    assert source == "builtin defaults"

    # missing table -> builtin defaults, no raise
    args = ns()
    args.tuned = str(tmp_path / "absent.json")
    cfg, source = bench._resolve_kernel_config(args, shape, dtype)
    assert cfg == {"tile": 128, "nsub": 8, "halo": 16}


def test_slope_protocol_cancels_constant_overhead():
    """measure_mlups_slope recovers the true per-step rate when every call
    carries a large constant cost (the ~30 ms relay dispatch+readback that
    made round-5 one-shot numbers lie by up to 35x: combustion 68 vs 2399
    true MLUPS)."""
    import numpy as np
    from multiphase_lbm_tpu.utils import profiling

    per_step_s, overhead_s = 1e-4, 30e-3
    clock = [0.0]

    def fake_perf_counter():
        return clock[0]

    class FakeOut:
        def ravel(self):
            return np.zeros(8)

    def make_step(n):
        def step(_state):
            clock[0] += overhead_s + n * per_step_s
            return FakeOut()
        return step

    orig = profiling.time.perf_counter
    profiling.time.perf_counter = fake_perf_counter
    try:
        mlups, ms_per_step, spread, overhead_ms, _ = (
            profiling.measure_mlups_slope(
                make_step, FakeOut(), 100, 300, nelem=1_000_000, reps=3))
    finally:
        profiling.time.perf_counter = orig
    assert abs(ms_per_step - per_step_s * 1e3) < 1e-9
    assert abs(overhead_ms - overhead_s * 1e3) < 1e-6
    assert abs(mlups - 1_000_000 / per_step_s / 1e6) < 1e-6
    assert spread == 0.0
