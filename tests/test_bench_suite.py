"""CPU smoke gate for the benchmark suite harness (runners/bench_suite).

Runs one cheap workload in --quick (interpreter, tiny shape) mode: checks
the registry → build → timed-protocol plumbing end to end, not the
numbers (those are measured serially on the chip — BASELINE.md).
"""
import json

from multiphase_lbm_tpu.runners import bench_suite


def test_quick_workload_runs(capsys):
    rc = bench_suite.main(["sc", "--quick"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["workload"] == "sc" and rec["mlups"] > 0
    assert "error" not in rec


def test_registry_builds_quick_configs():
    # every quick-capable workload builds without running
    built = [name for name, (build, _) in bench_suite.WORKLOADS.items()
             if build(True, True) is not None]
    assert set(built) == {"sc", "hcz", "hcz3d", "fakhari", "scrt"}


def test_tuned_table_overrides_workload_defaults(tmp_path, monkeypatch):
    """The suite consults the committed autotune winner table; only knobs
    the workload exposes are taken, and a missing/foreign entry leaves the
    BASELINE.md defaults untouched."""
    from multiphase_lbm_tpu.ops import autotune

    path = str(tmp_path / "tuned.json")
    autotune.save_table(
        path, "pallas_hcz", (9, 64, 128), "float32",
        [{"config": {"tile": 16, "nsub": 3, "halo": 8, "exotic_knob": 1},
          "mlups": 50.0, "ms_per_step": 1.0, "spread": 0.0}])
    monkeypatch.setenv("MLBM_TUNED_PATH", path)

    kw = bench_suite._tuned_kw("pallas_hcz", (9, 64, 128), "float32",
                               dict(tile=32, nsub=5, halo=16))
    assert kw == dict(tile=16, nsub=3, halo=8)   # exotic_knob not injected

    kw = bench_suite._tuned_kw("pallas_hcz", (9, 64, 256), "float32",
                               dict(tile=32, nsub=5, halo=16))
    assert kw == dict(tile=32, nsub=5, halo=16)  # shape miss -> defaults

    monkeypatch.setenv("MLBM_TUNED_PATH", str(tmp_path / "absent.json"))
    kw = bench_suite._tuned_kw("pallas_hcz", (9, 64, 128), "float32",
                               dict(tile=32, nsub=5, halo=16))
    assert kw == dict(tile=32, nsub=5, halo=16)  # missing table -> defaults
