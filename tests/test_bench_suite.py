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
