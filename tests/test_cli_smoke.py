"""CLI smoke tests: every problem wired in runners/coolbm.py runs
end-to-end (config parse → driver → model step → VTK/.dat output) at a
tiny lattice for 2 steps.

Catches wiring regressions in the 500-line runners/apps.py surface that
the model-level tests can't see (argument plumbing, config key reads,
output-file naming).  The combustion problem has its own deeper CLI
tests (tests/test_combustion.py) and is excluded here;
PulsatileBloodFlow2D takes --N instead of a config and gets its own
test below.
"""
import os

import pytest

from multiphase_lbm_tpu.runners import coolbm

# problem -> (shipped config to shrink, expected output file fragments)
CASES = {
    "laplace2D_sc": ("sc_Laplace2D.txt", ["sol_", "mass.dat"]),
    "contactAngle2D": ("sc_contactAngle2D.txt", ["contact_angle.dat"]),
    "twoLayeredFlow2D_sc": ("sc_twoLayeredFlow2D.txt", ["sol_"]),
    "RayleighTaylor2D_sc": ("sc_RayleighTaylor2D.txt", ["sol_"]),
    "Young_Laplace2D": ("young_laplace2D.txt", ["sol_", "energy.dat"]),
    "rayleighTaylor2D": ("pf_rayleighTaylor2D.txt",
                         ["spike_bubble_position.dat"]),
    "twoLayeredFlow2D": ("pf_twoLayeredFlow2D.txt", ["density_probe.dat"]),
    "laplace3D": ("pf_laplace3D.txt", ["sol_"]),
}

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _tiny_config(src, dst, n=16):
    lines = []
    for line in open(src):
        key = line.split()[0] if line.strip() and not line.startswith("#") \
            else None
        if key == "N":
            line = f"N    {n}\n"
        lines.append(line)
    with open(dst, "w") as fh:
        fh.writelines(lines)


def test_pulsatile_cli_runs_end_to_end(tmp_path):
    outdir = tmp_path / "out"
    rc = coolbm.main(["PulsatileBloodFlow2D", "--N", "16",
                      "--outdir", str(outdir), "--steps", "2"])
    assert rc == 0
    produced = os.listdir(outdir)
    assert any(name.startswith("sol_") for name in produced), produced


@pytest.mark.parametrize("problem", sorted(CASES))
def test_problem_runs_end_to_end(problem, tmp_path):
    config_name, expected = CASES[problem]
    cfg = tmp_path / "config.txt"
    _tiny_config(os.path.join(CONFIG_DIR, config_name), cfg)
    outdir = tmp_path / "out"
    rc = coolbm.main([problem, "--config", str(cfg),
                      "--outdir", str(outdir), "--steps", "2"])
    assert rc == 0
    produced = os.listdir(outdir)
    for frag in expected:
        assert any(frag in name for name in produced), (
            f"{problem}: no output matching {frag!r} in {produced}")
