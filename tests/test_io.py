"""I/O layer tests: config parsing, VTK schema round-trip + golden parity."""
import os
from pathlib import Path

import numpy as np
import pytest

from multiphase_lbm_tpu.io import config as cfg
from multiphase_lbm_tpu.io import vtk
from multiphase_lbm_tpu.io.loggers import DatLogger, MlupsClock
from multiphase_lbm_tpu.models.shan_chen import SCParams

REF_VTK_DIR = Path(
    "/root/reference/Abbashub LBM/"
    "out_single-phase fluid flow through a compliant vessel")


@pytest.mark.skipif(not Path("/root/reference").exists(),
                    reason="reference tree absent")
def test_parse_reference_configs():
    base = Path("/root/reference")
    c1 = cfg.load_config(
        base / "shan-chen single component model/apps/Config_Files/config_Laplace2D.txt")
    assert c1["TT0"] == "0.875"
    assert c1["N"] == "100"
    assert "tau" not in c1  # commented out in that file
    c2 = cfg.load_config(
        base / "Phase field model/apps/Config_Files/config_rayleighTaylor2D.txt")
    assert float(c2["gravity"]) == -6.25e-6
    assert int(c2["N"]) == 256


def test_coerce_into_dataclass():
    params, unknown = cfg.coerce_into(
        {"TT0": "0.9", "rhol": "0.21", "bogus": "1"}, SCParams())
    assert params.TT0 == 0.9 and params.rhol == 0.21
    assert unknown == ["bogus"]


def test_lb_parameters_match_reference_formulas():
    nu, omega, dx, dt = cfg.lb_parameters(0.01, 100, 6.0)
    assert np.isclose(nu, 0.01 * 100 / 6.0)
    assert np.isclose(omega, 1.0 / (3 * nu + 0.5))
    assert np.isclose(dx, 0.01) and np.isclose(dt, 1e-4)


def test_vtk_roundtrip(tmp_path):
    ny, nx = 5, 7
    rho = np.arange(ny * nx, dtype=float).reshape(ny, nx) * 0.125
    flag = np.zeros((ny, nx), dtype=int)
    flag[0] = 1
    u = np.stack([rho * 0.01, -rho * 0.02])
    w = vtk.VtkWriter(nx, ny, iteration=42)
    w.scalar("Density", rho).scalar("Flag", flag, as_int=True).vector("velocity", u)
    path = tmp_path / vtk.sol_filename(42)
    w.write(path)
    back = vtk.read_vtk_fields(path)
    assert back["DIMENSIONS"] == (nx, ny, 1)
    np.testing.assert_allclose(back["Density"], rho, rtol=1e-6)
    np.testing.assert_array_equal(back["Flag"], flag)
    np.testing.assert_allclose(back["velocity"][:, 0].reshape(ny, nx), u[0], rtol=1e-5)


@pytest.mark.skipif(not REF_VTK_DIR.exists(), reason="reference artifact absent")
def test_reader_parses_reference_golden_vtk():
    """The archived pulsatile run is the byte-schema ground truth."""
    path = REF_VTK_DIR / "sol_0000000.vtk"
    fields = vtk.read_vtk_fields(path)
    assert fields["DIMENSIONS"] == (621, 64, 1)
    for name in ("P", "Ux", "Uy", "Flag"):
        assert name in fields, name
    assert fields["P"].shape == (64, 621)
    P = fields["P"]
    assert np.isfinite(P).all() and np.abs(P).max() < 1.0


@pytest.mark.skipif(not REF_VTK_DIR.exists(), reason="reference artifact absent")
def test_writer_schema_matches_reference_header(tmp_path):
    ref_lines = (REF_VTK_DIR / "sol_0000000.vtk").read_text().splitlines()
    w = vtk.VtkWriter(621, 64, iteration=0, spacing=1.0 / 621)
    z = np.zeros((64, 621))
    w.scalar("P", z).scalar("Ux", z).scalar("Uy", z).scalar("Flag", z.astype(int), as_int=True)
    ours = w.dumps().splitlines()
    # same header block (first 10 lines) except numeric formatting of SPACING
    for i in range(8):
        if ref_lines[i].startswith("SPACING"):
            assert ours[i].startswith("SPACING")
        else:
            assert ref_lines[i].strip() == ours[i].strip(), (i, ref_lines[i], ours[i])
    # same field declaration order
    ref_decls = [l for l in ref_lines if l.startswith(("SCALARS", "VECTORS"))]
    our_decls = [l for l in ours if l.startswith(("SCALARS", "VECTORS"))]
    assert ref_decls == our_decls


def test_dat_logger_and_mlups(tmp_path):
    p = tmp_path / "energy.dat"
    with DatLogger(p) as log:
        log.log(0, 1.5e-8)
        log.log(100, 2.5e-8)
    rows = [l.split() for l in p.read_text().splitlines()]
    assert len(rows) == 2 and float(rows[1][1]) == 2.5e-8

    clock = MlupsClock(nelem=1000)
    clock.tick(10)
    assert clock.mlups > 0
    assert "MLUPS" in clock.report()


def test_driver_async_vtk_matches_sync_bytes(tmp_path):
    """Async dumps (device->host copy started eagerly, format+write on the
    worker) must produce byte-identical files to the synchronous path, be
    fully on disk after finish(), and surface worker errors there."""
    import jax.numpy as jnp
    import pytest

    from multiphase_lbm_tpu.runners.common import Driver
    from multiphase_lbm_tpu.io.vtk import sol_filename

    ny, nx = 12, 16
    rho = jnp.arange(ny * nx, dtype=jnp.float32).reshape(ny, nx) / 7.0
    u = jnp.stack([rho * 0.5, -rho])
    flag = (rho > 3.0).astype(jnp.int32)
    fields = dict(scalars=[("Density", rho)], vectors=[("velocity", u)],
                  int_scalars=[("Flag", flag)])

    d_sync = Driver(tmp_path / "sync", nx * ny, vtk_freq=1, async_io=False)
    d_async = Driver(tmp_path / "async", nx * ny, vtk_freq=1)
    for it in (0, 27, 54, 81):          # > the in-flight bound of 2
        d_sync.write_vtk(it, nx, ny, **fields)
        d_async.write_vtk(it, nx, ny, **fields)
    d_sync.finish()
    d_async.finish()
    for it in (0, 27, 54, 81):
        a = (tmp_path / "async" / sol_filename(it)).read_bytes()
        s = (tmp_path / "sync" / sol_filename(it)).read_bytes()
        assert a == s

    # a failing worker write must raise at finish, not vanish
    d_bad = Driver(tmp_path / "bad", nx * ny, vtk_freq=1)
    d_bad.outdir = tmp_path / "bad" / "missing-subdir"   # unwritable target
    d_bad.write_vtk(0, nx, ny, **fields)
    with pytest.raises(Exception):
        d_bad.finish()
