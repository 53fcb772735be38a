"""Multi-chip decomposition tests on the 8-device virtual CPU mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiphase_lbm_tpu.models import shan_chen as sc
from multiphase_lbm_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    p = sc.SCParams()
    nx, ny = 64, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float64)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)
    return p, f, fluid


def test_auto_sharding_matches_single_device(setup, eight_devices):
    p, f, fluid = setup
    ref = sc.run(f, fluid, p, 10)

    mesh = sh.make_mesh(4)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)
    out = sc.run(f_sh, fluid_sh, p, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_halo_step_matches_global_step(setup, eight_devices):
    p, f, fluid = setup
    mesh = sh.make_mesh(4)

    def gstep(fa, fl):
        return sc.step(fa, fl, p)

    halo_step = sh.make_halo_step(gstep, mesh, width=2,
                                  state_leading=(1, 0), n_state=1)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)

    ref = f
    out = f_sh
    for _ in range(5):
        ref = sc.step(ref, fluid, p)
        out = halo_step(out, fluid_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_halo_step_2d_mesh(setup, eight_devices):
    p, f, fluid = setup
    mesh = sh.make_mesh(8, shape=(2, 4), axis_names=("y", "x"))

    def gstep(fa, fl):
        return sc.step(fa, fl, p)

    halo_step = sh.make_halo_step(gstep, mesh, width=2,
                                  state_leading=(1, 0), n_state=1)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)
    ref = sc.step(sc.step(f, fluid, p), fluid, p)
    out = halo_step(halo_step(f_sh, fluid_sh), fluid_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


# ── fused multi-chip paths: each big interpret-mode shard_map compile runs
# in its OWN process (multiphase_lbm_tpu/validation/multichip_check.py).
# Round 2 ran these in-process and the XLA CPU compiler segfaulted
# nondeterministically (native stack overflow) once a long pytest run had
# accumulated hundreds of executables — which also forced the wide-exchange
# check down to nsub=3.  Process isolation removes the failure mode and
# lets the check run the PRODUCTION nsub=5.
def _run_check(name, **kwargs):
    import subprocess
    import sys as _sys

    args = [f"{k}={v}" for k, v in kwargs.items()]
    r = subprocess.run(
        [_sys.executable, "-m",
         "multiphase_lbm_tpu.validation.multichip_check", name, *args],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"


def test_fused_hcz_multichip_wide_exchange_production_nsub():
    """Production nsub=5 multi-chip HCZ: 4-device y-sharded shard_map with
    the reach·nsub-parameterized halo exchange matches single-device
    stepping."""
    _run_check("hcz_wide", n_devices=4, nsub=5)


def test_fused_hcz3d_multichip():
    """3D HCZ kernel under z-sharded shard_map halo exchange (nsub=2,
    6-slab exchange) matches single-device stepping."""
    _run_check("hcz3d", n_devices=4)


def test_fused_fakhari_multichip():
    """Merged Fakhari kernel under shard_map halo exchange (nsub=2,
    16-row exchange) matches the XLA single-device path."""
    _run_check("fakhari", n_devices=4)


def test_fused_scrt_multichip():
    """SC-RT transposed kernel under x-ring shard_map exchange (nsub=2)
    matches the XLA model path."""
    _run_check("scrt", n_devices=4, nsub=2)


def test_fused_sc_2d_mesh():
    """2D-mesh (y×x) fused SC: both spatial axes cut, x-first/y-second halo
    exchange fills corner cells via the diagonal neighbor in two hops;
    matches the XLA model path (SURVEY §5.7 8192²-scale obligation)."""
    _run_check("sc2d", n_devices=4, nsub=2)


def test_fused_hcz_2d_mesh():
    """2D-mesh (y×x) fused HCZ: reach-3 stencils crossing both cut axes
    match the single-device fused kernel."""
    _run_check("hcz2d", n_devices=4, nsub=2)


def test_fused_combustion_multichip():
    """Reactive-combustion striped kernel in halo mode under y-sharded
    shard_map exchange (nsub=2) matches the XLA oracle, with the obstacle
    block and wall/inlet/outlet BC rows split across shards."""
    _run_check("combustion", n_devices=4, nsub=2)


def test_dryrun_multichip_is_relay_proof():
    """The driver gate (``__graft_entry__.dryrun_multichip``) must complete
    in a fresh process with the axon (TPU) default env intact — i.e. without
    ever initializing the default backend.  Round-3 regression: a
    ``jax.devices()`` call on the axon backend before the CPU fallback hung
    forever during a relay outage (MULTICHIP_r03.json rc=124)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [_sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert r.returncode == 0, f"dryrun failed:\n{r.stdout}\n{r.stderr}"
    assert "fused combustion shard_map path OK" in r.stdout
