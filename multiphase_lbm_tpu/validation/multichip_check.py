"""Standalone multi-chip fused-kernel checks, runnable in a fresh process.

The XLA *CPU* compiler can overflow its native stack when a large
interpret-mode Pallas graph nested in shard_map is compiled late in a
long pytest process (hundreds of accumulated executables).  Running each
big multi-chip compile in its own process removes that failure mode
entirely AND lets the wide-exchange check use the production nsub=5
(round 2 had to pin nsub=3 in-process).

Each subcommand builds an n-device virtual CPU mesh, runs the fused
multi-chip path against the single-device oracle, and exits 0/1.  Used
by tests/test_sharding.py (via subprocess) and by
``__graft_entry__.dryrun_multichip`` (inline — the driver gate is
already a fresh process).

Reference obligation: SURVEY §5.8 (lattice decomposition over the
device mesh is the TPU-native equivalent of the reference's
shared-memory parallelism).
"""
from __future__ import annotations

import os
import sys


def _force_cpu(n_devices: int):
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # share the test suite's persistent compilation cache: these checks
    # run in fresh subprocesses, so without it every run re-pays the big
    # shard_map+interpret-mode compile (30-50 s each)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax


def check_hcz_wide(n_devices: int = 4, nsub: int = 5) -> None:
    """Production-nsub multi-chip HCZ: the reach·nsub-parameterized halo
    exchange (width 5·nsub rows per launch) vs single-device stepping."""
    _force_cpu(max(n_devices, 4))
    import jax.numpy as jnp
    import numpy as np

    from ..models import hcz
    from ..ops import pallas_hcz
    from ..parallel import sharding as sh

    p = hcz.HCZParams()
    nx, ny = 64, 32 * n_devices
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    m32 = fluid.astype(jnp.float32)

    ref_f, ref_g = pallas_hcz.run_fused(f, g, m32, p, nsub, tile=8,
                                        interpret=True, nsub=1)

    mesh = sh.make_mesh(n_devices, axis_names=("y",))
    step = sh.make_fused_hcz_step(mesh, p, tile=8, interpret=True,
                                  nsub=nsub)
    out_f, out_g = step(f, g, m32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=2e-5, atol=1e-6)
    print(f"hcz_wide(n={n_devices}, nsub={nsub}): OK")


def check_hcz3d(n_devices: int = 4) -> None:
    _force_cpu(n_devices)
    import jax.numpy as jnp
    import numpy as np

    from ..models import hcz
    from ..parallel import sharding as sh

    p = hcz.HCZParams(omega=1.0, gravity=0.0, kappa=0.01)
    f, g = hcz.init_droplet_3d(16, 16, 8 * n_devices, p, radius=5.0,
                               dtype=jnp.float32)
    fluid = jnp.ones((8 * n_devices, 16, 16), bool)
    ref = (f, g)
    for _ in range(2):
        ref = hcz.step_3d(ref, fluid, p)

    mesh = sh.make_mesh(n_devices, axis_names=("z",))
    step = sh.make_fused_hcz3d_step(mesh, p, tile=8, interpret=True, nsub=2)
    out_f, out_g = step(f, g)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref[0]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref[1]),
                               rtol=2e-5, atol=1e-6)
    print(f"hcz3d(n={n_devices}): OK")


def check_fakhari(n_devices: int = 4) -> None:
    _force_cpu(n_devices)
    import jax.numpy as jnp
    import numpy as np

    from ..models import fakhari as fk
    from ..parallel import sharding as sh

    p = fk.FakhariParams()
    nx, ny = 64, 32 * n_devices
    h, g, u = fk.init_bubble(nx, ny, p, dtype=jnp.float32)
    ref = (h, g, u)
    for _ in range(2):
        ref = fk.step(ref, p)

    mesh = sh.make_mesh(n_devices, axis_names=("y",))
    step = sh.make_fused_fakhari_step(mesh, p, tile=16, interpret=True,
                                      nsub=2)
    out = step(h, g, u)
    for a, b, name in zip(out, ref, ("h", "g", "u")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    print(f"fakhari(n={n_devices}): OK")


def check_scrt(n_devices: int = 4, nsub: int = 2) -> None:
    """Multi-chip SC Rayleigh-Taylor: the TRANSPOSED state is cut along
    the periodic x axis over a 4-device ring; matches the XLA model
    path after the layout round-trip (walls, mirror force, gravity)."""
    _force_cpu(n_devices)
    import jax.numpy as jnp
    import numpy as np

    from ..models import shan_chen_rt as rt
    from ..ops import pallas_scrt
    from ..parallel import sharding as sh

    p = rt.SCRTParams()
    N = 8 * n_devices
    nx, ny = N, 4 * N + 2
    f = rt.init_interface(nx, ny, p, dtype=jnp.float32)
    fluid = rt.geometry_channel(nx, ny)
    f = f * fluid[None].astype(f.dtype)
    n = 2 * nsub
    ref = rt.run(f, fluid, p, n)

    ny_pad = -(-ny // 128) * 128
    ft = jnp.transpose(f, (0, 2, 1))
    ft = jnp.pad(ft, ((0, 0), (0, 0), (0, ny_pad - ny)))
    mesh = sh.make_mesh(n_devices, axis_names=("x",))
    step = sh.make_fused_scrt_step(mesh, p, ny_phys=ny, tile=8,
                                   interpret=True, nsub=nsub)
    for _ in range(n // nsub):
        ft = step(ft)
    out = jnp.transpose(ft[:, :, :ny], (0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    print(f"scrt(n={n_devices}, nsub={nsub}): OK")


def check_combustion(n_devices: int = 4, nsub: int = 2) -> None:
    """Multi-chip reactive combustion: 4-way y-sharded shard_map with
    ring halo exchange + the halo-mode striped kernel matches the XLA
    oracle, including conjugate-heat links crossing shard boundaries
    (the obstacle block spans shards) and wall/inlet/outlet BC rows
    firing only on the shards that hold them."""
    _force_cpu(n_devices)
    import jax.numpy as jnp
    import numpy as np

    from ..models import combustion as cb
    from ..ops import pallas_combustion as pcmb
    from ..parallel import sharding as sh

    p = cb.CombustionParams(nx=128, ny=16 * n_devices)
    flags, f_solid = cb.build_geometry(p)
    tab = cb.build_static_tables(flags, p)
    st = cb.initialize(p, T_solid=1.8, flags=flags)
    st = cb.run(st, p, 60, konv=False)
    st = cb.run(st, p, 1, konv=True, first_step=True)
    st = cb.run(st, p, 10, konv=True)
    st32 = cb.CombustionState(*(jnp.asarray(a, jnp.float32) for a in st))

    n = 2 * nsub
    ref = cb.run(st32, p, n, konv=True)

    mesh = sh.make_mesh(n_devices, axis_names=("y",))
    step = sh.make_fused_combustion_step(mesh, p, konv=True, tile=16,
                                         interpret=True, nsub=nsub)
    m9, m2 = pcmb.build_mask_inputs(p, flags=flags, f_solid=f_solid)
    args = tuple(st32[:8])
    for _ in range(n // nsub):
        args = step(args, m9, m2)
    sel = np.broadcast_to(tab["is_bulk"] | tab["is_obst"], ref.f.shape)
    for name, got in zip(("f", "gO2", "gCO2", "gT"), args[:4]):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(got)
        np.testing.assert_allclose(b[sel], a[sel], rtol=2e-4, atol=5e-6,
                                   err_msg=name)
    print(f"combustion(n={n_devices}, nsub={nsub}): OK")


def check_sc2d(n_devices: int = 4, nsub: int = 2) -> None:
    """2D-mesh fused SC: the lattice is cut on BOTH axes over a (2, n/2)
    y×x mesh; the x-first/y-second halo exchange fills corners from the
    diagonal neighbor in two hops, and the unmodified halo-mode kernel's
    lane-roll wrap stays inside the cropped x halo.  Compared against the
    single-device XLA model path (walled channel, so mask exchange and
    bounce-back cross both cut axes)."""
    _force_cpu(max(n_devices, 4))
    import jax.numpy as jnp
    import numpy as np

    from ..models import shan_chen as sc
    from ..parallel import sharding as sh

    p = sc.SCParams()
    nx, ny = 64, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)
    m32 = fluid.astype(jnp.float32)

    n = 2 * nsub
    ref = sc.run(f, fluid, p, n)

    mesh = sh.make_mesh(n_devices, shape=(2, n_devices // 2),
                        axis_names=("y", "x"))
    step = sh.make_fused_sc_step_2d(mesh, p, tile=8, interpret=True,
                                    nsub=nsub, halo_x=8)
    out = f
    for _ in range(n // nsub):
        out = step(out, m32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)
    print(f"sc2d(n={n_devices}, nsub={nsub}): OK")


def check_hcz2d(n_devices: int = 4, nsub: int = 2) -> None:
    """2D-mesh fused HCZ (reach-3 stencils crossing both cut axes) vs the
    single-device fused kernel."""
    _force_cpu(max(n_devices, 4))
    import jax.numpy as jnp
    import numpy as np

    from ..models import hcz
    from ..ops import pallas_hcz
    from ..parallel import sharding as sh

    p = hcz.HCZParams()
    nx, ny = 64, 64
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    m32 = fluid.astype(jnp.float32)

    n = 2 * nsub
    ref_f, ref_g = pallas_hcz.run_fused(f, g, m32, p, n, tile=8,
                                        interpret=True, nsub=1)

    mesh = sh.make_mesh(n_devices, shape=(2, n_devices // 2),
                        axis_names=("y", "x"))
    step = sh.make_fused_hcz_step_2d(mesh, p, tile=8, interpret=True,
                                     nsub=nsub, halo_x=8)
    out_f, out_g = f, g
    for _ in range(n // nsub):
        out_f, out_g = step(out_f, out_g, m32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=2e-5, atol=1e-6)
    print(f"hcz2d(n={n_devices}, nsub={nsub}): OK")


CHECKS = {
    "hcz_wide": check_hcz_wide,
    "sc2d": check_sc2d,
    "hcz2d": check_hcz2d,
    "hcz3d": check_hcz3d,
    "fakhari": check_fakhari,
    "scrt": check_scrt,
    "combustion": check_combustion,
}


def main(argv):
    name = argv[0]
    kwargs = {}
    for a in argv[1:]:
        k, v = a.split("=")
        kwargs[k] = int(v)
    CHECKS[name](**kwargs)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
