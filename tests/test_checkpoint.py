"""Checkpoint/resume tests: reference-format flow restart + full-state npz."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.io import checkpoint as ckpt
from multiphase_lbm_tpu.models import combustion as cb
from multiphase_lbm_tpu.models import pulsatile as pb


def test_flow_field_txt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f = rng.random((9, 12, 17))
    path = tmp_path / "ini_f.dat"
    ckpt.save_flow_field_txt(path, f)
    back = ckpt.load_flow_field_txt(path, q=9)
    np.testing.assert_allclose(back, f, rtol=1e-14)
    # header matches the reference's reader expectations
    head = path.read_text().split()[:3]
    assert head == ["17", "12", "9"]


def test_combustion_warm_start(tmp_path):
    """Converged-flow warm start: save f, restart a new state from it."""
    p = cb.CombustionParams(nx=260, ny=48)
    st = cb.initialize(p)
    st = cb.run(st, p, 300, konv=False)
    path = tmp_path / "ini_f.dat"
    ckpt.save_flow_field_txt(path, st.f)
    f_re = ckpt.load_flow_field_txt(path, q=9)
    st2 = cb.initialize(p, f_restart=f_re)
    np.testing.assert_allclose(np.asarray(st2.f), np.asarray(st.f), rtol=1e-13)
    # restarted run continues identically to continuing the original
    a = cb.run(st, p, 50, konv=False)
    b = cb.run(st2, p, 50, konv=False)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f), rtol=1e-12)


def test_full_state_checkpoint_roundtrip(tmp_path):
    """Any model state pytree (here: the pulsatile NamedTuple with walls,
    geometry, two buffers) round-trips bit-exactly."""
    p = pb.PulsatileParams(nx=101, ny=64)
    st = pb.initialize(p)
    st = pb.run(st, 0, p, 5)
    path = tmp_path / "state.npz"
    ckpt.save_state(path, st, meta={"t": 5, "model": "pulsatile"})
    st2 = ckpt.load_state(path, st)
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_meta(path)["t"] == 5
    # resume produces identical trajectories
    a = pb.run(st, 5, p, 5)
    b = pb.run(pb.PulsatileState(*[jnp.asarray(x) for x in st2]), 5, p, 5)
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))


def test_sharded_state_checkpoint_resume(tmp_path, eight_devices):
    """Checkpoint a multi-chip (sharded) run and resume it — on the same
    mesh AND on a different mesh size — matching the unsharded
    trajectory bit-exactly.  Exercises the §5.4 checkpoint obligation
    against the §5.7 scale axis: save_state gathers the addressable
    shards to host numpy; resume re-shards onto whatever mesh the new
    run uses (elastic restart across chip counts, which the reference's
    single-process design cannot express)."""
    from multiphase_lbm_tpu.models import shan_chen as sc
    from multiphase_lbm_tpu.parallel import sharding as sh

    p = sc.SCParams()
    nx, ny = 64, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float64)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)

    def halo_step_on(n_dev):
        mesh = sh.make_mesh(n_dev)
        step = sh.make_halo_step(lambda fa, fl: sc.step(fa, fl, p), mesh,
                                 width=2, state_leading=(1, 0), n_state=1)
        return mesh, step

    mesh4, step4 = halo_step_on(4)
    out = sh.shard_lattice(f, mesh4, leading=1)
    fl4 = sh.shard_lattice(fluid, mesh4, leading=0)
    for _ in range(3):
        out = step4(out, fl4)
    path = tmp_path / "sharded.npz"
    ckpt.save_state(path, out, meta={"t": 3})

    ref = f
    for _ in range(6):
        ref = sc.step(ref, fluid, p)

    # resume on the same mesh and on a 2-device mesh
    for n_dev in (4, 2):
        mesh, step = halo_step_on(n_dev)
        res = sh.shard_lattice(jnp.asarray(ckpt.load_state(path, out)),
                               mesh, leading=1)
        fl = sh.shard_lattice(fluid, mesh, leading=0)
        for _ in range(3):
            res = step(res, fl)
        np.testing.assert_allclose(np.asarray(res), np.asarray(ref),
                                   atol=1e-13)
