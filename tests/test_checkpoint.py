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
