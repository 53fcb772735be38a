"""Analytic Poiseuille + Womersley channel gates for the core D2Q9 stack
(validation/womersley.py).

The reference derives Umax/Re/Wo as diagnostics
(PulsatileBloodFlow2D.h:168-170) but never validates a solver against
the closed-form solutions; these tests do, for the core MRT + Guo
forcing + on-site bounce-back combination (steady parabola to 0.3%,
Wo=5 oscillatory profile to 2% — measured 0.098% / 0.87%)."""
from multiphase_lbm_tpu.validation import womersley as w


def test_poiseuille_and_womersley_profiles_match_analytic():
    err_s, err_o = w.run_validation(verbose=False)
    assert err_s < w.GATE_STEADY, err_s
    assert err_o < w.GATE_OSC, err_o


def test_pulsatile_module_quirk_off_matches_analytic():
    """Round-5 gate: the pulsatile MODULE's physics mode
    (momentum_quirk=False → true moments + standard collide-stream input
    + consistent MRT basis + Zou/He corner closures) runs its rigid
    channel for 10 beats through the full Zou/He + Bouzidi machinery and
    matches steady Poiseuille, the Womersley profile shape, and the
    fundamental-mode momentum budget.  The reference treatment diverges
    (NaN < 600 steps) on this exact configuration — see the module
    docstring findings."""
    errs = w.run_module_validation(verbose=False)
    for k, gate in w.MODULE_GATES.items():
        assert errs[k] < gate, (k, errs[k], gate)
