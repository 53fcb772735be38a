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
