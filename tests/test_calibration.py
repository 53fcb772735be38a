"""Inverse-problem calibration through the solver (validation/calibration).

Gates the adjoint-Newton recovery of the BGK relaxation time from one
observed Taylor-Green snapshot and of the SC-RT body force from one
density field (reduced shapes; the full demos run via
``python -m multiphase_lbm_tpu.validation.calibration``).
"""
import numpy as np

from multiphase_lbm_tpu.validation import calibration as cal


def test_recover_tau_from_observed_decay():
    tau = cal.calibrate_tau(n=32, steps=60, tau_true=0.8, tau0=0.65,
                            iters=6)
    np.testing.assert_allclose(tau, 0.8, atol=1e-6)


def test_recover_gravity_from_observed_density():
    g = cal.calibrate_gravity(nx=16, ny=32, steps=12, g_true=-1.25e-5,
                              g0=-0.5e-5, iters=4)
    np.testing.assert_allclose(g, -1.25e-5, rtol=1e-6)
