"""Inverse-problem calibration through the solver (validation/calibration).

Gates the adjoint-Newton recovery of the BGK relaxation time from one
observed Taylor-Green snapshot; the companion gravity demo shares the
same machinery and runs via
``python -m multiphase_lbm_tpu.validation.calibration``.
"""
import numpy as np

from multiphase_lbm_tpu.validation import calibration as cal


def test_recover_tau_from_observed_decay():
    tau = cal.calibrate_tau(n=32, steps=60, tau_true=0.8, tau0=0.65,
                            iters=6)
    np.testing.assert_allclose(tau, 0.8, atol=1e-6)
