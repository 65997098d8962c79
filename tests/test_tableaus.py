"""Cross-check tableau constants against SciPy's published coefficient data.

Both this library and SciPy transcribe Hairer's DOP853/RK23 constants; exact
agreement guards against transcription errors in tableaus.py.
"""
import numpy as np
from scipy.integrate._ivp import dop853_coefficients as sc853
from scipy.integrate._ivp import rk as scrk

from ivp_tpu import tableaus as tab


def test_dop853_stage_coefficients():
    A = sc853.A  # (16, 16) incl. the 3 dense-output stages
    C = sc853.C
    for i, row in enumerate(tab.DOP853_A):
        for j, v in (row.items() if isinstance(row, dict) else enumerate(row)):
            np.testing.assert_allclose(v, A[i + 1, j], rtol=0, atol=1e-14)
    np.testing.assert_allclose(tab.DOP853_C[:12], C[:12], rtol=0, atol=1e-14)
    np.testing.assert_allclose([tab.DOP853_C14, tab.DOP853_C15, tab.DOP853_C16],
                               C[13:16], rtol=0, atol=1e-14)


def test_dop853_b_and_error_weights():
    B = sc853.B
    for j, v in tab.DOP853_B.items():
        np.testing.assert_allclose(v, B[j], rtol=0, atol=1e-14)
    # scipy's E5 = B - b_hat5 (5th order error weights, last entry h-scaled)
    E5 = sc853.E5
    for j in range(12):
        np.testing.assert_allclose(tab.DOP853_ER.get(j, 0.0), E5[j],
                                   rtol=0, atol=1e-12)
    # 3rd-order companion: E3 = B - BH (scipy stores E3 = B with bhh removed)
    E3 = sc853.E3
    bh1, bh2, bh3 = tab.DOP853_BH
    recon = np.zeros(13)
    for j, v in tab.DOP853_B.items():
        recon[j] = v
    recon[0] -= bh1
    recon[8] -= bh2
    recon[11] -= bh3
    np.testing.assert_allclose(recon[:12], E3[:12], rtol=0, atol=1e-12)


def test_dop853_dense_rows():
    D = sc853.D  # (4, 16)
    for r in range(4):
        row = tab.DOP853_D[4 + r]
        for j in range(16):
            np.testing.assert_allclose(row.get(j, 0.0), D[r, j],
                                       rtol=0, atol=1e-10)


def test_dop853_extra_stage_rows():
    A = sc853.A
    for i, row in ((13, tab.DOP853_A14), (14, tab.DOP853_A15),
                   (15, tab.DOP853_A16)):
        for j, v in row.items():
            np.testing.assert_allclose(v, A[i, j], rtol=0, atol=1e-14)


def test_rk23_tableau():
    np.testing.assert_allclose(tab.RK23_B, scrk.RK23.B, rtol=0, atol=0)
    np.testing.assert_allclose(tab.RK23_C[1:3], scrk.RK23.C[1:3], rtol=0, atol=0)
    # scipy's E is the embedded difference with an extra FSAL entry
    np.testing.assert_allclose(tab.RK23_E, scrk.RK23.E, rtol=0, atol=1e-16)


def test_dopri5_matches_scipy_rk45():
    A = scrk.RK45.A
    for i, row in enumerate(tab.DOPRI5_A[:5]):
        np.testing.assert_allclose(row, A[i + 1, :len(row)], rtol=0, atol=1e-15)
    np.testing.assert_allclose(tab.DOPRI5_A[5], scrk.RK45.B, rtol=0, atol=1e-15)
    # scipy stores b_hat - b; Hairer's convention is b - b_hat (sign-flipped;
    # irrelevant for the RMS error norm)
    np.testing.assert_allclose(tab.DOPRI5_E, -scrk.RK45.E, rtol=0, atol=1e-15)
