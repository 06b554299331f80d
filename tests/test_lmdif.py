"""Batched-lmdif parity vs scipy.optimize.leastsq (compiled MINPACK lmdif)."""

import numpy as np
import pytest
from scipy.optimize import leastsq

from kiwi_tpu.invert import lmdif as L


def batched(f):
    return lambda X: np.stack([f(x) for x in X])


def test_enorm_matches_numpy():
    rng = np.random.default_rng(0)
    for scale in (1e-30, 1.0, 1e15):
        v = rng.normal(size=13) * scale
        assert np.isclose(L.enorm(v), np.linalg.norm(v), rtol=1e-12)
    assert L.enorm(np.zeros(4)) == 0.0


def test_qrfac_reconstructs():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(9, 5))
    a, ipvt, rdiag, acnorm = L.qrfac(A)
    # rebuild R and apply the Householder transforms to check A P = Q R
    n = 5
    R = np.zeros((9, n))
    for j in range(n):
        R[:j, j] = a[:j, j]
        R[j, j] = rdiag[j]
    Q = np.eye(9)
    for j in range(n):
        if a[j, j] != 0.0:
            v = np.zeros(9)
            v[j:] = a[j:, j]
            H = np.eye(9) - np.outer(v, v) / a[j, j]
            Q = Q @ H
    np.testing.assert_allclose(Q @ R, A[:, ipvt], atol=1e-10)
    np.testing.assert_allclose(acnorm, np.linalg.norm(A, axis=0), rtol=1e-12)


@pytest.mark.parametrize("case", ["rosenbrock", "exp_fit", "linear"])
def test_lmdif_matches_scipy(case):
    rng = np.random.default_rng(7)
    if case == "rosenbrock":
        def f(x):
            return np.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
        x0 = np.array([-1.2, 1.0])
    elif case == "exp_fit":
        t = np.linspace(0, 1, 25)
        y = 2.5 * np.exp(-1.3 * t) + 0.4 + 0.01 * rng.normal(size=25)

        def f(x):
            return x[0] * np.exp(-x[1] * t) + x[2] - y
        x0 = np.array([1.0, 1.0, 0.0])
    else:
        A = rng.normal(size=(12, 4))
        b = rng.normal(size=12)

        def f(x):
            return A @ x - b
        x0 = np.zeros(4)

    tol = float(np.sqrt(np.finfo(np.float64).eps))
    xs, _cov, info_s, _msg, ier = leastsq(
        f, x0, full_output=True, ftol=tol, xtol=tol, gtol=0.0,
        maxfev=2000, factor=100.0)
    xb, fb, info_b, nfev = L.lmdif(
        batched(f), x0, ftol=tol, xtol=tol, gtol=0.0, maxfev=2000,
        factor=100.0)
    assert ier in (1, 2, 3, 4)
    assert info_b in (1, 2, 3, 4)
    # same minimum (possibly reached along a slightly different path)
    np.testing.assert_allclose(
        np.linalg.norm(f(xb)), np.linalg.norm(f(xs)), rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(xb, xs, rtol=1e-4, atol=1e-8)


def test_lmdif_batches_jacobian_probes():
    """Every fcn_batch call carries n + 1 rows; the call count per iteration
    is O(1), not O(n)."""
    t = np.linspace(0, 1, 30)
    y = 1.7 * np.exp(-2.2 * t) + 0.1

    calls = []

    def fcn_batch(X):
        calls.append(X.shape)
        return np.stack([x[0] * np.exp(-x[1] * t) + x[2] - y for x in X])

    x0 = np.array([1.0, 1.0, 0.0])
    tol = float(np.sqrt(np.finfo(np.float32).eps))
    xb, fb, info, nfev = L.lmdif(fcn_batch, x0, ftol=tol, xtol=tol,
                                 maxfev=2000, epsfcn=float(np.finfo(np.float32).eps))
    assert info in (1, 2, 3)
    assert np.allclose(xb, [1.7, 2.2, 0.1], atol=1e-3)
    # all calls share one shape -> one compiled program on device
    assert set(calls) == {(4, 3)}
    # device-call count scales with iterations (2 calls/iter), not n*iters
    n_iters_upper = nfev  # nfev counts rows, calls is what hits the device
    assert len(calls) < nfev
