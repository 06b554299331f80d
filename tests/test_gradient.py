"""Autodiff gradients through the misfit engine (engine.global_misfits_and_grad
+ invert.minimize_multistart/minimize_gradient).

The reference has no counterpart (its LM uses forward-difference
Jacobians); correctness here is pinned against central finite
differences of the engine's own batched forward, and end-to-end by
recovering a known source from a perturbed start by pure descent."""

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis
from kiwi_tpu.invert import minimize_gradient, minimize_multistart


@pytest.fixture(scope="module")
def store():
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    return elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )


BILAT = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0,
     2500.0, 0.2],
    dtype=np.float32,
)


@pytest.fixture(scope="module")
def engine(store):
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for d, az in [(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0)]:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az)
        )
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_source_params("bilateral", BILAT)
    eng.set_misfit_method("l2norm")
    eng.set_synthetic_reference()
    return eng


def test_grad_matches_finite_differences(engine):
    """Central FD of the engine's own forward vs the autodiff gradient on
    smooth parameters (strike/dip/moment), away from grid-snap kinks."""
    p = BILAT.copy()
    p[5] = 104.0  # off the reference so g and its gradient are nonzero
    p[6] = 80.0

    g, grad = engine.global_misfits_and_grad(p[None, :])
    assert g.shape == (1,) and grad.shape == (1, p.size)
    assert np.isfinite(grad).all()

    # (param index, step): steps large enough to beat f32 forward noise,
    # small enough to stay inside one linear piece of the 2-tap shifts
    probes = [(5, 0.25), (6, 0.25), (4, 2e10)]
    rows = []
    for j, h in probes:
        lo_, hi_ = p.copy(), p.copy()
        lo_[j] -= h
        hi_[j] += h
        rows += [lo_, hi_]
    gfd = np.asarray(
        engine.global_misfits_for_source_batch(np.stack(rows)), np.float64)
    for k, (j, h) in enumerate(probes):
        fd = (gfd[2 * k + 1] - gfd[2 * k]) / (2.0 * h)
        ad = grad[0, j]
        assert abs(ad - fd) <= 0.08 * max(abs(fd), 1e-12), (
            f"param {j}: autodiff {ad} vs FD {fd}")


def test_grad_zero_for_inactive_param(engine):
    """East-shift of a symmetric store layout... use moment of a zero-misfit
    source instead: at the reference itself the misfit floor keeps the
    gradient finite (no NaNs from sqrt'(0))."""
    g, grad = engine.global_misfits_and_grad(BILAT[None, :])
    assert g[0] < 1e-5
    assert np.isfinite(grad).all()


def test_multistart_descends_and_recovers_strike(engine):
    """Two perturbed starts, strike free: both descend; the best recovers
    the true strike by gradient information alone."""
    mask = np.zeros(BILAT.size, dtype=bool)
    mask[5] = True  # strike

    starts = np.tile(BILAT, (2, 1))
    starts[0, 5] = 75.0
    starts[1, 5] = 109.0
    g0 = np.asarray(engine.global_misfits_for_source_batch(starts), np.float64)

    best_rows, best_g, nsteps = minimize_multistart(
        engine, starts, mask=mask, steps=60, lr=0.02)
    assert nsteps == 60
    assert (best_g <= g0 + 1e-12).all()
    k = int(np.argmin(best_g))
    assert abs(float(best_rows[k, 5]) - 91.0) < 3.0, best_rows[:, 5]
    assert best_g[k] < 0.25 * g0.min()


def test_grad_through_floating_norm(engine):
    """The floating norms min over trial shifts; the subgradient follows
    the selected shift (exact a.e.).  Checks finiteness and FD agreement
    under floating_l1norm -- the benchmark's misfit method."""
    try:
        engine.set_misfit_method("floating_l1norm")
        engine.set_floating_shiftrange(-0.5, 0.5)
        engine.set_source_params("bilateral", BILAT)
        engine.set_synthetic_reference()

        p = BILAT.copy()
        p[5] = 99.0
        g, grad = engine.global_misfits_and_grad(p[None, :])
        assert np.isfinite(grad).all()
        assert abs(grad[0, 5]) > 0

        h = 0.3
        lo_, hi_ = p.copy(), p.copy()
        lo_[5] -= h
        hi_[5] += h
        gfd = np.asarray(engine.global_misfits_for_source_batch(
            np.stack([lo_, hi_])), np.float64)
        fd = (gfd[1] - gfd[0]) / (2.0 * h)
        # FD can straddle a shift-selection switch; 15% is enough to pin
        # sign + scale of the subgradient
        assert abs(grad[0, 5] - fd) <= 0.15 * max(abs(fd), 1e-12), (grad[0, 5], fd)
    finally:
        engine.set_misfit_method("l2norm")
        engine.set_floating_shiftrange(0.0, 0.0)
        engine.set_source_params("bilateral", BILAT)
        engine.set_synthetic_reference()


def test_moment_tensor_linear_recovery(engine):
    """The MT components enter the forward linearly, so gradient descent
    on them is the classic linear inverse problem; a second model family
    through the autodiff path (different discretizer than bilateral)."""
    true = np.array(
        [0.2, 50.0, -30.0, 400.0, 1e12, -5e11, 2e11, 3e11, -1e11, 5e11, 0.4],
        dtype=np.float32)
    try:
        engine.set_source_params("moment_tensor", true)
        engine.set_misfit_method("l2norm")
        engine.set_synthetic_reference()

        start = true.copy()
        start[4] *= 1.6   # mxx
        start[7] *= 0.4   # mxy
        mask = np.zeros(true.size, dtype=bool)
        mask[[4, 7]] = True

        rows, g, _ = minimize_multistart(
            engine, start[None, :], mask=mask, steps=80, lr=0.03)
        assert g[0] < 0.02, g
        assert abs(rows[0, 4] / true[4] - 1.0) < 0.05
        assert abs(rows[0, 7] / true[7] - 1.0) < 0.05
    finally:
        # restore the module fixture's source/reference for later tests
        engine.set_source_params("bilateral", BILAT)
        engine.set_misfit_method("l2norm")
        engine.set_synthetic_reference()


def test_minimize_gradient_updates_engine(engine):
    p = BILAT.copy()
    p[5] = 103.0
    engine.set_source_params("bilateral", p)
    mask = np.zeros(BILAT.size, dtype=bool)
    mask[5] = True
    gm0 = engine.get_global_misfit()
    gm, nsteps, nstarts = minimize_gradient(
        engine, mask=mask, steps=50, lr=0.02, nstarts=3, spread=0.05, seed=1)
    assert nstarts == 3 and nsteps == 50
    assert gm < gm0
    assert abs(float(engine.source_params[5]) - 91.0) < 4.0
    # leave the fixture's source as the tests found it
    engine.set_source_params("bilateral", BILAT)


def test_misfit_jacobian_matches_fd_and_covariance(engine):
    """Forward-mode misfit-row Jacobian vs central finite differences, and
    the linearized covariance on top of it (cov = sigma^2 (J^T J)^-1, the
    lmdif-style formal uncertainty)."""
    engine.set_misfit_method("l2norm")
    engine.set_source_params("bilateral", BILAT)
    engine.set_synthetic_reference()

    p = BILAT.copy()
    p[5] = 99.0   # strike off the reference
    mask = np.zeros(p.size, dtype=bool)
    mask[[4, 5]] = True  # moment, strike

    m, J = engine.misfit_jacobian(p, mask=mask)
    assert J.shape == (m.size, 2)
    assert np.isfinite(J).all()

    for k, (j, h) in enumerate([(4, 2e10), (5, 0.25)]):
        lo_, hi_ = p.copy(), p.copy()
        lo_[j] -= h
        hi_[j] += h
        mm, _n, _ = engine.misfits_for_source_batch(np.stack([lo_, hi_]))
        fd = (np.asarray(mm, np.float64)[1] - np.asarray(mm, np.float64)[0]) / (2 * h)
        big = np.abs(fd) > 0.2 * np.abs(fd).max()
        np.testing.assert_allclose(J[big, k], fd[big], rtol=0.1)

    from kiwi_tpu.invert import covariance
    cov, sigma2, J2 = covariance(engine, mask=mask, params=p)
    assert cov.shape == (2, 2)
    assert sigma2 > 0
    assert (np.diag(cov) > 0).all()
    # symmetric PSD
    np.testing.assert_allclose(cov, cov.T, rtol=1e-10)
    assert np.linalg.eigvalsh(cov).min() >= -1e-12 * np.abs(cov).max()
