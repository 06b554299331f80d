"""Euler/MT and PLF tests (counterparts of test_euler.f90,
test_piecewise_linear_function.f90)."""

import numpy as np
import pytest

from kiwi_tpu import euler, plf


def test_euler_identity():
    m = euler.init_euler(0.0, 0.0, 0.0)
    np.testing.assert_allclose(m, np.eye(3), atol=1e-15)


def test_euler_orthonormal():
    rng = np.random.default_rng(7)
    for _ in range(20):
        a, b, g = rng.uniform(-np.pi, np.pi, 3)
        m = euler.init_euler(a, b, g)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert abs(np.linalg.det(m) - 1.0) < 1e-12


def test_mt_from_sdr_vertical_strikeslip():
    # strike=0, dip=90, rake=0: pure mxy double couple in NED
    # (Aki & Richards box 4.4: Mxy = +M0 for left-lateral strike slip)
    m = euler.mt_from_sdr(0.0, np.pi / 2, 0.0)
    m6 = euler.sym_to_m6(m)
    np.testing.assert_allclose(m6, [0, 0, 0, 1, 0, 0], atol=1e-7)


def test_mt_from_sdr_basics():
    # 45-degree dip-slip (thrust), strike 0: mxx = -mzz couple
    m = euler.mt_from_sdr(0.0, np.pi / 4, np.pi / 2)
    m6 = euler.sym_to_m6(m)
    # properties: trace-free, unit scalar moment sqrt(sum m^2/2)=1
    assert abs(m6[0] + m6[1] + m6[2]) < 1e-6
    m0 = np.sqrt((m**2).sum() / 2.0)
    assert abs(m0 - 1.0) < 1e-6


def test_pt_axes_ranges():
    rs, rd = euler.rotmats_from_sdr(np.radians(91.0), np.radians(87.0), np.radians(164.0), 0.0)
    pax, tax = euler.pt_axes(rd)
    for ax in (pax, tax):
        assert -180.0 <= ax[0] <= 180.0
        assert 0.0 <= ax[1] <= 90.0 + 1e-9


def test_plf_integrate_boxcar():
    b = plf.boxcar_stf(2.0)  # support [-1, 1], height 0.5
    assert abs(b.integrate(-5.0, 5.0) - 1.0) < 1e-12
    assert abs(b.integrate(-1.0, 0.0) - 0.5) < 1e-12
    assert abs(b.integrate(0.5, 3.0) - 0.25) < 1e-12
    assert b.integrate(2.0, 3.0) == 0.0
    assert b.integrate(-4.0, -3.0) == 0.0


def test_plf_integrate_and_centroid_triangle():
    tri = plf.PLF([0.0, 1.0, 2.0], [0.0, 1.0, 0.0])
    area, cen = tri.integrate_and_centroid(0.0, 2.0)
    assert abs(area - 1.0) < 1e-12
    assert abs(cen - 1.0) < 1e-12
    area, cen = tri.integrate_and_centroid(0.0, 1.0)
    assert abs(area - 0.5) < 1e-12
    assert abs(cen - 2.0 / 3.0) < 1e-12


def test_trapezoid_stf_symmetric_normalized():
    for dursf, rise in [(0.3, 1.0), (1.0, 0.3), (0.5, 0.5)]:
        s = plf.trapezoid_stf(dursf, rise)
        lo, hi = s.span()
        assert abs(lo + hi) < 1e-12
        assert abs(s.integrate(lo - 1, hi + 1) - 1.0) < 1e-9


def test_stf_cell_weights_sum_to_one():
    s = plf.trapezoid_stf(0.245, 2.0)
    nt = 5
    durfull = 0.245 + 2.0
    wt, toff = plf.stf_cell_weights(s, nt, s.span()[0], durfull / nt)
    assert abs(wt.sum() - 1.0) < 1e-9
    assert np.all(np.diff(toff) > 0)


def test_taper_weights_cos():
    t = plf.PLF([1.0, 2.0, 4.0, 5.0], [0.0, 1.0, 1.0, 0.0])
    dx = 0.5
    w = t.taper_weights((0, 12), dx)
    # zeros at/before floor(1.0/0.5)=2 and from floor(5.0/0.5)+1=11
    assert np.all(w[:3] == 0.0)
    assert np.all(w[11:] == 0.0)
    # plateau segment [2,4] -> samples 5..8 at weight 1
    np.testing.assert_allclose(w[5:9], 1.0)
    # cosine ramp midpoint: x=1.5 -> 0.5
    assert abs(w[3] - 0.5) < 1e-12


def test_taper_weights_zero_one():
    t = plf.PLF([1.0, 2.0, 4.0, 5.0], [0.0, 1.0, 1.0, 0.0])
    w = t.taper_weights((0, 12), 0.5, ip="zero_one")
    assert set(np.unique(w)) <= {0.0, 1.0}
    assert np.all(w[5:9] == 1.0)
