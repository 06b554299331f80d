"""Geodesy tests (counterpart of the reference's test_orthodrome.f90)."""

import numpy as np
import jax.numpy as jnp

from kiwi_tpu import geo


def rad(d):
    return np.radians(d)


def test_azimuth_cardinal():
    # point straight north: azimuth 0; straight east: pi/2
    assert abs(float(geo.azimuth(0.0, 0.0, rad(1.0), 0.0))) < 1e-12
    assert abs(float(geo.azimuth(0.0, 0.0, 0.0, rad(1.0))) - np.pi / 2) < 1e-12
    assert abs(float(geo.azimuth(0.0, 0.0, rad(-1.0), 0.0)) - np.pi) < 1e-12


def test_azibazi_antipodal_consistency():
    a = (rad(40.0), rad(29.0))
    b = (rad(42.35), rad(13.4))
    azi, bazi = geo.azibazi(*a, *b)
    azi2 = geo.azimuth(*a, *b)
    bazi2 = geo.azimuth(*b, *a)
    assert abs(float(azi - azi2)) < 1e-12
    assert abs(float(bazi - bazi2)) < 1e-12


def test_distance_equator_degree():
    # one degree of longitude at the equator, spherical
    d = float(geo.distance(0.0, 0.0, 0.0, rad(1.0)))
    assert abs(d - geo.EARTHRADIUS * np.pi / 180.0) < 1e-6


def test_distance_accurate50m_vs_sphere():
    # spheroid distance should be within ~0.6% of the spherical one
    a = (rad(40.75), rad(29.86))
    b = (rad(42.35), rad(13.4))
    ds = float(geo.distance(*a, *b))
    dw = float(geo.distance_accurate50m(*a, *b))
    assert abs(ds - dw) / ds < 0.006


def test_differential_azidist_zero_offset():
    azi, bazi, dist = (0.3, -2.5, 1.2e6)
    na, nb, nd = geo.approx_differential_azidist(0.0, 0.0, azi, bazi, dist)
    assert float(na) == azi and float(nb) == bazi and float(nd) == dist


def test_differential_azidist_matches_exact_geodesy():
    """Moving the source point and recomputing exactly must agree.

    This is the accuracy scan of differential_azidist.f90 in miniature.
    Distance and backazimuth are exact on the sphere; the new azimuth uses
    the reference's tangent-plane convention (azimuth of the offset vector
    is taken as lam at the displaced point, ignoring meridian convergence),
    so it deviates from the exact spherical azimuth by O(de*tan(lat)/R).
    """
    alat, alon = rad(40.75), rad(29.86)
    blat, blon = rad(35.87), rad(14.52)
    azi, bazi = geo.azibazi(alat, alon, blat, blon)
    dist = geo.distance(alat, alon, blat, blon)

    for dn, de in [(50e3, 0.0), (0.0, 50e3), (-30e3, 70e3), (12e3, -45e3)]:
        na, nb, nd = geo.approx_differential_azidist(dn, de, azi, bazi, dist)
        # exact: displace a by (dn, de) on the sphere and recompute
        plat, plon = geo.ne_to_latlon(alat, alon, dn, de)
        ea, eb = geo.azibazi(plat, plon, blat, blon)
        ed = geo.distance(plat, plon, blat, blon)
        assert abs(float(nd - ed)) < 0.01, (dn, de)  # meters
        assert abs(float(nb - eb)) < 1e-9, (dn, de)
        convergence = np.hypot(dn, de) * np.tan(alat) / geo.EARTHRADIUS
        assert abs(float(na - ea)) < convergence + 1e-9, (dn, de)


def test_ne_to_latlon_roundtrip():
    lat0, lon0 = rad(30.0), rad(70.0)
    lat, lon = geo.ne_to_latlon(lat0, lon0, 3500.0, 0.0)
    d = float(geo.distance(lat0, lon0, lat, lon))
    assert abs(d - 3500.0) < 0.01
    azi = float(geo.azimuth(lat0, lon0, lat, lon))
    assert abs(azi) < 1e-6


def test_wrap():
    assert float(geo.wrap(jnp.pi * 3, -jnp.pi, jnp.pi)) == float(jnp.pi * 3 - 2 * jnp.pi * 2)
    x = float(geo.wrap(-4.0, -np.pi, np.pi))
    assert -np.pi <= x < np.pi
