"""Geodesy on the sphere / WGS84 spheroid (jnp, float64).

Functional equivalents of the reference's orthodrome module
(/root/reference/orthodrome.f90): azimuth/backazimuth/arc distance on a
sphere, spheroid distance accurate to ~50 m, and the differential
azimuth/distance formula used to locate subfault centroids relative to a
receiver.  All angles and coordinates in radians, distances in meters.

These run in float64 (the reference uses real*8 here); they are O(ncentroids)
scalar math, negligible next to the waveform path, so f64 emulation on TPU is
fine.
"""

from __future__ import annotations

import jax.numpy as jnp

# orthodrome.f90:21-25 (constants.f90)
EARTHRADIUS = 6371.0 * 1000.0
EARTHRADIUS_EQUATOR = 6378.14 * 1000.0
EARTH_OBLATENESS = 1.0 / 298.257223563  # WGS84
PI = jnp.pi


def _clip(x, mi, ma):
    return jnp.minimum(jnp.maximum(mi, x), ma)


def wrap(x, mi, ma):
    """Wrap x into [mi, ma) (orthodrome.f90:166-170)."""
    return x - jnp.floor((x - mi) / (ma - mi)) * (ma - mi)


def cosdelta(alat, alon, blat, blon):
    """Cosine of arc distance between two points (orthodrome.f90:285-294)."""
    return jnp.sin(alat) * jnp.sin(blat) + jnp.cos(alat) * jnp.cos(blat) * jnp.cos(
        blon - alon
    )


def azimuth(alat, alon, blat, blon):
    """Azimuth of point b as seen from a, in ]-pi, pi] (orthodrome.f90:231-243)."""
    return jnp.arctan2(
        jnp.cos(alat) * jnp.cos(blat) * jnp.sin(blon - alon),
        jnp.sin(blat) - jnp.sin(alat) * cosdelta(alat, alon, blat, blon),
    )


def azibazi(alat, alon, blat, blon):
    """Azimuth and backazimuth between points a, b (orthodrome.f90:245-265)."""
    t = jnp.cos(alat) * jnp.cos(blat) * jnp.sin(blon - alon)
    sa = jnp.sin(alat)
    sb = jnp.sin(blat)
    cd = cosdelta(alat, alon, blat, blon)
    azi = jnp.arctan2(t, sb - sa * cd)
    bazi = jnp.arctan2(-t, sa - sb * cd)
    return azi, bazi


def arcdistance(alat, alon, blat, blon):
    """Arc distance in radians (orthodrome.f90:172-182)."""
    return jnp.arccos(_clip(cosdelta(alat, alon, blat, blon), -1.0, 1.0))


def distance(alat, alon, blat, blon):
    """Spherical distance in meters (orthodrome.f90:184-191)."""
    return arcdistance(alat, alon, blat, blon) * EARTHRADIUS


def distance_accurate50m(alat, alon, blat, blon):
    """Spheroid (WGS84) distance in meters, accurate to ~50 m.

    Meeus' algorithm as in orthodrome.f90:193-229.
    """
    f = (alat + blat) / 2.0
    g = (alat - blat) / 2.0
    ll = (alon - blon) / 2.0

    s = jnp.sin(g) ** 2 * jnp.cos(ll) ** 2 + jnp.cos(f) ** 2 * jnp.sin(ll) ** 2
    c = jnp.cos(g) ** 2 * jnp.cos(ll) ** 2 + jnp.sin(f) ** 2 * jnp.sin(ll) ** 2

    w = jnp.arctan(jnp.sqrt(s / c))
    r = jnp.sqrt(s * c) / w
    d = 2.0 * w * EARTHRADIUS_EQUATOR
    h1 = (3.0 * r - 1.0) / (2.0 * c)
    h2 = (3.0 * r + 1.0) / (2.0 * s)

    return d * (
        1.0
        + EARTH_OBLATENESS * h1 * jnp.sin(f) ** 2 * jnp.cos(g) ** 2
        - EARTH_OBLATENESS * h2 * jnp.cos(f) ** 2 * jnp.sin(g) ** 2
    )


def azidist(alat, alon, blat, blon):
    """Azimuth and arc distance in one shot (orthodrome.f90:267-283)."""
    cd = cosdelta(alat, alon, blat, blon)
    azi = jnp.arctan2(
        jnp.cos(alat) * jnp.cos(blat) * jnp.sin(blon - alon),
        jnp.sin(blat) - jnp.sin(alat) * cd,
    )
    return azi, jnp.arccos(_clip(cd, -1.0, 1.0))


def approx_differential_azidist(delta_x, delta_y, azi, bazi, dist):
    """Azimuth/backazimuth/distance to a receiver from a point displaced by
    cartesian (delta_x north, delta_y east) meters from the reference point.

    Exact spherical-earth formulas; the reference's flat-geometry and
    constant-azimuth shortcuts are disabled by its own parameters
    (orthodrome.f90:67-72), so only the exact branch
    (orthodrome.f90:121-152) is reproduced.

    All of azi/bazi/dist refer to the *reference* point; returns
    (new_azi, new_bazi, new_dist) as seen from the displaced point.
    """
    r = jnp.sqrt(delta_x**2 + delta_y**2)
    a = r / EARTHRADIUS
    b = dist / EARTHRADIUS
    lam = jnp.arctan2(delta_y, delta_x)
    gamma = azi - lam

    sc = jnp.sin(a) * jnp.sin(b)
    c = jnp.arccos(_clip(jnp.cos(a) * jnp.cos(b) + sc * jnp.cos(gamma), -1.0, 1.0))
    sinc = jnp.sin(c)
    # Guard r == 0: alpha=0, beta=0, c=b exactly.  sin(c) can be 0 only when
    # the displaced point coincides with the receiver (degenerate).
    safe_sinc = jnp.where(sinc == 0.0, 1.0, sinc)
    alpha = jnp.arcsin(_clip(jnp.sin(a) * jnp.sin(gamma) / safe_sinc, -1.0, 1.0))
    beta = jnp.arcsin(_clip(jnp.sin(b) * jnp.sin(gamma) / safe_sinc, -1.0, 1.0))

    # put alpha and beta into the correct quadrant (orthodrome.f90:132-146)
    alpha = jnp.where(
        jnp.cos(a) - jnp.cos(b) * jnp.cos(c) < 0,
        jnp.where(alpha > 0, PI - alpha, -PI - alpha),
        alpha,
    )
    beta = jnp.where(
        jnp.cos(b) - jnp.cos(a) * jnp.cos(c) < 0,
        jnp.where(beta > 0, PI - beta, -PI - beta),
        beta,
    )

    new_dist = c * EARTHRADIUS
    new_bazi = wrap(bazi + alpha, -PI, PI)
    new_azi = wrap(lam - PI - beta, -PI, PI)

    is_zero = r == 0.0
    new_azi = jnp.where(is_zero, azi, new_azi)
    new_bazi = jnp.where(is_zero, bazi, new_bazi)
    new_dist = jnp.where(is_zero, dist, new_dist)
    return new_azi, new_bazi, new_dist


def ne_to_latlon(lat0, lon0, north, east):
    """Move (north, east) meters from (lat0, lon0); returns (lat, lon).

    Exact spherical formulation (the inverse direction of
    approx_differential_azidist's geometry); used to place receivers for
    benchmarks, mirroring pyrocko.orthodrome.ne_to_latlon usage in
    benchmark/kiwibench.py:100.  Pure numpy: this is host-side setup
    geometry, and eager jnp scalar ops each cost a device compile+dispatch
    round trip (measured ~150 s of session setup over the axon tunnel).
    """
    import numpy as np

    a = np.sqrt(north**2 + east**2) / EARTHRADIUS
    gamma = np.arctan2(east, north)

    # spherical triangle from the north pole
    b = np.pi / 2.0 - lat0
    c = np.arccos(
        np.clip(np.cos(a) * np.cos(b) + np.sin(a) * np.sin(b) * np.cos(gamma), -1, 1)
    )
    lat = np.pi / 2.0 - c
    sinc = np.sin(c)
    safe_sinc = np.where(sinc == 0.0, 1.0, sinc)
    dlon = np.arcsin(np.clip(np.sin(a) * np.sin(gamma) / safe_sinc, -1.0, 1.0))
    # quadrant fix when moving past the pole
    dlon = np.where(
        np.cos(a) - np.cos(b) * np.cos(c) < 0,
        np.where(dlon > 0, np.pi - dlon, -np.pi - dlon),
        dlon,
    )
    lon = lon0 + dlon
    return lat, lon


def d2r(deg):
    """Degrees to radians as the reference does it (orthodrome.f90:296-341)."""
    return deg * (2.0 / 360.0) * jnp.pi


def r2d(rad):
    return rad * 360.0 / 2.0 / jnp.pi
