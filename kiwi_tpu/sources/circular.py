"""Circular finite-fault source (source_circular.f90)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    _cols_const,
    DEG2RAD_F32,
    SourceModel,
    init_euler_jnp,
    m3_to_m6_jnp,
    mt_rot_from_sdr_jnp,
    plf4_cell_weights,
    register,
    trapezoid_stf_points,
)

BIG = np.float32(np.finfo(np.float32).max)

NAMES = (
    "time", "north-shift", "east-shift", "depth", "moment",
    "strike", "dip", "slip-rake", "radius", "rupture-velocity", "rise-time",
)
UNITS = ("s", "m", "m", "m", "Nm", "degrees", "degrees", "degrees", "m", "m/s", "s")
NORM = np.array([1, 10000, 10000, 10000, 7e18, 360, 90, 360, 10000, 3000, 1], np.float32)
MIN_HARD = np.array([-BIG, -100000, -100000, 0, 1, -BIG, -BIG, -BIG, 0, 100, 0], np.float32)
MAX_HARD = np.array([BIG, 100000, 100000, 1000000, 7e25, BIG, BIG, BIG, 1000000, 100000, 10], np.float32)
MIN_SOFT = np.array([-20, -10000, -10000, 0, 1, -180, 0, -180, 0, 1000, 0], np.float32)
MAX_SOFT = np.array([20, 10000, 10000, 150000, 7e25, 180, 90, 180, 100000, 10000, 5], np.float32)
DEFAULTS = np.array([0, 0, 0, 10000, 7e18, 0, 80, 0, 5000, 3500, 1], np.float32)


def grid_shape(params, effective_dt):
    """(nx, nx, nt) -- psm_to_tdsm_size_circular (source_circular.f90:267-302)."""
    radius = float(params[8])
    rupvel = float(params[9])
    risetime = float(params[10])
    length = 2.0 * radius
    maxdx = 0.5 * effective_dt * rupvel

    nx = int(np.floor(length / maxdx)) + 1
    if nx <= 1:
        nx = 2
    if length == 0.0:
        nx = 1
    ny = nx

    dursf = length / nx / rupvel
    durfull = risetime + dursf
    nt = int(np.floor(durfull / effective_dt)) + 1
    if nt <= 1:
        nt = 2
    return (nx, ny, nt)


def discretize(params, effective_dt, shape):
    """Square grid trimmed to the circle (psm_to_tdsm_table_circular,
    source_circular.f90:305-444).

    Static shapes: points outside the circle stay in the table with zero
    moment and active=False (the reference drops them; the per-point moment
    normalization 1/np uses the live count, computed with a mask here).

    Note the reference quirk: psm_update_dep_params_circular reads
    params(9) -- the *radius* -- as the rupture-rake Euler angle for
    rotmat_rup (source_circular.f90:221-223).  We reproduce it for parity:
    it only rotates subfault positions within the (isotropically gridded)
    fault plane.
    """
    nx, ny, nt = shape
    p = jnp.asarray(params, jnp.float32)
    time, north, east, depth = p[0], p[1], p[2], p[3]
    strike, dip, slip_rake = p[5], p[6], p[7]
    radius, rupvel, risetime = p[8], p[9], p[10]
    length = 2.0 * radius

    rotmat_rup = init_euler_jnp(dip * DEG2RAD_F32, strike * DEG2RAD_F32, -radius * DEG2RAD_F32)
    _, m_rot = mt_rot_from_sdr_jnp(strike, dip, slip_rake)

    ix = jnp.arange(nx, dtype=jnp.float32)
    iy = jnp.arange(ny, dtype=jnp.float32)
    gx = (2.0 * ix - nx + 1.0) / (2.0 * nx) * length
    gy = (2.0 * iy - ny + 1.0) / (2.0 * ny) * length
    gxm, gym = jnp.meshgrid(gx, gy, indexing="ij")
    from .. import synth as _synth

    # grad-safe: with nx odd the center cell sits exactly at r=0 and the
    # raw sqrt's backward (inf) would poison autodiff w.r.t. length/rupvel
    r = _synth.grad_safe_norm(gxm, gym)
    inside = r <= radius

    pts = jnp.stack([gxm, gym, jnp.zeros_like(gxm)], axis=-1)
    # HIGHEST: positions must stay f32-exact (see bilat.py discretize)
    rot = jnp.einsum("ij,xyj->xyi", rotmat_rup, pts,
                     precision=jax.lax.Precision.HIGHEST)
    gn = rot[..., 0] + north
    ge = rot[..., 1] + east
    gd = rot[..., 2] + depth
    tshift = r / rupvel + time

    np_live = jnp.maximum(jnp.sum(inside.astype(jnp.float32)), 1.0)

    dursf = length / nx / rupvel
    xs, ys = trapezoid_stf_points(dursf, risetime)
    durfull = dursf + risetime
    dt_cell = durfull / nt
    it = jnp.arange(nt, dtype=jnp.float32)
    wt, toff = plf4_cell_weights(xs, ys, xs[0] + dt_cell * it, xs[0] + dt_cell * (it + 1))

    m6 = m3_to_m6_jnp(m_rot) / np_live

    def flat(a):
        return jnp.broadcast_to(a[:, :, None], (nx, ny, nt)).reshape(-1)

    active = flat(jnp.where(inside, 1.0, 0.0)) > 0.5
    return {
        "north": flat(gn),
        "east": flat(ge),
        "depth": flat(gd),
        "time": flat(tshift) + jnp.tile(toff, nx * ny),
        "m": jnp.where(active[:, None], m6[None, :] * jnp.tile(wt, nx * ny)[:, None], 0.0),
        "active": active,
    }


def post_factors(params):
    return float(params[4]), 0.0


def param_stats(pb, effective_dt=1.0):
    pb = np.atleast_2d(pb)
    r = pb[:, 8] * np.sqrt(2.0)  # square grid corners may poke past radius
    ext = float((np.hypot(pb[:, 1], pb[:, 2]) + r).max())
    d = (float((pb[:, 3] - r).min()), float((pb[:, 3] + r).max()))
    tspan = 2.0 * pb[:, 8] / np.maximum(pb[:, 9], 1.0) + pb[:, 10]
    t = (float((pb[:, 0] - tspan).min()), float((pb[:, 0] + tspan).max()))
    return ext, d, t


MODEL = register(
    SourceModel(
        name="circular",
        names=NAMES,
        units=UNITS,
        norm=NORM,
        min_hard=MIN_HARD,
        max_hard=MAX_HARD,
        min_soft=MIN_SOFT,
        max_soft=MAX_SOFT,
        defaults=DEFAULTS,
        grid_shape=grid_shape,
        discretize=discretize,
        post_factors=post_factors,
        param_stats=param_stats,
        shape_param_idx=(8, 9, 10),
        shared_kin_check=lambda pb: _cols_const(pb, (0, 1, 2, 3, 8, 9, 10))
        and (_cols_const(pb, (5, 6)) or float(pb[0, 8]) == 0.0),
        post_factors_batch=lambda pb: (pb[:, 4].astype("f4"),
                                       np.zeros(pb.shape[0], "f4")),
    )
)
