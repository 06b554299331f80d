"""Parameterized source model registry.

Mirrors the reference's manual dynamic dispatch (source_all.f90) and the
shared psm machinery (parameterized_source.f90): each model declares its
parameter table (names/units/norms/hard+soft limits/defaults, machine-parsed
from `source_info` in the reference) and provides a two-stage discretizer:

* `grid_shape(params, effective_dt)` -- host-side closed form giving the
  static centroid-grid dimensions (the reference's psm_to_tdsm_size_*),
* `discretize(params, effective_dt, shape)` -- pure-jnp centroid table for
  those static dimensions; vmappable over a batch of parameter vectors that
  share a shape (this is what makes grid search a single device program).

Centroid tables are dicts: north/east/depth/time f32[C], m f32[C, 6],
active bool[C] (mask for models whose live point count is data-dependent,
e.g. circular).
"""

from __future__ import annotations

import dataclasses
import typing

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# degree->radian conversion in float32, matching the reference's real-kind
# d2r (orthodrome.f90:316-323 with constants.f90's single-precision pi)
DEG2RAD_F32 = np.float32(2.0 / 360.0 * 3.14159265358979)


@dataclasses.dataclass(frozen=True)
class SourceModel:
    name: str
    names: tuple
    units: tuple
    norm: np.ndarray
    min_hard: np.ndarray
    max_hard: np.ndarray
    min_soft: np.ndarray
    max_soft: np.ndarray
    defaults: np.ndarray
    grid_shape: typing.Callable  # (params_np, effective_dt) -> shape tuple
    discretize: typing.Callable  # (params_f32, effective_dt, shape) -> centroids
    post_factors: typing.Callable  # params -> (moment, risetime) applied post-synthesis
    host_discretize: bool = False  # True: discretize(params, edt, ctx) runs on host
    # optional conservative (extent_m, (depth_lo, depth_hi), (t_lo, t_hi)) bounds
    # from raw parameter vectors, host-side -- lets the engine plan static
    # windows without pulling discretized centroids off the device
    param_stats: typing.Callable = None
    # True: param_stats takes (pb, effective_dt, eikonal_context) -- the
    # time bound needs the layer shear speeds (host-discretize models)
    param_stats_ctx: bool = False
    # indices of the params grid_shape depends on (lets the engine check
    # shape uniformity of a batch via np.unique over those columns instead
    # of a python loop over every row); None = all params
    shape_param_idx: tuple = None
    # optional vectorized post_factors: pb [B, nparams] -> (moments [B],
    # risetimes [B]) numpy, replacing the per-row python loop
    post_factors_batch: typing.Callable = None
    # optional host predicate pb [B, nparams] -> bool: True iff the whole
    # batch discretizes to identical centroid positions/times/activity
    # (only the moment tensors differ) -- unlocks the shared-kinematics
    # forward (the reference's only_moment_changed shortcut, batched)
    shared_kin_check: typing.Callable = None

    @property
    def nparams(self):
        return len(self.names)

    def param_index(self, name):
        return self.names.index(name)


def _cols_const(pb, idx):
    """True iff the given param columns are identical across the batch."""
    sub = pb[:, list(idx)]
    return bool(np.all(sub == sub[0]))


SOURCE_REGISTRY: dict = {}


def register(model: SourceModel):
    SOURCE_REGISTRY[model.name] = model
    return model


def get_source_model(name) -> SourceModel:
    try:
        return SOURCE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown source type {name!r}; available: {sorted(SOURCE_REGISTRY)}"
        ) from None


def init_euler_jnp(alpha, beta, gamma):
    """jnp version of euler.f90:28-67 (float32)."""
    ca, cb, cg = jnp.cos(alpha), jnp.cos(beta), jnp.cos(gamma)
    sa, sb, sg = jnp.sin(alpha), jnp.sin(beta), jnp.sin(gamma)
    return jnp.stack(
        [
            jnp.stack([cb * cg - ca * sb * sg, -cb * sg - ca * sb * cg, sa * sb], -1),
            jnp.stack([sb * cg + ca * cb * sg, -sb * sg + ca * cb * cg, -sa * cb], -1),
            jnp.stack([sa * sg, sa * cg, ca], -1),
        ],
        axis=-2,
    )


M_UNROT_JNP = jnp.asarray(
    np.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0], [-1.0, 0.0, 0.0]], dtype=np.float32)
)


def mt_rot_from_sdr_jnp(strike_deg, dip_deg, rake_deg):
    """(rotmat_slip, m_rot 3x3) from strike/dip/rake in degrees, f32."""
    strike = strike_deg * DEG2RAD_F32
    dip = dip_deg * DEG2RAD_F32
    rake = rake_deg * DEG2RAD_F32
    rot = init_euler_jnp(dip, strike, -rake)
    m = rot @ M_UNROT_JNP @ rot.T
    return rot, m


def m3_to_m6_jnp(m):
    return jnp.stack([m[0, 0], m[1, 1], m[2, 2], m[0, 1], m[0, 2], m[1, 2]], -1)


def plf4_cell_weights(xs, ys, ta, tb):
    """Area and centroid of a 4-point PLF over cells [ta, tb] (jnp).

    xs, ys: PLF control points, shape [4] (may include zero-width vertical
    jumps, which contribute no area).  ta, tb: f32[nt].  Returns
    (wt[nt], toff[nt]) exactly as plf_integrate_and_centroid
    (piecewise_linear_function.f90:163-193).
    """
    area = jnp.zeros_like(ta)
    moment = jnp.zeros_like(ta)
    for i in range(3):
        x0, x1 = xs[i], xs[i + 1]
        y0, y1 = ys[i], ys[i + 1]
        lo = jnp.maximum(ta, x0)
        hi = jnp.minimum(tb, x1)
        valid = hi > lo
        dxseg = jnp.where(x1 != x0, x1 - x0, 1.0)
        slope = jnp.where(x1 != x0, (y1 - y0) / dxseg, 0.0)
        ylo = y0 + slope * (lo - x0)
        yhi = y0 + slope * (hi - x0)
        a = jnp.where(valid, (ylo + yhi) * (hi - lo) / 2.0, 0.0)
        ysum = ylo + yhi
        cx = jnp.where(
            ysum != 0.0,
            (lo * (2.0 * ylo + yhi) + hi * (ylo + 2.0 * yhi))
            / jnp.where(ysum != 0.0, 3.0 * ysum, 1.0),
            (lo + hi) / 2.0,
        )
        area = area + a
        moment = moment + a * cx
    toff = jnp.where(area != 0.0, moment / jnp.where(area != 0.0, area, 1.0), (ta + tb) / 2.0)
    return area, toff


def trapezoid_stf_points(dursf, risetime):
    """Control points of the box(x)box STF (source_bilat.f90:403-414), jnp."""
    lo = jnp.minimum(dursf, risetime)
    hi = jnp.maximum(dursf, risetime)
    safe_hi = jnp.where(hi > 0, hi, 1.0)
    xs = jnp.stack([-(hi + lo) / 2.0, -(hi - lo) / 2.0, (hi - lo) / 2.0, (hi + lo) / 2.0])
    ys = jnp.stack([0.0 * hi, 1.0 / safe_hi, 1.0 / safe_hi, 0.0 * hi])
    return xs, ys
