"""Seismogram synthesis: GF superposition on TPU.

This replaces the reference's hot loop (seismogram.f90:36-301 make_seismogram
+ sparse_trace.f90 trace_multiply_add): for every source centroid, gather the
bilinear neighborhood of Green's-function traces, weight them by the
azimuth-dependent moment-tensor combination, time-shift fractionally and
accumulate into per-component displacement traces.

Two implementations:

* `synthesize_ard_direct` -- a transparent vmap-over-centroids port of the
  reference dataflow (per-centroid gathers).  Used as the semantics oracle.
* `synthesize_ard` -- the TPU-first formulation: the per-centroid work is
  collapsed into a scatter of weights onto a (GF-node, component, time-tap)
  lattice followed by ONE dense convolution of the edge-extended GF window
  with that weight kernel.  Linear in exactly the same terms, so it matches
  the direct path to float32 roundoff while mapping onto the MXU.

Geometry notes: the per-receiver geodesy (azimuths, spheroid distance) is
precomputed host-side in exact float64 (TPU f64 transcendentals are emulated
to only ~1e-8 absolute accuracy); the per-centroid differential geodesy uses
a vector formulation plus polynomial small-angle trig so that the only
in-kernel transcendentals act on well-conditioned quantities.

Component channels ("ard"): 0 = away, 1 = right, 2 = down, in the
receiver-local frame; north/east come from rotating (away, right) by
backazimuth+pi (seismogram.f90:268-283).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np

from . import geo
from .gf.store import GFStore
from .gf.trace import sample_ext

F32 = jnp.float32
F64 = jnp.float64
I32 = jnp.int32
# All synthesis contractions pin HIGHEST precision: XLA's default routes f32
# einsum/conv through one bf16 MXU pass on TPU (~2^-8 relative error), which
# violates the 1e-5 misfit-parity requirement (BASELINE.md).  HIGHEST uses
# multi-pass f32-accurate MXU arithmetic.
HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# receiver geometry (host precompute, exact f64)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReceiverGeometry:
    """Per-receiver geodesy relative to the source origin (float64 host)."""

    azi: np.ndarray  # [R] azimuth source->receiver (rad)
    bazi: np.ndarray  # [R] backazimuth
    dist: np.ndarray  # [R] spheroid distance (m), distance_accurate50m
    sin_azi: np.ndarray
    cos_azi: np.ndarray
    sin_b: np.ndarray  # sin/cos of dist/earthradius
    cos_b: np.ndarray
    depth: np.ndarray  # [R] receiver depth (m), float32

    @property
    def nreceivers(self):
        return self.azi.shape[0]

    def device(self):
        return {
            "azi": jnp.asarray(self.azi, F64),
            "bazi": jnp.asarray(self.bazi, F64),
            "dist": jnp.asarray(self.dist, F64),
            "sin_azi": jnp.asarray(self.sin_azi, F64),
            "cos_azi": jnp.asarray(self.cos_azi, F64),
            "sin_b": jnp.asarray(self.sin_b, F64),
            "cos_b": jnp.asarray(self.cos_b, F64),
            "depth": jnp.asarray(self.depth, F32),
        }


def precompute_receiver_geometry(src_lat, src_lon, rec_lat, rec_lon, rec_depth=None):
    """Host-side exact geodesy (azibazi + distance_accurate50m per receiver).

    All angles in radians.  Mirrors make_seismogram's per-receiver setup
    (seismogram.f90:99-100).
    """
    rec_lat = np.atleast_1d(np.asarray(rec_lat, dtype=np.float64))
    rec_lon = np.atleast_1d(np.asarray(rec_lon, dtype=np.float64))
    if rec_depth is None:
        rec_depth = np.zeros_like(rec_lat)
    rec_depth = np.atleast_1d(np.asarray(rec_depth, dtype=np.float64))

    t = np.cos(src_lat) * np.cos(rec_lat) * np.sin(rec_lon - src_lon)
    cd = np.sin(src_lat) * np.sin(rec_lat) + np.cos(src_lat) * np.cos(rec_lat) * np.cos(
        rec_lon - src_lon
    )
    azi = np.arctan2(t, np.sin(rec_lat) - np.sin(src_lat) * cd)
    bazi = np.arctan2(-t, np.sin(src_lat) - np.sin(rec_lat) * cd)

    # Meeus spheroid distance (orthodrome.f90:193-229)
    f = (src_lat + rec_lat) / 2.0
    g = (src_lat - rec_lat) / 2.0
    ll = (src_lon - rec_lon) / 2.0
    s = np.sin(g) ** 2 * np.cos(ll) ** 2 + np.cos(f) ** 2 * np.sin(ll) ** 2
    c = np.cos(g) ** 2 * np.cos(ll) ** 2 + np.sin(f) ** 2 * np.sin(ll) ** 2
    w = np.arctan(np.sqrt(s / c))
    r = np.sqrt(s * c) / w
    d = 2.0 * w * geo.EARTHRADIUS_EQUATOR
    h1 = (3.0 * r - 1.0) / (2.0 * c)
    h2 = (3.0 * r + 1.0) / (2.0 * s)
    dist = d * (
        1.0
        + geo.EARTH_OBLATENESS * h1 * np.sin(f) ** 2 * np.cos(g) ** 2
        - geo.EARTH_OBLATENESS * h2 * np.cos(f) ** 2 * np.sin(g) ** 2
    )

    b = dist / geo.EARTHRADIUS
    return ReceiverGeometry(
        azi=azi,
        bazi=bazi,
        dist=dist,
        sin_azi=np.sin(azi),
        cos_azi=np.cos(azi),
        sin_b=np.sin(b),
        cos_b=np.cos(b),
        depth=rec_depth.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# per-centroid differential geodesy (in-jit, f64, TPU-emulation-safe)
# ---------------------------------------------------------------------------


def _poly_sincos(a):
    """sin/cos by Taylor series; exact to f64 for |a| < ~0.05 rad (300 km)."""
    a2 = a * a
    sin_a = a * (1.0 - a2 / 6.0 * (1.0 - a2 / 20.0 * (1.0 - a2 / 42.0)))
    cos_a = 1.0 - a2 / 2.0 * (1.0 - a2 / 12.0 * (1.0 - a2 / 30.0))
    return sin_a, cos_a


def grad_safe_norm(x, y, z=None):
    """sqrt(x^2 + y^2 [+ z^2]) with a finite reverse-mode gradient at 0.

    The raw sqrt's backward is inf at 0; a centroid landing exactly on
    the source origin (the central cell of a symmetric rupture) then
    poisons engine.global_misfits_and_grad with NaNs.  The double-where
    keeps forward values bit-identical and yields the 0 subgradient at
    the (measure-zero) kink instead."""
    s = x * x + y * y
    if z is not None:
        s = s + z * z
    is0 = s == 0.0
    return jnp.where(is0, 0.0, jnp.sqrt(jnp.where(is0, 1.0, s)))


def centroid_geodesy(dnorth, deast, rec):
    """(azi, bazi, dist) from a centroid displaced (dnorth, deast) m.

    Numerically-stable equivalent of approx_differential_azidist's exact
    spherical branch (orthodrome.f90:121-152): the arc distance is computed
    as atan2(|P x B|, P.B) of unit vectors in the source-origin tangent
    frame, with sin/cos of the receiver arc precomputed host-side and
    sin/cos of the small centroid arc from polynomials.  Quadrant fixes and
    azimuth conventions follow the reference exactly.

    rec: dict from ReceiverGeometry.device() sliced to one receiver.
    """
    dn = dnorth.astype(F64)
    de = deast.astype(F64)
    r = grad_safe_norm(dn, de)
    a = r / geo.EARTHRADIUS
    sin_a, cos_a = _poly_sincos(a)

    safe_r = jnp.where(r == 0.0, 1.0, r)
    sin_lam = de / safe_r
    cos_lam = jnp.where(r == 0.0, 1.0, dn / safe_r)
    # arctan2(0, 0) = arctan2(0, 1) = 0 forward, but only the latter has a
    # finite backward (the partials divide by dn^2 + de^2)
    lam = jnp.arctan2(de, jnp.where(r == 0.0, 1.0, dn))

    sin_b, cos_b = rec["sin_b"], rec["cos_b"]
    sin_azi, cos_azi = rec["sin_azi"], rec["cos_azi"]

    # unit vectors in (east, north, up) at the source origin
    pe, pn, pu = sin_a * sin_lam, sin_a * cos_lam, cos_a
    be, bn, bu = sin_b * sin_azi, sin_b * cos_azi, cos_b

    cos_c = pe * be + pn * bn + pu * bu
    cx = pn * bu - pu * bn
    cy = pu * be - pe * bu
    cz = pe * bn - pn * be
    sin_c = grad_safe_norm(cx, cy, cz)
    c = jnp.arctan2(sin_c, cos_c)

    sin_gamma = sin_azi * cos_lam - cos_azi * sin_lam  # sin(azi - lam)
    safe_sin_c = jnp.where(sin_c == 0.0, 1.0, sin_c)
    alpha = jnp.arcsin(jnp.clip(sin_a * sin_gamma / safe_sin_c, -1.0, 1.0))
    beta = jnp.arcsin(jnp.clip(sin_b * sin_gamma / safe_sin_c, -1.0, 1.0))

    pi = jnp.pi
    alpha = jnp.where(
        cos_a - cos_b * cos_c < 0,
        jnp.where(alpha > 0, pi - alpha, -pi - alpha),
        alpha,
    )
    beta = jnp.where(
        cos_b - cos_a * cos_c < 0,
        jnp.where(beta > 0, pi - beta, -pi - beta),
        beta,
    )

    new_dist = c * geo.EARTHRADIUS
    new_bazi = geo.wrap(rec["bazi"] + alpha, -pi, pi)
    new_azi = geo.wrap(lam - pi - beta, -pi, pi)

    is0 = r == 0.0
    return (
        jnp.where(is0, rec["azi"], new_azi),
        jnp.where(is0, rec["bazi"], new_bazi),
        jnp.where(is0, rec["dist"], new_dist),
    )


def centroid_geodesy_fast(dnorth, deast, rec):
    """TPU-fast differential geodesy: float32, no inverse trig, no f64.

    Same spherical triangle as `centroid_geodesy` (the exact-sphere branch of
    approx_differential_azidist, orthodrome.f90:121-152), but returning the
    sines/cosines the synthesis actually consumes instead of the angles:

      sin/cos(azi')   -- feeds make_weights (the f1..f6 combination)
      sin/cos(alpha)  -- alpha = bazi' - bazi is exactly the rotation angle
                         `lam` of seismogram.f90:195-204
      dist'           -- feeds gf_indices (the reference itself casts the
                         distance to f32 at gfdb_get_indices)

    The angle sines/cosines come from the spherical law of sines/cosines with
    the cancellation-prone numerators (cos a - cos b cos c) rewritten as
      pu*(be^2 + bn^2) - bu*(pe*be + pn*bn)
    which is a sum of same-magnitude products -- accurate in f32 where the
    naive difference of near-1 cosines is pure roundoff.  Everything else is
    well-conditioned products of unit-vector components, so f32 results match
    the f64 path to ~1e-6 relative (<< the GF grid spacing and the
    reference's own f32 casts).

    Returns (sin_azi', cos_azi', sin_alpha, cos_alpha, dist').
    """
    dn = dnorth.astype(F32)
    de = deast.astype(F32)
    r = grad_safe_norm(dn, de)
    a = r / jnp.float32(geo.EARTHRADIUS)
    a2 = a * a
    sin_a = a * (1.0 - a2 / 6.0 * (1.0 - a2 / 20.0))
    cos_a = 1.0 - a2 / 2.0 * (1.0 - a2 / 12.0)

    safe_r = jnp.where(r == 0.0, 1.0, r)
    sin_lam = de / safe_r
    cos_lam = jnp.where(r == 0.0, 1.0, dn / safe_r)

    sin_b = rec["sin_b"].astype(F32)
    cos_b = rec["cos_b"].astype(F32)
    sin_azi = rec["sin_azi"].astype(F32)
    cos_azi = rec["cos_azi"].astype(F32)

    # unit vectors (east, north, up) at the source origin
    pe, pn, pu = sin_a * sin_lam, sin_a * cos_lam, cos_a
    be, bn, bu = sin_b * sin_azi, sin_b * cos_azi, cos_b

    horiz = pe * be + pn * bn
    cos_c = horiz + pu * bu
    cx = pn * bu - pu * bn
    cy = pu * be - pe * bu
    cz = pe * bn - pn * be
    sin_c = grad_safe_norm(cx, cy, cz)
    dist = jnp.arctan2(sin_c, cos_c) * jnp.float32(geo.EARTHRADIUS)

    sin_gamma = sin_azi * cos_lam - cos_azi * sin_lam  # sin(azi - lam)
    safe_sc = jnp.where(sin_c == 0.0, 1.0, sin_c)

    # angle at the receiver vertex (alpha = bazi' - bazi):
    #   sin = sin_a sin_gamma / sin_c, cos = (cos a - cos b cos c)/(sin b sin c)
    num_alpha = pu * (be * be + bn * bn) - bu * horiz
    safe_sb = jnp.where(sin_b == 0.0, 1.0, sin_b)
    sin_al = sin_a * sin_gamma / safe_sc
    cos_al = num_alpha / (safe_sb * safe_sc)

    # angle at the centroid vertex (beta), then azi' = lam - pi - beta
    num_beta = bu * (pe * pe + pn * pn) - pu * horiz
    safe_sa = jnp.where(sin_a == 0.0, 1.0, sin_a)
    sin_be = sin_b * sin_gamma / safe_sc
    cos_be = num_beta / (safe_sa * safe_sc)
    sin_azi_new = -(sin_lam * cos_be - cos_lam * sin_be)
    cos_azi_new = -(cos_lam * cos_be + sin_lam * sin_be)

    is0 = r == 0.0
    one = jnp.ones_like(sin_al)
    zero = jnp.zeros_like(sin_al)
    return (
        jnp.where(is0, sin_azi, sin_azi_new),
        jnp.where(is0, cos_azi, cos_azi_new),
        jnp.where(is0, zero, sin_al),
        jnp.where(is0, one, cos_al),
        jnp.where(is0, rec["dist"].astype(F32), dist),
    )


def make_weights(azimuth, m6):
    """Azimuth-dependent MT combination weights f1..f6 (seismogram.f90:316-336).

    azimuth: f32 scalar/array; m6: f32[..., 6] as (mxx,myy,mzz,mxy,mxz,myz).
    """
    azimuth = azimuth.astype(F32)
    return make_weights_sc(jnp.sin(azimuth), jnp.cos(azimuth), m6)


def make_weights_sc(sa, ca, m6):
    """make_weights from (sin, cos) of the azimuth directly (double angles
    by identity) -- lets the geodesy skip producing the angle itself."""
    s2a = 2.0 * sa * ca
    c2a = ca * ca - sa * sa
    m = m6
    f1 = m[..., 0] * ca**2 + m[..., 1] * sa**2 + m[..., 3] * s2a
    f2 = m[..., 4] * ca + m[..., 5] * sa
    f3 = m[..., 2]
    f4 = 0.5 * (m[..., 1] - m[..., 0]) * s2a + m[..., 3] * c2a
    f5 = m[..., 5] * ca - m[..., 4] * sa
    f6 = m[..., 0] * sa**2 + m[..., 1] * ca**2 - m[..., 3] * s2a
    return jnp.stack([f1, f2, f3, f4, f5, f6], axis=-1)


# ---------------------------------------------------------------------------
# static synthesis configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthConfig:
    """Static (compile-time) parameters of the synthesis kernel."""

    # GF grid metadata
    dt: float
    dx: float
    dz: float
    firstx: float
    firstz: float
    ng: int
    nt: int  # stored trace length
    # GF window (node subrange held in VMEM/HBM for this problem)
    ix0: int
    nxw: int
    iz0: int
    nzw: int
    # output time window (absolute sample indices, time = i*dt)
    out_it0: int
    nt_out: int
    # integer-shift tap range: ish in [s_base, s_base + s_len)
    s_base: int
    s_len: int
    # options (minimizer_engine.f90:85-87)
    interpolate: bool = True
    xunder: int = 1
    zunder: int = 1


def gf_indices(cfg: SynthConfig, x, z, ix0=None):
    """Window-relative bilinear indices + fractional weights.

    Port of gfdb_get_indices / gfdb_get_indices_bilin (gfdb.f90:781-815),
    0-based, computed in float32 like the reference (it passes real(dist)).
    Returns ix[2], iz[2] (window-relative, clipped), dix, diz, valid.

    ix0: optional dynamic window origin overriding the static cfg.ix0 --
    used by distance-sharded GF stores where each device holds a window at
    a different offset (parallel/gfshard.py).
    """
    x = x.astype(F32)
    z = z.astype(F32)
    dxf = jnp.asarray(cfg.dx, F32)
    dzf = jnp.asarray(cfg.dz, F32)
    fx = jnp.asarray(cfg.firstx, F32)
    fz = jnp.asarray(cfg.firstz, F32)
    if cfg.interpolate:
        xu = jnp.asarray(cfg.xunder, F32)
        zu = jnp.asarray(cfg.zunder, F32)
        ix1 = (jnp.floor((x - fx) / (dxf * xu)) * cfg.xunder).astype(I32)
        iz1 = (jnp.floor((z - fz) / (dzf * zu)) * cfg.zunder).astype(I32)
        ix2 = ix1 + cfg.xunder
        iz2 = iz1 + cfg.zunder
        dix = (x - fx - ix1.astype(F32) * dxf) / (dxf * xu)
        diz = (z - fz - iz1.astype(F32) * dzf) / (dzf * zu)
    else:
        from .gf.trace import jnint

        ix1 = jnint((x - fx) / dxf)
        iz1 = jnint((z - fz) / dzf)
        ix2 = ix1 + 1
        iz2 = iz1 + 1
        dix = jnp.zeros_like(x)
        diz = jnp.zeros_like(z)

    base_ix0 = cfg.ix0 if ix0 is None else ix0
    ixs = jnp.stack([ix1, ix2]) - base_ix0
    izs = jnp.stack([iz1, iz2]) - cfg.iz0
    valid = (
        (ixs[0] >= 0)
        & (ixs[1] < cfg.nxw)
        & (izs[0] >= 0)
        & (izs[1] < cfg.nzw)
    )
    ixs = jnp.clip(ixs, 0, cfg.nxw - 1)
    izs = jnp.clip(izs, 0, cfg.nzw - 1)
    return ixs, izs, dix, diz, valid


def _group_weights(f, cos_l, sin_l, ng):
    """Per-GF-component weights for the three ard channels.

    Implements the component/weight mapping of seismogram.f90:171-251 with
    the per-centroid backazimuth rotation (:195-204) folded in:
      away  channel: cos(l)*[f1,f2,f3 on g=0..2, f6 on g=8] - sin(l)*[f4,f5 on g=3..4]
      right channel: sin(l)*[...] + cos(l)*[f4,f5]
      down  channel: f1,f2,f3 on g=5..7, f6 on g=9
    Returns wg[..., 3, ng].
    """
    z = jnp.zeros_like(f[..., 0])
    f1, f2, f3, f4, f5, f6 = (f[..., i] for i in range(6))
    away = [cos_l * f1, cos_l * f2, cos_l * f3, -sin_l * f4, -sin_l * f5, z, z, z]
    right = [sin_l * f1, sin_l * f2, sin_l * f3, cos_l * f4, cos_l * f5, z, z, z]
    down = [z, z, z, z, z, f1, f2, f3]
    if ng == 10:
        away += [cos_l * f6, z]
        right += [sin_l * f6, z]
        down += [z, f6]
    return jnp.stack(
        [jnp.stack(away, axis=-1), jnp.stack(right, axis=-1), jnp.stack(down, axis=-1)],
        axis=-2,
    )


def _centroid_kinematics(cfg: SynthConfig, rec, centroids):
    """Shared per-centroid computation: geodesy, weights, indices, taps.

    centroids: dict with north, east, depth, time f32[C]; m f32[C, 6].
    Returns dict of per-centroid quantities.
    """
    sin_az, cos_az, sin_l, cos_l, dist = jax.vmap(
        lambda dn, de: centroid_geodesy_fast(dn, de, rec)
    )(centroids["north"], centroids["east"])

    f = make_weights_sc(sin_az, cos_az, centroids["m"])  # [C, 6]

    z = centroids["depth"] - rec["depth"].astype(F32)
    ix0 = rec.get("window_ix0")  # dynamic window origin (gfshard)
    ixs, izs, dix, diz, valid = jax.vmap(
        lambda x, zz: gf_indices(cfg, x, zz, ix0=ix0)
    )(dist.astype(F32), z)

    rshift = centroids["time"].astype(F32) / jnp.asarray(cfg.dt, F32)
    ish = jnp.floor(rshift).astype(I32)
    frac = rshift - ish.astype(F32)

    # bilinear spatial weights (gfdb.f90:945-948); exact-node case keeps the
    # same values since dix==diz==0 collapses to the single trace
    w00 = (1.0 - dix) * (1.0 - diz)
    w01 = (1.0 - dix) * diz
    w10 = dix * (1.0 - diz)
    w11 = dix * diz
    wsp = jnp.stack([w00, w01, w10, w11], axis=-1)  # [C, 4]

    wg = _group_weights(f, cos_l, sin_l, cfg.ng)  # [C, 3, ng]

    if "active" in centroids:
        valid = valid & centroids["active"]

    return {
        "ixs": ixs,  # [C, 2] window-relative
        "izs": izs,
        "wsp": wsp,  # [C, 4] order (00, 01, 10, 11)
        "wg": wg,  # [C, 3, ng]
        "ish": ish,  # [C]
        "frac": frac,  # [C]
        "valid": valid,  # [C]
        "bazi": rec["bazi"],
        # angle factors kept so moment-only batches can rebuild wg for new
        # m6 without redoing the geodesy (weights_from_angles)
        "sin_az": sin_az,
        "cos_az": cos_az,
        "sin_l": sin_l,
        "cos_l": cos_l,
        "f": f,  # [C, 6] MT radiation weights (ops/synth_window consumes)
    }


def weights_from_angles(kin, m6, ng):
    """wg [.., 3, ng] for a new m6 on fixed kinematics (the batched version
    of the reference's only_moment_changed shortcut, psm_set_source_params /
    minimizer_engine.f90 dirty-flag dataflow: a moment-tensor-only change
    skips re-synthesis of the GF values)."""
    f = make_weights_sc(kin["sin_az"], kin["cos_az"], m6)
    return _group_weights(f, kin["cos_l"], kin["sin_l"], ng)


def values_matrix(ext, cfg: SynthConfig, kin, group_size=1):
    """Per-centroid GF values v f32[C, ng, nt_out]: bilinear-blended,
    fractionally time-shifted -- everything of the synthesis EXCEPT the
    moment-weight contraction (out = sum_c wg_c @ v_c).  Shared-kinematics
    batches compute this once and contract per-source weights against it."""
    c = kin["ish"].shape[0]
    g = group_size if (group_size > 1 and c % group_size == 0) else 1
    p = c // g
    start_k = cfg.s_base + cfg.s_len - 1
    ext2 = ext.reshape(cfg.nxw * cfg.nzw, cfg.ng, -1)
    ixs, izs = kin["ixs"][::g], kin["izs"][::g]
    nodes = jnp.stack(
        [
            ixs[:, 0] * cfg.nzw + izs[:, 0],
            ixs[:, 0] * cfg.nzw + izs[:, 1],
            ixs[:, 1] * cfg.nzw + izs[:, 0],
            ixs[:, 1] * cfg.nzw + izs[:, 1],
        ],
        axis=-1,
    )

    def one_group(nd, wsp, ishs, fracs):
        blended = (
            wsp[0] * ext2[nd[0]] + wsp[1] * ext2[nd[1]]
            + wsp[2] * ext2[nd[2]] + wsp[3] * ext2[nd[3]]
        )  # [ng, nt_ext]

        def one_c(ish, fr):
            sl = jax.lax.dynamic_slice_in_dim(
                blended, start_k - ish, cfg.nt_out + 1, axis=-1)
            return (1.0 - fr) * sl[:, 1:] + fr * sl[:, :-1]

        return jax.vmap(one_c)(ishs, fracs)  # [G, ng, nt_out]

    grp = lambda a: a.reshape((p, g) + a.shape[1:])
    v = jax.vmap(one_group)(
        nodes, kin["wsp"][::g], grp(kin["ish"]), grp(kin["frac"])
    )  # [P, G, ng, nt_out]
    return v.reshape(c, cfg.ng, cfg.nt_out)


# ---------------------------------------------------------------------------
# direct (oracle) path
# ---------------------------------------------------------------------------


def synthesize_ard_direct(gf_data, gf_itmin, cfg: SynthConfig, rec, centroids):
    """Reference-dataflow synthesis: per-centroid gathers (semantics oracle).

    gf_data: f32[nxw, nzw, ng, nt] window of the store; gf_itmin likewise.
    Returns ard f32[3, nt_out].
    """
    kin = _centroid_kinematics(cfg, rec, centroids)
    jout = cfg.out_it0 + jnp.arange(cfg.nt_out)

    def one_centroid(ixs, izs, wsp, wg, ish, frac, valid):
        rows = gf_data[ixs[:, None], izs[None, :]]  # [2, 2, ng, nt]
        its = gf_itmin[ixs[:, None], izs[None, :]]  # [2, 2, ng]
        idx = (jout - ish)[None, None, None, :]
        v0 = sample_ext(rows, its, jnp.broadcast_to(idx, rows.shape[:3] + (cfg.nt_out,)))
        v1 = sample_ext(rows, its, jnp.broadcast_to(idx - 1, rows.shape[:3] + (cfg.nt_out,)))
        v = (1.0 - frac) * v0 + frac * v1  # [2, 2, ng, nt_out]
        wsp4 = wsp.reshape(2, 2)
        blended = jnp.einsum("ab,abgt->gt", wsp4, v, precision=HIGHEST)  # [ng, nt_out]
        out = jnp.einsum("og,gt->ot", wg, blended, precision=HIGHEST)  # [3, nt_out]
        return jnp.where(valid, 1.0, 0.0) * out

    ard = jax.vmap(one_centroid)(
        kin["ixs"], kin["izs"], kin["wsp"], kin["wg"], kin["ish"], kin["frac"], kin["valid"]
    ).sum(axis=0)
    return ard


# ---------------------------------------------------------------------------
# fast path: scatter + convolution
# ---------------------------------------------------------------------------


def materialize_window(gf_data, gf_itmin, cfg: SynthConfig):
    """Edge-extend the GF window onto the absolute index range needed by the
    convolution: e0 = out_it0 - s_base - s_len, length nt_out + s_len (the
    tap axis has s_len + 1 entries; the extra tap covers the
    fractional-shift sample).

    Returns ext f32[nxw, nzw, ng, nt_ext]; precomputed once per config and
    reused for every source (it replaces the reference's in-loop cache of
    interpolated traces, gfdb.f90:912-943).
    """
    e0 = cfg.out_it0 - cfg.s_base - cfg.s_len
    nt_ext = cfg.nt_out + cfg.s_len
    idx = e0 + jnp.arange(nt_ext)
    shape = gf_data.shape[:3] + (nt_ext,)
    return sample_ext(gf_data, gf_itmin, jnp.broadcast_to(idx, shape))


def scatter_weight_kernel(cfg: SynthConfig, kin):
    """Accumulate per-centroid weights onto the (node, g, tap) lattice.

    The fractional shift becomes two taps at ish and ish+1 with weights
    (1-frac, frac) -- exactly trace_multiply_add's linear interpolation
    (sparse_trace.f90:639-646).  Returns W f32[3, nxw, nzw, ng, s_len + 1].
    """
    c = kin["ish"].shape[0]
    s_rel = kin["ish"] - cfg.s_base  # [C]
    taps = jnp.stack([1.0 - kin["frac"], kin["frac"]], axis=-1)  # [C, 2]
    svals = jnp.stack([s_rel, s_rel + 1], axis=-1)  # [C, 2]

    vmask = jnp.where(kin["valid"], 1.0, 0.0)
    # [C, 4, 2] spatial x tap weights
    wst = (vmask[:, None] * kin["wsp"])[:, :, None] * taps[:, None, :]
    # full value tensor [C, 4, 2, 3, ng]
    vals = wst[:, :, :, None, None] * kin["wg"][:, None, None, :, :]

    ixn = jnp.broadcast_to(
        jnp.repeat(kin["ixs"], 2, axis=-1)[:, :, None], (c, 4, 2)
    )  # order 00,01,10,11 -> ix: [x1,x1,x2,x2]
    izn = jnp.broadcast_to(jnp.tile(kin["izs"], (1, 2))[:, :, None], (c, 4, 2))
    sn = jnp.clip(jnp.broadcast_to(svals[:, None, :], (c, 4, 2)), 0, cfg.s_len)

    w = jnp.zeros((cfg.nxw, cfg.nzw, cfg.s_len + 1, 3, cfg.ng), dtype=F32)
    w = w.at[ixn, izn, sn].add(vals.astype(F32))
    return jnp.moveaxis(jnp.moveaxis(w, 3, 0), -1, 3)  # [3, nxw, nzw, ng, s+1]


def synthesize_ard(ext, cfg: SynthConfig, rec, centroids):
    """Fast synthesis: weight scatter + one convolution against the
    pre-extended GF window `ext` (from materialize_window)."""
    kin = _centroid_kinematics(cfg, rec, centroids)
    w = scatter_weight_kernel(cfg, kin)  # [3, nxw, nzw, ng, S]

    s = cfg.s_len + 1
    feat = cfg.nxw * cfg.nzw * cfg.ng
    lhs = ext.reshape(1, feat, -1)  # [1, F, nt_ext]
    rhs = jnp.flip(w.reshape(3, feat, s), axis=-1)  # correlation -> conv kernel
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=F32,
        precision=HIGHEST,
    )
    return out[0]  # [3, nt_out]


def physical_spans(gf_itmin, gf_nsamples, cfg: SynthConfig, kin):
    """Per-channel physical data spans of the synthesized traces.

    Mirrors the span growth of trace_multiply_add (sparse_trace.f90:648-668):
    each centroid contributes [union(4-neighbor trace spans) + ish,
    ... + ish + 1] (the +1 is the fractional-shift extra sample); the away
    and right channels share a span (strip_extend_to_same_span in
    seismogram.f90:109-130).  Returns (lo i32[3], hi i32[3]) absolute
    indices, clipped to the output window.
    """
    rows_lo = gf_itmin[kin["ixs"][:, :, None], kin["izs"][:, None, :]]  # [C,2,2,ng]
    n = gf_nsamples[kin["ixs"][:, :, None], kin["izs"][:, None, :]]
    rows_hi = rows_lo + jnp.maximum(n - 1, 0)
    big = jnp.int32(1 << 30)
    empty = n == 0
    lo4 = jnp.where(empty, big, rows_lo).min(axis=(1, 2))  # [C, ng]
    hi4 = jnp.where(empty, -big, rows_hi).max(axis=(1, 2))

    groups = {
        0: [0, 1, 2, 3, 4] + ([8] if cfg.ng == 10 else []),  # away+right share
        2: [5, 6, 7] + ([9] if cfg.ng == 10 else []),
    }
    active = kin["valid"]
    lo_out = []
    hi_out = []
    for ch in (0, 0, 2):
        gs = groups[ch]
        glo = lo4[:, gs].min(axis=1) + kin["ish"]
        ghi = hi4[:, gs].max(axis=1) + kin["ish"] + 1
        glo = jnp.where(active, glo, big)
        ghi = jnp.where(active, ghi, -big)
        lo_out.append(glo.min())
        hi_out.append(ghi.max())
    lo = jnp.clip(jnp.stack(lo_out), cfg.out_it0, cfg.out_it0 + cfg.nt_out - 1)
    hi = jnp.clip(jnp.stack(hi_out), cfg.out_it0, cfg.out_it0 + cfg.nt_out - 1)
    return lo, hi


def span_tables(gf_itmin, gf_nsamples, cfg: SynthConfig):
    """Per-node span-union tables for physical_spans_from_tables.

    physical_spans gathers [C, 2, 2, ng] elements per (source, receiver) --
    on TPU those lower to per-element gathers and cost as much as the
    whole synthesis kernel (measured 10.9 ms for a 64x10x195 batch vs the
    window kernel's 12 ms).  The 4-neighbor x ng-component union depends
    only on the node, so it is precomputed here ONCE per plan with plain
    shifted slices (no gathers); the per-centroid part then gathers a
    single [4] row per centroid.

    Returns i32[nxw*nzw, 4]: (lo, hi) for channel group away/right and
    (lo, hi) for the down group, unioned over each node's 4 bilinear
    neighbors (+xu, +zu stencil) and the group's GF components, with empty
    traces (nsamples == 0) excluded via +/-big sentinels.  Rows whose
    +xu/+zu neighbor would leave the window carry the edge-clamped union;
    such centroids are invalid in gf_indices and masked out of the span
    reduction anyway.
    """
    big = jnp.int32(1 << 30)
    rows_lo = gf_itmin  # [nxw, nzw, ng]
    rows_hi = gf_itmin + jnp.maximum(gf_nsamples - 1, 0)
    empty = gf_nsamples == 0
    lo_n = jnp.where(empty, big, rows_lo)
    hi_n = jnp.where(empty, -big, rows_hi)

    g0 = [0, 1, 2, 3, 4] + ([8] if cfg.ng == 10 else [])  # away+right share
    g2 = [5, 6, 7] + ([9] if cfg.ng == 10 else [])

    xu = cfg.xunder if cfg.interpolate else 1
    zu = cfg.zunder if cfg.interpolate else 1

    def union4(a, reduce_min):
        # pad far edges so the +xu/+zu shifts clamp like gf_indices' clip
        mode = "edge"
        ap = jnp.pad(a, ((0, xu), (0, zu)), mode=mode)
        n1, n2 = a.shape
        parts = (ap[:n1, :n2], ap[:n1, zu:zu + n2],
                 ap[xu:xu + n1, :n2], ap[xu:xu + n1, zu:zu + n2])
        op = jnp.minimum if reduce_min else jnp.maximum
        out = parts[0]
        for p in parts[1:]:
            out = op(out, p)
        return out

    lo0 = union4(lo_n[..., g0].min(axis=-1), True)
    hi0 = union4(hi_n[..., g0].max(axis=-1), False)
    lo2 = union4(lo_n[..., g2].min(axis=-1), True)
    hi2 = union4(hi_n[..., g2].max(axis=-1), False)
    return jnp.stack(
        [lo0.reshape(-1), hi0.reshape(-1), lo2.reshape(-1), hi2.reshape(-1)],
        axis=-1,
    )


def physical_spans_from_tables(tables, cfg: SynthConfig, kin):
    """physical_spans via precomputed span_tables: one [4] row gather per
    centroid instead of [2, 2, ng] element gathers.  Semantics identical
    (tests pin both paths against each other)."""
    node = kin["ixs"][:, 0] * cfg.nzw + kin["izs"][:, 0]  # [C]
    t = tables[node]  # [C, 4]
    big = jnp.int32(1 << 30)
    active = kin["valid"]
    ish = kin["ish"]
    lo_out = []
    hi_out = []
    for ch in (0, 0, 2):
        col = 0 if ch == 0 else 2
        glo = t[:, col] + ish
        ghi = t[:, col + 1] + ish + 1
        glo = jnp.where(active, glo, big)
        ghi = jnp.where(active, ghi, -big)
        lo_out.append(glo.min())
        hi_out.append(ghi.max())
    lo = jnp.clip(jnp.stack(lo_out), cfg.out_it0, cfg.out_it0 + cfg.nt_out - 1)
    hi = jnp.clip(jnp.stack(hi_out), cfg.out_it0, cfg.out_it0 + cfg.nt_out - 1)
    return lo, hi


def _direct_accumulate(ext, cfg: SynthConfig, kin):
    """Per-centroid slice accumulation (the reference dataflow, vectorized).

    Cheaper than the conv path when the source has few centroids relative to
    the GF window size (point/compact sources over wide search windows).
    Works on the pre-extended window `ext` (materialize_window) so the time
    shift is one contiguous dynamic slice per centroid instead of an
    elementwise gather -- TPUs move contiguous blocks orders of magnitude
    faster than per-element indexed loads.
    """
    e0 = cfg.out_it0 - cfg.s_base - cfg.s_len

    def one_centroid(ixs, izs, wsp, wg, ish, frac, valid):
        rows = ext[ixs[:, None], izs[None, :]]  # [2, 2, ng, nt_ext]
        # slice covering absolute indices [out_it0 - ish - 1, ... + nt_out]
        start = (cfg.out_it0 - e0 - 1) - ish  # in [0, nt_ext - nt_out - 1]
        sl = jax.lax.dynamic_slice_in_dim(rows, start, cfg.nt_out + 1, axis=-1)
        v = (1.0 - frac) * sl[..., 1:] + frac * sl[..., :-1]
        blended = jnp.einsum("ab,abgt->gt", wsp.reshape(2, 2), v, precision=HIGHEST)
        return jnp.where(valid, 1.0, 0.0) * jnp.einsum("og,gt->ot", wg, blended, precision=HIGHEST)

    return jax.vmap(one_centroid)(
        kin["ixs"], kin["izs"], kin["wsp"], kin["wg"], kin["ish"], kin["frac"], kin["valid"]
    ).sum(axis=0)


def _grouped_accumulate(ext, cfg: SynthConfig, kin, group_size):
    """Slice accumulation with the GF gather shared across centroid groups.

    Every finite-source discretizer emits its centroid table as
    [spatial cell, STF time point] flattened row-major (mirroring the
    (ip, it) nesting of psm_to_tdsm_table_*, e.g. source_bilat.f90:429-442),
    so runs of `group_size` consecutive centroids share (north, east, depth)
    exactly -- hence the same GF neighborhood, bilinear weights and spatial
    blend.  Doing the 4-trace gather and the bilinear reduction ONCE per
    group over the full extended window cuts HBM traffic by ~4x/G vs
    `_direct_accumulate`; only the (cheap) per-centroid time slice, 2-tap
    fractional shift and MT-weight contraction remain per centroid.

    Mathematically identical to the ungrouped path (the bilinear blend and
    the time shift are both linear and commute); float32 rounding differs at
    the last bit.
    """
    c = kin["ish"].shape[0]
    g = group_size
    p = c // g
    start_k = cfg.out_it0 - (cfg.out_it0 - cfg.s_base - cfg.s_len) - 1  # K

    # flatten the spatial node axes so the bilinear blend is four row
    # gathers combined elementwise (a dot_general over the tiny [2, 2]
    # neighbor axes forces XLA to materialize the gather in a badly padded
    # layout; the add chain fuses instead)
    ext2 = ext.reshape(cfg.nxw * cfg.nzw, cfg.ng, -1)  # [N, ng, nt_ext]
    ixs, izs = kin["ixs"][::g], kin["izs"][::g]  # [P, 2] each
    nodes = jnp.stack(
        [
            ixs[:, 0] * cfg.nzw + izs[:, 0],  # 00
            ixs[:, 0] * cfg.nzw + izs[:, 1],  # 01
            ixs[:, 1] * cfg.nzw + izs[:, 0],  # 10
            ixs[:, 1] * cfg.nzw + izs[:, 1],  # 11
        ],
        axis=-1,
    )  # [P, 4] matching kin["wsp"]'s (00, 01, 10, 11) order

    def one_group(nd, wsp, wgs, ishs, fracs, valids):
        blended = (
            wsp[0] * ext2[nd[0]]
            + wsp[1] * ext2[nd[1]]
            + wsp[2] * ext2[nd[2]]
            + wsp[3] * ext2[nd[3]]
        )  # [ng, nt_ext]

        def one_c(ish):
            # absolute indices [out_it0 - ish - 1, ... + nt_out]
            return jax.lax.dynamic_slice_in_dim(
                blended, start_k - ish, cfg.nt_out + 1, axis=-1
            )

        sl = jax.vmap(one_c)(ishs)  # [G, ng, nt_out + 1]
        fr = fracs[:, None, None]
        v = (1.0 - fr) * sl[..., 1:] + fr * sl[..., :-1]  # [G, ng, nt_out]
        wv = jnp.where(valids, 1.0, 0.0)[:, None, None] * wgs  # [G, 3, ng]
        return jnp.einsum("cog,cgt->ot", wv, v, precision=HIGHEST)  # [3, nt_out]

    def grp(a):
        return a.reshape((p, g) + a.shape[1:])

    out = jax.vmap(one_group)(
        nodes, kin["wsp"][::g],
        grp(kin["wg"]), grp(kin["ish"]), grp(kin["frac"]), grp(kin["valid"]),
    )
    return out.sum(axis=0)


def synthesize_with_spans(ext, gf_itmin, gf_nsamples, cfg: SynthConfig, rec, centroids,
                          gf_data=None, path="conv", group_size=1,
                          span_tab=None):
    """Synthesis plus physical span tracking.

    path="conv": scatter+convolution over the window (best for many
    centroids / compact windows); path="direct": per-centroid slices of the
    extended window (best for few centroids / wide search windows).  Both
    need `ext` from materialize_window.  group_size > 1 (direct path only)
    asserts that runs of `group_size` consecutive centroids share their
    spatial position and shares their GF gather (see _grouped_accumulate).
    Returns (ard f32[3, nt_out], lo i32[3], hi i32[3]).
    """
    kin = _centroid_kinematics(cfg, rec, centroids)
    if path == "direct":
        c = kin["ish"].shape[0]
        if group_size > 1 and c % group_size == 0:
            out = _grouped_accumulate(ext, cfg, kin, group_size)
        else:
            out = _direct_accumulate(ext, cfg, kin)
    else:
        w = scatter_weight_kernel(cfg, kin)
        s = cfg.s_len + 1
        feat = cfg.nxw * cfg.nzw * cfg.ng
        lhs = ext.reshape(1, feat, -1)
        rhs = jnp.flip(w.reshape(3, feat, s), axis=-1)
        out = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=F32,
            precision=HIGHEST,
        )[0]
    if span_tab is not None:  # precomputed per-node union tables (fast)
        lo, hi = physical_spans_from_tables(span_tab, cfg, kin)
    else:
        lo, hi = physical_spans(gf_itmin, gf_nsamples, cfg, kin)
    return out, lo, hi


# ---------------------------------------------------------------------------
# final component assembly
# ---------------------------------------------------------------------------

# component ids as in receiver.f90:35-48
C_AWAY, C_RIGHT, C_DOWN, C_NORTH, C_EAST = 1, 2, 3, 4, 5
COMPONENT_IDS = {
    "a": C_AWAY, "c": -C_AWAY,
    "r": C_RIGHT, "l": -C_RIGHT,
    "d": C_DOWN, "u": -C_DOWN,
    "n": C_NORTH, "s": -C_NORTH,
    "e": C_EAST, "w": -C_EAST,
}


def ard_to_components(ard, bazi, component_ids):
    """Map (away, right, down) channels to requested components.

    component_ids: static tuple of signed ids (COMPONENT_IDS values).
    north/east = rotate (away, right) by bazi+pi (seismogram.f90:268-283).
    Returns f32[ncomp, nt_out].
    """
    away, right, down = ard[0], ard[1], ard[2]
    cl = jnp.cos(bazi + jnp.pi).astype(F32)
    sl = jnp.sin(bazi + jnp.pi).astype(F32)
    north = cl * away - sl * right
    east = cl * right + sl * away
    basis = {C_AWAY: away, C_RIGHT: right, C_DOWN: down, C_NORTH: north, C_EAST: east}
    rows = [jnp.sign(cid) * basis[abs(cid)] for cid in component_ids]
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# config construction helpers (host side)
# ---------------------------------------------------------------------------


def _round_up(x, m):
    return -(-int(x) // m) * m


def plan_config(
    store: GFStore,
    geom: ReceiverGeometry,
    extent_m: float,
    depth_range: tuple,
    time_range: tuple,
    interpolate: bool = True,
    xunder: int = 1,
    zunder: int = 1,
) -> SynthConfig:
    """Choose static window/tap/output bounds covering a source search space.

    extent_m: max horizontal half-extent of any discretized source (m);
    depth_range: (min, max) centroid depth (m); time_range: (min, max)
    centroid time (s).  Bounds are conservative; sizes are rounded up to
    limit recompilation across configs.
    """
    dist_lo = float(geom.dist.min()) - extent_m
    dist_hi = float(geom.dist.max()) + extent_m
    ix_lo = int(np.floor((dist_lo - store.firstx) / (store.dx * xunder))) * xunder - 1
    ix_hi = int(np.ceil((dist_hi - store.firstx) / (store.dx * xunder))) * xunder + xunder + 1
    ix_lo = max(ix_lo, 0)
    ix_hi = min(ix_hi, store.nx - 1)

    zmin = depth_range[0] - float(geom.depth.max())
    zmax = depth_range[1] - float(geom.depth.min())
    iz_lo = int(np.floor((zmin - store.firstz) / (store.dz * zunder))) * zunder - 1
    iz_hi = int(np.ceil((zmax - store.firstz) / (store.dz * zunder))) * zunder + zunder + 1
    iz_lo = max(iz_lo, 0)
    iz_hi = min(iz_hi, store.nz - 1)

    if ix_hi < ix_lo or iz_hi < iz_lo:
        raise ValueError(
            "source/receiver geometry lies outside the GF store coverage: "
            f"distances [{dist_lo:.0f}, {dist_hi:.0f}] m need ix [{ix_lo}, {ix_hi}] "
            f"(store nx={store.nx}), depths [{zmin:.0f}, {zmax:.0f}] m need "
            f"iz [{iz_lo}, {iz_hi}] (store nz={store.nz})"
        )
    nxw = _round_up(ix_hi - ix_lo + 1, 2)
    nzw = _round_up(iz_hi - iz_lo + 1, 2)
    nxw = min(nxw, store.nx - ix_lo)
    nzw = min(nzw, store.nz - iz_lo)

    s_base = int(np.floor(time_range[0] / store.dt)) - 1
    s_hi = int(np.ceil(time_range[1] / store.dt)) + 1
    s_len = _round_up(s_hi - s_base + 1, 8)

    # span of stored traces inside the window
    sub_n = store.nsamples[ix_lo : ix_lo + nxw, iz_lo : iz_lo + nzw]
    sub_i = store.itmin[ix_lo : ix_lo + nxw, iz_lo : iz_lo + nzw]
    used = sub_n > 0
    if used.any():
        tr_lo = int(sub_i[used].min())
        tr_hi = int((sub_i + sub_n - 1)[used].max())
    else:
        tr_lo, tr_hi = 0, 1
    out_it0 = tr_lo + s_base
    nt_out = _round_up(tr_hi - tr_lo + 1 + s_len + 2, 16)

    return SynthConfig(
        dt=store.dt,
        dx=store.dx,
        dz=store.dz,
        firstx=store.firstx,
        firstz=store.firstz,
        ng=store.ng,
        nt=store.nt,
        ix0=ix_lo,
        nxw=nxw,
        iz0=iz_lo,
        nzw=nzw,
        out_it0=out_it0,
        nt_out=nt_out,
        s_base=s_base,
        s_len=s_len,
        interpolate=interpolate,
        xunder=xunder,
        zunder=zunder,
    )


def window_arrays(store: GFStore, cfg: SynthConfig):
    """Device arrays of the GF window selected by cfg."""
    sl = np.s_[cfg.ix0 : cfg.ix0 + cfg.nxw, cfg.iz0 : cfg.iz0 + cfg.nzw]
    return jnp.asarray(store.data[sl]), jnp.asarray(store.itmin[sl])


# ---------------------------------------------------------------------------
# synthesis-formulation selection (shared by the engine and the sharded
# forward so both pick the same path for the same plan shape)
# ---------------------------------------------------------------------------


def on_tpu():
    """True when the default device is real TPU hardware.  The backend
    PLATFORM name is not reliably "tpu" (the axon tunnel registers as
    "axon"); the device kind is."""
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:  # noqa: BLE001
        return False


@dataclasses.dataclass(frozen=True)
class Formulation:
    """Chosen synthesis formulation for one plan shape."""

    path: str  # "conv" | "direct"
    group_size: int
    use_window: bool  # shift-bucket Pallas kernel rides the direct layout
    per_source_bytes: int  # transient estimate, PER RECEIVER
    max_chunk: int | None  # SMEM-bound batch cap (window kernel only)


def choose_formulation(cfg: SynthConfig, ncent: int, gsize: int, nrec: int,
                       force=None):
    """Pick the synthesis formulation by per-source transient bytes: the
    dense scatter+conv kernel materializes W[3, window, ng, taps]; the
    direct path materializes per-centroid slices [C, 4, ng, nt_out+1]; the
    grouped-direct path shares the 4-trace gather across the gsize
    centroids of each spatial cell.  Estimates use the TPU-padded sizes --
    the minor two axes of every transient tile to (8 sublanes, 128 lanes).

    The window kernel (ops/synth_window) beats both XLA formulations
    whenever it applies (its transients are the lane-broadcast weight
    arrays, not gather/slice buffers) and rides the direct layout, so a
    kernel-eligible plan always picks direct regardless of the
    conv-vs-direct byte comparison.
    """
    import os

    from .ops import synth_window

    def _pad(n, m):
        return -(-int(n) // m) * m

    nt_ext = cfg.nt_out + cfg.s_len
    ng_p = _pad(cfg.ng, 8)
    conv_bytes = 3 * cfg.nxw * cfg.nzw * ng_p * _pad(cfg.s_len + 1, 128) * 4
    direct_bytes = ncent * 4 * ng_p * _pad(cfg.nt_out + 1, 128) * 4
    if gsize > 1 and ncent % gsize == 0:
        # x2 for multi-group sources: measured HBM high-water on v5e runs
        # ~2x this structural bound (gather/slice buffers double-buffered
        # by the scheduler); single-group (point-like) sources have tiny
        # transients and the x2 would needlessly split large grid-search
        # batches into chunks
        mult = 2 if ncent // gsize >= 2 else 1
        grouped_bytes = mult * (
            (ncent // gsize) * 4 * ng_p * _pad(nt_ext, 128)
            + ncent * ng_p * _pad(cfg.nt_out + 1, 128)
        ) * 4
    else:
        grouped_bytes = 1 << 62
    # grouped strictly reduces gather work vs ungrouped direct, so it wins
    # whenever the layout admits it; bytes only decide conv-vs-direct and
    # the chunk size
    if grouped_bytes < (1 << 62):
        dpath_bytes, dpath_group = grouped_bytes, gsize
    else:
        dpath_bytes, dpath_group = direct_bytes, 1
    kernel_ok = (
        os.environ.get("KIWI_WINDOW", "1") != "0"
        and synth_window.usable(cfg)
        and ncent % max(dpath_group, 1) == 0
        and (on_tpu() or os.environ.get("KIWI_WINDOW_INTERPRET") == "1")
    )
    if force is not None:  # benchmarking/debug override (engine.force_path)
        path, group_size = force
        psb = {
            ("conv", 1): conv_bytes,
            ("direct", 1): direct_bytes,
        }.get((path, group_size), grouped_bytes)
        return Formulation(path, group_size, False, psb, None)
    if kernel_ok or dpath_bytes <= conv_bytes:
        path, group_size, psb = "direct", dpath_group, dpath_bytes
    else:
        path, group_size, psb = "conv", 1, conv_bytes
    use_window = kernel_ok and path == "direct"
    if use_window:
        gw = max(group_size, 1)
        p_ = max(ncent // gw, 1)
        # groups taller than 8 are split into sub-groups at pack time
        # (synth_window.packed_g): operand shapes use the padded counts
        nsub = -(-gw // 8)
        gwp = min(gw, 8)
        p_p = p_ * nsub
        ncent_p = p_p * gwp
        # the kernel's transients are the lane-broadcast weight arrays +
        # kinematics, not the XLA path's gather/slice buffers
        psb = (p_p * (gwp * synth_window.NW + 4) * 128 * 4
               + ncent * 3 * cfg.ng * 4)
        # node/shift indices ride in SMEM via scalar prefetch (~1 MB/core
        # on v5e/v5p): node_rows are per receiver, kks once per source
        # (receiver-independent) -- cap the batch so the i32 words fit
        smem_words = nrec * p_p + ncent_p
        max_chunk = max(1, (800 * 1024 // 4) // max(smem_words, 1))
    else:
        max_chunk = None
    return Formulation(path, group_size, use_window, psb, max_chunk)
