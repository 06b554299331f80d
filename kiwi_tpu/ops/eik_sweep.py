"""Pallas fast-sweeping eikonal solver (batched anti-diagonal Gauss-Seidel).

The XLA formulation in kiwi_tpu/eikonal.py (`sweep_solve`, the device port
of the reference's heap FMM, eikonal.f90:128-189) runs each directional
sweep as a `lax.scan` over the K = nx + ny - 1 skewed anti-diagonal
columns.  Per batch of 384 sources that is 2232 sequential scan steps of
~1 MB fused loop bodies, and the measured wall time (33.6 ms at B=384,
benchmark/profile_eikonal.py) is ~10x the HBM-bandwidth floor: the cost is
per-step loop overhead, not math.

This kernel keeps the carry (the previous diagonal's updated column) in a
VMEM scratch register and walks CH columns per grid step, so the whole
directional sweep is one pallas_call whose sequential dependency lives
on-chip.  Layout: [K, nx, B] with the batch on lanes -- one skewed column
is an [nx, B] vreg tile and every per-cell quantity (da, dc, speed) is
either a lane-broadcast per-source scalar or a streamed block.  The causal
structure of the Zhao (2005) ordering is preserved exactly: column k reads
the *new* column k-1 (the scratch carry) and the *old* column k+1 (the
operand itself, delivered one chunk ahead via a second input ref), matching
`_diagonal_sweep`'s down_old/right_old construction.

Skew/unskew and the four direction flips stay in XLA (cheap gathers that
fuse); the kernel handles one canonical (+i, +j) sweep.  Seed cells need no
mask: they start at 0 and the Godunov update is a running min against a
strictly positive candidate, so they are fixed points of the iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
BIG = np.float32(1e30)
CH = 16  # skewed columns walked per grid step
BL = 128  # batch lanes per grid step


def _sweep_dir_kernel(da_ref, dc_ref, ts_ref, fs_ref, out_ref,
                      prev_ref, *, nx):
    """One directional sweep over CH columns of the skewed grid.

    ts_ref: [CH+1, nx, BL] times, columns [k*CH, k*CH+CH] -- an
    element-indexed window overlapping the next chunk by one column, so the
    last column's old right/down neighbors need no second operand;
    fs_ref: [CH, nx, BL] speeds; out_ref: updated times chunk k; prev_ref
    scratch [nx, BL]: the previous column's updated values, carried across
    the K grid dimension.
    """
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        prev_ref[...] = jnp.full((nx, BL), BIG, F32)

    da = da_ref[...]  # [1, BL] per-source grid spacings
    dc = dc_ref[...]
    da2 = da * da
    dc2 = dc * dc
    sum2 = da2 + dc2
    rsum2 = 1.0 / sum2
    row = jax.lax.broadcasted_iota(jnp.int32, (nx, BL), 0)
    first_row = row == 0
    last_row = row == nx - 1

    for c in range(CH):
        told = ts_ref[c]  # [nx, BL]
        nxt = ts_ref[c + 1]  # old col k+1 (kernel writes out_ref, not ts)
        f = fs_ref[c]
        prev = prev_ref[...]  # new col k-1
        # axis-0 (i) neighbors: up is new (prev diagonal), down is old
        up_new = jnp.where(first_row, BIG, pltpu.roll(prev, 1, 0))
        dn_old = jnp.where(last_row, BIG, pltpu.roll(nxt, nx - 1, 0))
        amin = jnp.minimum(up_new, dn_old)
        # axis-1 (j) neighbors: left is new, right is old (same rows)
        cmin = jnp.minimum(prev, nxt)
        # Godunov upwind quadratic (eikonal.py:_upwind, eikonal.f90:155-174)
        rf = 1.0 / f
        diff = (amin - cmin) * f
        s = da2 * dc2 * (sum2 - diff * diff)
        t2d = (amin * dc2 + cmin * da2 + jnp.sqrt(jnp.maximum(s, 0.0)) * rf
               ) * rsum2
        t1d = jnp.minimum(amin + da * rf, cmin + dc * rf)
        cand = jnp.where(
            (s >= 0.0) & (t2d >= jnp.maximum(amin, cmin)), t2d, t1d)
        tnew = jnp.minimum(told, cand)
        out_ref[c] = tnew
        prev_ref[...] = tnew


def _sweep_dir(ts, fs, da, dc, *, nx, interpret=False):
    """ts/fs: [K_pad, nx, Bp] skewed (pad cols = BIG / 1.0); da/dc [1, Bp].

    Returns updated ts (first K_pad - CH columns valid).
    """
    k_pad = ts.shape[0]
    bp = ts.shape[2]
    nk = k_pad // CH - 1  # last chunk is neighbor padding only
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_sweep_dir_kernel, nx=nx),
            grid=(bp // BL, nk),
            in_specs=[
                pl.BlockSpec((1, BL), lambda b, k: (0, b)),
                pl.BlockSpec((1, BL), lambda b, k: (0, b)),
                pl.BlockSpec(
                    (pl.Element(CH + 1), pl.Element(nx), pl.Element(BL)),
                    lambda b, k: (k * CH, 0, b * BL)),
                pl.BlockSpec((CH, nx, BL), lambda b, k: (k, 0, b)),
            ],
            out_specs=pl.BlockSpec((CH, nx, BL), lambda b, k: (k, 0, b)),
            out_shape=jax.ShapeDtypeStruct(ts.shape, F32),
            scratch_shapes=[pltpu.VMEM((nx, BL), F32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(da, dc, ts, fs)


def _skew_b(tb, fill, k_pad):
    """[B, nx, ny] -> [K_pad, nx, B]: row i shifted right by i so the
    anti-diagonal i + j = k is column k; columns >= nx+ny-1 padded."""
    b, nx, ny = tb.shape
    tp = jnp.pad(tb, ((0, 0), (0, 0), (0, k_pad - ny)), constant_values=fill)
    j = (jnp.arange(k_pad)[None, :] - jnp.arange(nx)[:, None]) % k_pad
    out = jnp.take_along_axis(tp, j[None, :, :], axis=2)  # [B, nx, K_pad]
    return out.transpose(2, 1, 0)


def _unskew_b(ts, nx, ny):
    """[K_pad, nx, B] -> [B, nx, ny]."""
    cols = jnp.arange(ny)[None, :] + jnp.arange(nx)[:, None]  # [nx, ny]
    out = ts[cols, jnp.arange(nx)[:, None], :]  # [nx, ny, B]
    return out.transpose(2, 0, 1)


def sweep_solve_batch(speed, delta, first, initial_point, n_rounds=3,
                      interpret=False):
    """Batched fast-sweeping arrival times via the Pallas column-scan kernel.

    speed: f32[B, nx, ny]; delta/first/initial_point: f32[B, 2].  Matches
    jax.vmap(eikonal.sweep_solve) to fp rounding (pinned in
    tests/test_eikonal.py); the same 4-direction x n_rounds schedule.
    """
    speed = jnp.asarray(speed, F32)
    b, nx, ny = speed.shape
    bp = -(-b // BL) * BL
    k = nx + ny - 1
    k_pad = (-(-k // CH) + 1) * CH

    dx = delta[:, 0].astype(F32)
    dy = delta[:, 1].astype(F32)
    ix = jnp.clip(((initial_point[:, 0] - first[:, 0]) / dx).astype(jnp.int32),
                  0, nx - 1)
    iy = jnp.clip(((initial_point[:, 1] - first[:, 1]) / dy).astype(jnp.int32),
                  0, ny - 1)
    seed = (jnp.arange(nx)[None, :, None] == ix[:, None, None]) & (
        jnp.arange(ny)[None, None, :] == iy[:, None, None])
    times = jnp.where(seed, 0.0, BIG)

    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        times = jnp.pad(times, pad, constant_values=BIG)
        speed = jnp.pad(speed, pad, constant_values=1.0)
        dx = jnp.pad(dx, (0, bp - b), constant_values=1.0)
        dy = jnp.pad(dy, (0, bp - b), constant_values=1.0)

    def flip(x, f0, f1):
        if f0:
            x = jnp.flip(x, 1)
        if f1:
            x = jnp.flip(x, 2)
        return x

    dirs = [(False, False), (False, True), (True, False), (True, True)]
    fs_d = [_skew_b(flip(speed, f0, f1), 1.0, k_pad) for f0, f1 in dirs]
    da = dx[None, :]
    dc = dy[None, :]

    def one_round(times, _):
        for (f0, f1), fs in zip(dirs, fs_d):
            ts = _skew_b(flip(times, f0, f1), BIG, k_pad)
            ts = _sweep_dir(ts, fs, da, dc, nx=nx, interpret=interpret)
            times = flip(_unskew_b(ts, nx, ny), f0, f1)
        return times, None

    times, _ = jax.lax.scan(one_round, times, None, length=n_rounds)
    return times[:b]
