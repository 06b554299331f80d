"""Eikonal solvers: rupture-front arrival times on a 2D grid.

The reference uses Sethian's fast-marching method with a binary heap
(eikonal.f90 + heap.f90) -- inherently sequential.  Device-side we use
*fast sweeping* (Zhao 2005) in anti-diagonal ordering: within a sweep
direction, points on the diagonal i + j = k depend only on diagonal k - 1,
so each diagonal updates as one vectorized lax.scan step with exact
point-Gauss-Seidel semantics.  One round of the 4 directional sweeps is
exact for fields whose characteristics turn < 90 degrees (all rupture-front
speed fields); the default adds margin.  A host-side FMM (heapq) with the
reference's update formula (eikonal.f90:128-189) is kept as the parity
oracle and for the CLI tools.
"""

from __future__ import annotations

import heapq

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e30)


# ---------------------------------------------------------------------------
# host fast-marching (oracle; mirrors eikonal_solver_fmm)
# ---------------------------------------------------------------------------


def fmm_solve(speed, delta, first, initial_point):
    """Fast-marching arrival times (eikonal_solver_fmm, eikonal.f90:29-199).

    speed: [nx, ny]; delta: (dx, dy); first: grid origin; initial_point:
    physical coordinates of the rupture nucleation.
    """
    speed = np.asarray(speed, dtype=np.float64)
    nx, ny = speed.shape
    dx, dy = float(delta[0]), float(delta[1])
    inf = float(np.finfo(np.float32).max) * 0.1

    ix = min(max(int((initial_point[0] - first[0]) / dx), 0), nx - 1)
    iy = min(max(int((initial_point[1] - first[1]) / dy), 0), ny - 1)

    times = np.full((nx, ny), inf)
    times[ix, iy] = 0.0
    if nx == 1 and ny == 1:
        return times

    FAR, ALIVE, BAND = -1, 0, 1
    state = np.full((nx, ny), FAR, dtype=np.int8)
    state[ix, iy] = ALIVE
    heap = []

    def update_neighbor(i, j):
        if state[i, j] == ALIVE:
            return
        a = times[i - 1, j] if i > 0 else inf
        b = times[i + 1, j] if i < nx - 1 else inf
        c = times[i, j - 1] if j > 0 else inf
        d = times[i, j + 1] if j < ny - 1 else inf
        f = speed[i, j]
        t = 0.0
        aa = min(a, b)
        cc = min(c, d)
        if max(aa, cc) != inf:
            s = dx**2 * dy**2 * (dx**2 + dy**2 - ((aa - cc) * f) ** 2)
            if s >= 0.0:
                t = max(t, ((aa * dy**2 + cc * dx**2) * f + np.sqrt(s)) / (f * (dx**2 + dy**2)))
        if min(c, d) == inf:
            if a < inf:
                t = max(t, a + dx / f)
            if b < inf:
                t = max(t, b + dx / f)
        if min(a, b) == inf:
            if c < inf:
                t = max(t, c + dy / f)
            if d < inf:
                t = max(t, d + dy / f)
        if t == 0.0:  # fallback at sharp speed contrasts (eikonal.f90:176-183)
            t = inf
            if a < inf:
                t = min(t, a + dx / f)
            if b < inf:
                t = min(t, b + dx / f)
            if c < inf:
                t = min(t, c + dy / f)
            if d < inf:
                t = min(t, d + dy / f)
        if t != 0.0 and times[i, j] != t:
            times[i, j] = t
            state[i, j] = BAND
            heapq.heappush(heap, (t, i, j))

    # initial narrow band (eikonal.f90:94-102)
    for (i, j) in [(ix - 1, iy), (ix + 1, iy), (ix, iy - 1), (ix, iy + 1)]:
        if 0 <= i < nx and 0 <= j < ny:
            t0 = (dx if j == iy else dy) / speed[i, j]
            times[i, j] = t0
            state[i, j] = BAND
            heapq.heappush(heap, (t0, i, j))

    while heap:
        t, i, j = heapq.heappop(heap)
        if state[i, j] == ALIVE or times[i, j] != t:
            continue  # stale entry
        state[i, j] = ALIVE
        for (a, b) in [(i - 1, j), (i + 1, j), (i, j - 1), (i, j + 1)]:
            if 0 <= a < nx and 0 <= b < ny:
                update_neighbor(a, b)

    return times


# ---------------------------------------------------------------------------
# device fast sweeping
# ---------------------------------------------------------------------------


def _upwind(told, amin, cmin, f, da, dc):
    """Godunov upwind update: `amin` neighbor min at spacing da, `cmin` at
    dc (the same quadratic as eikonal.f90:155-174)."""
    s = da**2 * dc**2 * (da**2 + dc**2 - ((amin - cmin) * f) ** 2)
    t2d = ((amin * dc**2 + cmin * da**2) * f + jnp.sqrt(jnp.maximum(s, 0.0))) / (
        f * (da**2 + dc**2)
    )
    t1d = jnp.minimum(amin + da / f, cmin + dc / f)
    cand = jnp.where((s >= 0.0) & (t2d >= jnp.maximum(amin, cmin)), t2d, t1d)
    return jnp.minimum(told, cand)


def _skew(a, fill):
    """[nx, ny] -> [nx, nx + ny - 1] with row i shifted right by i, so the
    anti-diagonal i + j = k becomes column k."""
    nx, ny = a.shape
    ap = jnp.pad(a, ((0, 0), (0, nx)), constant_values=fill)
    cols = (jnp.arange(nx + ny - 1)[None, :] - jnp.arange(nx)[:, None]) % (
        ny + nx
    )
    return jnp.take_along_axis(ap, cols, axis=1)


def _unskew(s, nx, ny):
    cols = (jnp.arange(ny)[None, :] + jnp.arange(nx)[:, None])
    return jnp.take_along_axis(s, cols, axis=1)


def _diagonal_sweep(t, f, sd, da, dc, flip0, flip1):
    """One full Gauss-Seidel sweep in the (+i, +j) direction (after optional
    axis flips): points are processed along anti-diagonals i + j = k, where
    BOTH causal neighbors (i-1, j) and (i, j-1) lie on diagonal k-1 and are
    already updated -- the exact point-Gauss-Seidel ordering of Zhao (2005)
    fast sweeping, vectorized across each diagonal (a line sweep with only
    Jacobi coupling across the line converges an order of magnitude slower
    for characteristics oblique to the sweep axis)."""
    if flip0:
        t, f, sd = jnp.flip(t, 0), jnp.flip(f, 0), jnp.flip(sd, 0)
    if flip1:
        t, f, sd = jnp.flip(t, 1), jnp.flip(f, 1), jnp.flip(sd, 1)
    nx, ny = t.shape
    ts = _skew(t, BIG)  # [nx, K], K = nx + ny - 1
    fs = _skew(f, 1.0)
    sds = _skew(sd, False)
    # non-causal (old) neighbors of column k live in column k + 1:
    # down = t[i+1, j] -> skewed (i+1, k+1); right = t[i, j+1] -> (i, k+1)
    tp = jnp.pad(ts, ((0, 1), (0, 1)), constant_values=BIG)
    down_old = tp[1:, 1:]  # [nx, K]
    right_old = tp[:-1, 1:]

    def body(prev, col):
        t_col, f_col, seed_col, dn_col, rt_col = col
        up_new = jnp.concatenate([jnp.full((1,), BIG), prev[:-1]])  # t[i-1, j]
        left_new = prev  # t[i, j-1]
        amin = jnp.minimum(up_new, dn_col)  # axis-0 neighbors
        cmin = jnp.minimum(left_new, rt_col)  # axis-1 neighbors
        tnew = _upwind(t_col, amin, cmin, f_col, da, dc)
        tnew = jnp.where(seed_col, 0.0, tnew)
        return tnew, tnew

    init = jnp.full((nx,), BIG)
    _, out_s = jax.lax.scan(
        body, init,
        (ts.T, fs.T, sds.T, down_old.T, right_old.T),
        unroll=8,
    )
    out = _unskew(out_s.T, nx, ny)
    if flip1:
        out = jnp.flip(out, 1)
    if flip0:
        out = jnp.flip(out, 0)
    return out


def sweep_solve(speed, delta, first, initial_point, n_rounds=3):
    """Fast-sweeping arrival times (jnp; vmappable over sources).

    speed: f32[nx, ny]; delta: (dx, dy) scalars (may be traced); first:
    (fx, fy); initial_point: (px, py) physical coordinates.  Runs n_rounds
    of the 4 directional diagonal sweeps; one round is exact for
    characteristics turning < 90 degrees, three covers strongly-curved
    fields (validated against the FMM oracle in tests).
    """
    speed = jnp.asarray(speed, jnp.float32)
    nx, ny = speed.shape
    dx = jnp.float32(delta[0])
    dy = jnp.float32(delta[1])

    ix = jnp.clip(((initial_point[0] - first[0]) / dx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(((initial_point[1] - first[1]) / dy).astype(jnp.int32), 0, ny - 1)

    seed = jnp.zeros((nx, ny), bool).at[ix, iy].set(True)
    times = jnp.where(seed, 0.0, BIG)

    def one_round(times, _):
        times = _diagonal_sweep(times, speed, seed, dx, dy, False, False)
        times = _diagonal_sweep(times, speed, seed, dx, dy, False, True)
        times = _diagonal_sweep(times, speed, seed, dx, dy, True, False)
        times = _diagonal_sweep(times, speed, seed, dx, dy, True, True)
        return times, None

    times, _ = jax.lax.scan(one_round, times, None, length=n_rounds)
    return times
