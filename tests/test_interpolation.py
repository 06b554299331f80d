"""Gulunay f-k interpolation tests."""

import numpy as np
import pytest

from kiwi_tpu.gf import elseis
from kiwi_tpu.gf.interpolation import gulunay2d, oversample_store


def _ricker(t, t0, f=2.0):
    a = (np.pi * f * (t - t0)) ** 2
    return (1 - 2 * a) * np.exp(-a)


def test_gulunay2d_linear_moveout():
    """Interpolated traces of a dipping event should land near the true
    intermediate traces."""
    nt, ns, l = 128, 32, 2
    dt = 0.01
    t = np.arange(nt) * dt
    # true field on the fine grid (2*ns traces)
    fine = np.stack([_ricker(t, 0.3 + 0.004 * j) for j in range(ns * l)], axis=1)
    coarse = fine[:, ::l].copy()
    out = gulunay2d(coarse, l, ntmargin=12, nxmargin=8)
    # compare interpolated (odd) traces in the interior
    err = []
    for j in range(9, ns * l - 9, 2):
        e = np.abs(out[:, j] - fine[:, j]).max() / np.abs(fine[:, j]).max()
        err.append(e)
    assert np.median(err) < 0.15, np.median(err)


def test_gulunay2d_preserves_even_traces_roughly():
    nt, ns, l = 128, 16, 2
    rng = np.random.default_rng(0)
    coarse = rng.normal(size=(nt, ns))
    out = gulunay2d(coarse.copy(), l, ntmargin=10, nxmargin=4)
    assert out.shape == (nt, ns * l)


def test_oversample_store_against_true_traces():
    """Oversampling a coarse analytic store should approximate the directly
    computed traces at intermediate distances."""
    stf = np.array([0, 0, 0.2, 0.5, 0.8, 1, 1, 1], dtype=np.float64)
    material = (2300.0, 3200.0, 1600.0)
    dt = 0.1
    # coarse: dx=200; truth computed at dx=100
    coarse = elseis.build_ahfull_store(
        nx=64, nz=1, dt=dt, dx=200.0, dz=100.0, firstx=2000.0, firstz=400.0,
        material=material, stf=stf,
    )
    fine_true = elseis.build_ahfull_store(
        nx=128, nz=1, dt=dt, dx=100.0, dz=100.0, firstx=2000.0, firstz=400.0,
        material=material, stf=stf,
    )
    over = oversample_store(coarse, nipx=2, nipz=1)
    assert over.nx == 128
    assert abs(over.dx - 100.0) < 1e-9

    # real traces are preserved exactly
    for ix in range(0, 128, 2):
        a = over.get_trace(ix, 0, 0)
        b = coarse.get_trace(ix // 2, 0, 0)
        np.testing.assert_array_equal(a[0], b[0])

    # interpolated traces approximate the truth (interior, away from edges)
    errs = []
    for ix in range(41, 89, 2):
        got = over.get_trace(ix, 0, 5)
        want = fine_true.get_trace(ix, 0, 5)
        if got is None or want is None:
            continue
        # compare on overlapping span
        lo = max(got[1], want[1])
        hi = min(got[1] + len(got[0]), want[1] + len(want[0]))
        g = got[0][lo - got[1] : hi - got[1]]
        w = want[0][lo - want[1] : hi - want[1]]
        scale = np.abs(w).max()
        errs.append(np.abs(g - w).max() / scale)
    assert len(errs) > 5
    assert np.median(errs) < 0.35, (np.median(errs), errs)
