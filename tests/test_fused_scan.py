"""Parity of the fused synthesis+scan path (round 5).

The transposed fused kernel (ops/float_scan.fused_scan_sums +
misfit.evaluate_misfits_floating_fused) evaluates shared-kinematics
floating-norm batches with the weight contraction inside the kernel.  It
must agree with the per-source XLA evaluation (KIWI_FLOAT_SCAN=0) at f32
reduction-order tolerance on every configuration it claims:

* floating_l1norm and floating_l2norm
* tapered rows (per-rc values rows, k_share=1) and taper-free plans
  (per-receiver rows, k_share=K)
* the engine batch path AND the fused on-device sweep
* batch-uniform risetimes via the fused path; NON-uniform risetimes must
  fall back (gate check) and still be correct.

Runs the Pallas kernel in interpret mode on CPU (KIWI_FLOAT_SCAN_INTERPRET);
the on-hardware Mosaic lowering is gated in bench.py like the window kernel.
"""

import os

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis


@pytest.fixture(scope="module")
def engine():
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=40, nz=6, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for i in range(4):
        d = 1200.0 + 400.0 * i
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.3 * i)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    p = np.array(
        [0, 0, 0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0, 2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", p)
    eng.set_floating_shiftrange(-0.5, 0.5)
    return eng, p


def _strike_batch(p, b=8):
    batch = np.tile(p, (b, 1))
    batch[:, 5] = np.linspace(0.0, 350.0, b).astype(np.float32)
    return batch


def _compare(eng, batch, monkeypatch, expect_fused=True):
    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    monkeypatch.delenv("KIWI_FLOAT_SCAN", raising=False)
    eng._invalidate()
    m1, n1, fs1 = (np.asarray(a) for a in eng.misfits_for_source_batch(batch))
    assert bool(eng._plan["use_fused_scan"]) == expect_fused

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    m0, n0, fs0 = (np.asarray(a) for a in eng.misfits_for_source_batch(batch))
    monkeypatch.delenv("KIWI_FLOAT_SCAN")
    eng._invalidate()

    scale = max(np.abs(m0).max(), 1e-30)
    np.testing.assert_allclose(m1, m0, rtol=0, atol=scale * 2e-5)
    np.testing.assert_allclose(n1, n0, rtol=2e-5, atol=np.abs(n0).max() * 2e-5)
    np.testing.assert_array_equal(fs1, fs0)


@pytest.mark.parametrize("method", ["floating_l1norm", "floating_l2norm"])
def test_fused_matches_xla_eval(engine, monkeypatch, method):
    eng, p = engine
    eng.set_misfit_method(method)
    eng.set_synthetic_reference()
    _compare(eng, _strike_batch(p), monkeypatch)


def test_fused_with_tapers(engine, monkeypatch):
    """Tapered rows force per-rc values rows (k_share=1) and zero tail
    edges; must still match."""
    eng, p = engine
    eng.set_misfit_method("floating_l1norm")
    for irec in range(4):
        eng.set_misfit_taper(irec, [0.0, 1.0, 6.0, 9.0], [0.0, 1.0, 1.0, 0.0])
    try:
        eng.set_synthetic_reference()
        _compare(eng, _strike_batch(p), monkeypatch)
    finally:
        eng._tapers.clear()
        eng._invalidate()


@pytest.mark.parametrize("method", ["floating_l1norm", "floating_l2norm"])
def test_fused_with_filters(engine, monkeypatch, method):
    """Spectral band-pass filters: the filter chain commutes with the
    contraction (applied to the values rows), and in-kernel span masks
    replace the tail correction (irfft ringing breaks tail constancy).
    This is the configuration real inversions run -- it previously fell
    to the vmapped XLA path."""
    eng, p = engine
    eng.set_misfit_method(method)
    for irec in range(4):
        eng.set_misfit_filter(irec, [0.0, 0.2, 3.0, 4.0], [0.0, 1.0, 1.0, 0.0])
    try:
        eng.set_synthetic_reference()
        _compare(eng, _strike_batch(p), monkeypatch)
    finally:
        eng._filters.clear()
        eng._invalidate()


def test_fused_with_filters_and_tapers(engine, monkeypatch):
    """Filter + taper combined: taper applies before the FFT, the filtered
    row is re-zeroed by taper_zero_one, and the mask is the taper span."""
    eng, p = engine
    eng.set_misfit_method("floating_l1norm")
    for irec in range(4):
        eng.set_misfit_filter(irec, [0.0, 0.2, 3.0, 4.0], [0.0, 1.0, 1.0, 0.0])
        eng.set_misfit_taper(irec, [0.0, 1.0, 6.0, 9.0], [0.0, 1.0, 1.0, 0.0])
    try:
        eng.set_synthetic_reference()
        _compare(eng, _strike_batch(p), monkeypatch)
    finally:
        eng._filters.clear()
        eng._tapers.clear()
        eng._invalidate()


def test_nonuniform_risetimes_fall_back(engine, monkeypatch):
    """A batch sweeping the risetime column cannot fold the STF into the
    shared values rows: the engine must take the unfused path and still
    match the per-source eval."""
    eng, p = engine
    eng.set_misfit_method("floating_l1norm")
    eng.set_synthetic_reference()
    batch = np.tile(p, (8, 1))
    # risetimes that differ but share the discretization grid shape
    # ((1, 1, 3) for 0.20-0.24 at effective_dt 0.1)
    batch[:, 13] = np.where(np.arange(8) % 2 == 0, 0.2, 0.24).astype(np.float32)

    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    monkeypatch.delenv("KIWI_FLOAT_SCAN", raising=False)
    eng._invalidate()
    m1, n1, fs1 = (np.asarray(a) for a in eng.misfits_for_source_batch(batch))
    # the plan allows fusing, but this batch must not have used it: varying
    # risetimes change the time-cell discretization, so shared_kin_check
    # already rejects the batch (the engine's explicit risetime-uniformity
    # gate is a second line of defense) and no fused-shared forward exists
    assert eng._plan["use_fused_scan"]
    assert not any(k[-1] for k in eng._plan["fused_shared"])

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    m0, n0, fs0 = (np.asarray(a) for a in eng.misfits_for_source_batch(batch))
    monkeypatch.delenv("KIWI_FLOAT_SCAN")
    eng._invalidate()
    scale = max(np.abs(m0).max(), 1e-30)
    np.testing.assert_allclose(m1, m0, rtol=0, atol=scale * 2e-5)
    np.testing.assert_array_equal(fs1, fs0)


def test_fused_sweep_matches_batch(engine, monkeypatch):
    """sweep_global_misfits through the fused kernel == global misfits of
    the same batch through the per-source path."""
    import jax

    from kiwi_tpu import misfit as mf

    eng, p = engine
    eng.set_misfit_method("floating_l1norm")
    eng.set_synthetic_reference()
    strikes = np.linspace(0.0, 350.0, 8).astype(np.float32)

    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    monkeypatch.delenv("KIWI_FLOAT_SCAN", raising=False)
    eng._invalidate()
    g1 = np.asarray(eng.sweep_global_misfits(p, 5, strikes))
    assert any(k[-1] for k in eng._plan.get("sweep", {})), "sweep not fused"

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    batch = _strike_batch(p)
    m0, n0, _ = eng.misfits_for_source_batch(batch)
    g0 = np.asarray(jax.vmap(mf.global_misfit)(m0, n0))
    monkeypatch.delenv("KIWI_FLOAT_SCAN")
    eng._invalidate()
    np.testing.assert_allclose(g1, g0, rtol=2e-5)
