"""Cross-language golden parity: the JAX engine vs the C++ oracle.

benchmark/fortran_denominator.cc is a line-faithful transliteration of the
reference's scalar hot loop (seismogram.f90 + sparse_trace.f90 +
receiver.f90 + comparator.f90 norm/taper semantics) -- the only
independently-derived implementation available in this image.  This test
compiles it, replays a committed set of bilateral sources (point AND
finite, with and without tapers) on a small analytic store, and pins the
engine's traces, misfits, norms, and floating shifts against the C++ dump
at 1e-5 relative.

Requires g++ (baked into the image); skipped when unavailable.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from kiwi_tpu import geo, synth
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis

HERE = os.path.dirname(os.path.abspath(__file__))
CC = os.path.join(HERE, "..", "benchmark", "fortran_denominator.cc")

REF = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0,
     2500.0, 0.2], np.float32)
# the committed source set: strike/dip/time/depth perturbations of the
# point source plus two finite bilaterals (one rotated)
DUMPS = [
    np.array([0.0, 0.0, 0.0, 400.0, 1e12, 121.0, 87.0, 164.0, 0.0, 0.0,
              0.0, 0.0, 2500.0, 0.2], np.float32),
    np.array([0.2, 50.0, -80.0, 430.0, 8e11, 91.0, 70.0, 120.0, 0.0, 0.0,
              0.0, 0.0, 2500.0, 0.2], np.float32),
    np.array([0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0,
              200.0, 250.0, 2500.0, 0.2], np.float32),
    np.array([-0.1, 0.0, 0.0, 420.0, 1e12, 40.0, 60.0, 164.0, 30.0, 300.0,
              200.0, 250.0, 2200.0, 0.3], np.float32),
]
SHIFTRANGE = (-0.3, 0.3)  # 7-shift scan at dt 0.1
TAPER_X = (0.5, 1.5, 6.0, 9.0)
TAPER_Y = (0.0, 1.0, 1.0, 0.0)
# band-pass spectral filter (PLF over frequency, comparator.f90:1218-1231)
FILTER_X = (0.0, 0.3, 2.5, 4.0)
FILTER_Y = (0.0, 1.0, 1.0, 0.0)


def boxramp_stf():
    return np.array([0, 0, 0, 0.2, 0.5, 0.8, 1, 1, 1], dtype=np.float64)


@pytest.fixture(scope="module")
def store():
    return elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=boxramp_stf(),
    )


@pytest.fixture(scope="module")
def oracle_bin(tmp_path_factory):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ not available")
    out = str(tmp_path_factory.mktemp("oracle") / "fden")
    subprocess.run([gxx, "-O3", "-o", out, CC], check=True)
    return out


def make_engine(store, taper, filt=False):
    olat, olon = 30.0, 70.0
    eng = Engine(store)
    offsets = [(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0)]
    recs, rlat, rlon = [], [], []
    for d, az in offsets:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az))
        rlat.append(float(la))
        rlon.append(float(lo))
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)),
                             "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    if taper:
        eng.set_misfit_taper(0, TAPER_X, TAPER_Y)
    if filt:
        eng.set_misfit_filter(1, FILTER_X, FILTER_Y)
        # spectral-filter weights live on the k/(pl*dt) grid: pin the
        # engine's pow2 probe length to the oracle's (both implement the
        # reference's lazy pow2 growth, but land on different sizes here)
        eng.min_probe_length = 256
    g = synth.precompute_receiver_geometry(
        np.radians(olat), np.radians(olon), np.asarray(rlat),
        np.asarray(rlon))
    return eng, (np.asarray(g.azi), np.asarray(g.bazi), np.asarray(g.dist))


def run_oracle(store, geom, oracle_bin, tmp, taper, filt=False):
    import sys
    sys.path.insert(0, os.path.join(HERE, "..", "benchmark"))
    from prep_denominator import write_blob

    tapers = []
    if taper:
        for comp in range(3):  # receiver 0's rc rows
            tapers.append((comp, TAPER_X, TAPER_Y))
    filters = []
    if filt:
        for comp in range(3):  # receiver 1's rc rows
            filters.append((3 + comp, FILTER_X, FILTER_Y))
    blob = os.path.join(tmp, "blob.bin")
    dump = os.path.join(tmp, "dump.bin")
    write_blob(blob, store, geom, nshift=7, tapers=tapers, filters=filters,
               workload={
                   "kind": "bilat", "edt": 0.1, "ref_params": REF,
                   "nsweep": 0, "dump_params": DUMPS,
               })
    subprocess.run([oracle_bin, blob, "0", "--dump", dump], check=True,
                   stdout=subprocess.DEVNULL)
    return _read_dump(dump)


def _read_dump(dump):
    with open(dump, "rb") as f:
        R, ncomp, pl, ps0, nmod = struct.unpack("<5i", f.read(20))
        (dt,) = struct.unpack("<f", f.read(4))
        nrc = R * ncomp
        ref = np.frombuffer(f.read(4 * nrc * pl), "<f4").reshape(nrc, pl)
        ref_lo = np.frombuffer(f.read(4 * nrc), "<i4")
        ref_hi = np.frombuffer(f.read(4 * nrc), "<i4")
        models = []
        for _ in range(nmod):
            syn = np.frombuffer(f.read(4 * nrc * pl), "<f4").reshape(nrc, pl)
            syn_lo = np.frombuffer(f.read(4 * nrc), "<i4")
            syn_hi = np.frombuffer(f.read(4 * nrc), "<i4")
            m1 = np.frombuffer(f.read(8 * nrc), "<f8")
            n1 = np.frombuffer(f.read(8 * nrc), "<f8")
            m2 = np.frombuffer(f.read(8 * nrc), "<f8")
            n2 = np.frombuffer(f.read(8 * nrc), "<f8")
            fs = np.frombuffer(f.read(4 * R), "<i4")
            models.append((syn, syn_lo, syn_hi, m1, n1, m2, n2, fs))
    return dict(R=R, pl=pl, ps0=ps0, dt=dt, ref=ref, ref_lo=ref_lo,
                ref_hi=ref_hi, models=models)


@pytest.mark.parametrize(
    "taper,filt",
    [(False, False), (True, False), (False, True), (True, True)],
    ids=["plain", "tapered", "filtered", "tapered+filtered"])
def test_engine_matches_cpp_oracle(store, oracle_bin, tmp_path, taper, filt):
    """Engine vs the C++ oracle.  The `filtered` configurations pin the
    spectral-filter processing chain (taper -> rfft -> PLF filter ->
    irfft -> taper-zeroing, comparator.f90:1171-1263) cross-language:
    receiver 1's rows carry a band-pass filter, evaluated in the C++ via
    an independent double-precision radix-2 FFT."""
    eng, geom = make_engine(store, taper, filt)
    gold = run_oracle(store, geom, oracle_bin, str(tmp_path), taper, filt)
    ps0, pl = gold["ps0"], gold["pl"]

    # reference traces: engine synthesis of REF vs the C++ ref probes
    eng.set_source_params("bilateral", REF)
    for irc, (values, itmin) in enumerate(eng.get_synthetic_seismograms()):
        row = gold["ref"][irc]
        scale = max(np.abs(row).max(), 1e-30)
        got = values
        want = row[itmin - ps0 : itmin - ps0 + len(values)]
        np.testing.assert_allclose(got, want, atol=2e-5 * scale, err_msg=(
            f"REF trace rc={irc}"))

    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(*SHIFTRANGE)

    batch = np.stack(DUMPS)
    eng.set_misfit_method("floating_l1norm")
    # mixed grid shapes: evaluate per model
    for k, p in enumerate(DUMPS):
        syn, syn_lo, syn_hi, m1, n1, m2, n2, fs = gold["models"][k]
        eng.set_source_params("bilateral", p)
        for irc, (values, itmin) in enumerate(
                eng.get_synthetic_seismograms()):
            row = syn[irc]
            scale = max(np.abs(row).max(), 1e-30)
            want = row[itmin - ps0 : itmin - ps0 + len(values)]
            np.testing.assert_allclose(values, want, atol=2e-5 * scale,
                                       err_msg=f"model {k} trace rc={irc}")

        # tapered rows amplify the engine's deliberate f32 on-device
        # geodesy (~1e-6 relative at trace level, synth.py
        # centroid_geodesy_fast; the reference itself casts dist to f32
        # at gfdb_get_indices) because the taper downweights the strong
        # early arrivals -- allow 1e-4 relative there, 1e-5 elsewhere.
        # Filtered rows run f32 FFTs against the oracle's f64 FFT: same
        # 1e-4 band.
        rtol = 1e-4 if (taper or filt) else 1e-5
        eng.set_misfit_method("floating_l1norm")
        m, n, fshift = eng.get_misfits()
        ms = max(np.abs(m1).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(m), m1, rtol=rtol,
                                   atol=1e-5 * ms,
                                   err_msg=f"model {k} floating_l1 misfits")
        np.testing.assert_allclose(np.asarray(n), n1, rtol=rtol,
                                   err_msg=f"model {k} floating_l1 norms")
        np.testing.assert_array_equal(np.asarray(fshift), fs,
                                      err_msg=f"model {k} floating shifts")

        eng.set_misfit_method("l2norm")
        eng.set_floating_shiftrange(0.0, 0.0)
        m, n, _ = eng.get_misfits()
        ms = max(np.abs(m2).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(m), m2, rtol=rtol,
                                   atol=1e-5 * ms,
                                   err_msg=f"model {k} l2 misfits")
        np.testing.assert_allclose(np.asarray(n), n2, rtol=rtol,
                                   err_msg=f"model {k} l2 norms")
        eng.set_floating_shiftrange(*SHIFTRANGE)
    del batch


# -- eikonal-source replay (VERDICT r4 item 4, eikonal half) ----------------

EIK_REF = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
     0.0, 0.0, 250.0, 50.0, -50.0, 0.9, 0.0], np.float32)
EIK_DUMPS = [
    np.array([0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
              0.0, 0.0, 300.0, 50.0, -50.0, 0.9, 0.0], np.float32),
    np.array([0.1, 0.0, 0.0, 420.0, 8e11, 45.0, 70.0, 164.0,
              20.0, -30.0, 260.0, 0.0, 0.0, 0.8, 0.0], np.float32),
    np.array([-0.1, 30.0, -40.0, 410.0, 1e12, 30.0, 80.0, 120.0,
              0.0, 0.0, 250.0, -60.0, 40.0, 1.0, 0.0], np.float32),
]
EIK_CONSTRAINTS = ([[0, 0, 50.0], [0, 0, 700.0]],
                   [[0, 0, -1.0], [0, 0, 1.0]])


def test_eikonal_matches_cpp_oracle(store, oracle_bin, tmp_path):
    """Eikonal-source replay vs the C++ oracle: the oracle rebuilds each
    rupture's centroid table itself (double-precision heap FMM,
    psm_downsample_grid means/durations, boxcar time cells,
    source_eikonal.f90:435-712) from the rupture grid, then synthesizes
    and evaluates misfits.  Pins the engine's host-FMM eikonal pipeline
    end to end cross-language.  (The rupture GRID -- polygon trim, fine
    grid, layered speeds -- ships from the engine's own prepare step; its
    geometry is pinned separately in tests/test_geometry.py against the
    reference formulas.)"""
    import sys
    sys.path.insert(0, os.path.join(HERE, "..", "benchmark"))
    from prep_denominator import write_blob

    from kiwi_tpu.sources import eikonal as eiksrc

    eng, geom = make_engine(store, False)
    eng.set_source_constraints(*EIK_CONSTRAINTS)
    eng.eikonal_device = False  # host FMM path (exact reference semantics)
    ctx = eng.eikonal_context()

    models = []
    for p in [EIK_REF] + EIK_DUMPS:
        named = eiksrc.named_params_batch("eikonal", p[None, :])
        if isinstance(named, tuple):
            pv, m6s, rotmats = named
            pd = {k: float(v[0]) for k, v in pv.items()}
            m6u, rot = m6s[0], rotmats[0]
        else:
            pd, m6u, rot = named[0]
        sd = {}
        eiksrc.discretize_eikonal_host(pd, 0.1, ctx, m6u, rot, solve_dump=sd)
        models.append(dict(
            speed=sd["speed"], inside=sd["inside"], delta=sd["delta"],
            first=sd["first"], nukl=sd["nukl"], coarse=sd["coarse"],
            cdelta=sd["cdelta"], rotmat=rot,
            center=[pd["north"], pd["east"], pd["depth"]],
            m6=np.asarray(m6u, np.float64) * float(p[4]),  # moment folded
            time0=pd["time"],
        ))

    blob = os.path.join(str(tmp_path), "eik_blob.bin")
    dump = os.path.join(str(tmp_path), "eik_dump.bin")
    write_blob(blob, store, geom, nshift=7, workload={
        "kind": "eikonal", "edt": 0.1, "models": models,
    })
    subprocess.run([oracle_bin, blob, "0", "--dump", dump], check=True,
                   stdout=subprocess.DEVNULL)
    gold = _read_dump(dump)
    ps0 = gold["ps0"]
    # not vacuous: the oracle synthesized real energy and real misfits
    assert np.abs(gold["ref"]).max() > 0
    assert all(np.abs(mod[3]).max() > 0 for mod in gold["models"])

    eng.set_source_params("eikonal", EIK_REF)
    for irc, (values, itmin) in enumerate(eng.get_synthetic_seismograms()):
        row = gold["ref"][irc]
        scale = max(np.abs(row).max(), 1e-30)
        want = row[itmin - ps0 : itmin - ps0 + len(values)]
        np.testing.assert_allclose(values, want, atol=5e-5 * scale,
                                   err_msg=f"EIK REF trace rc={irc}")

    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(*SHIFTRANGE)
    for k, p in enumerate(EIK_DUMPS):
        syn, syn_lo, syn_hi, m1, n1, m2, n2, fs = gold["models"][k]
        eng.set_source_params("eikonal", p)
        for irc, (values, itmin) in enumerate(
                eng.get_synthetic_seismograms()):
            row = syn[irc]
            scale = max(np.abs(row).max(), 1e-30)
            want = row[itmin - ps0 : itmin - ps0 + len(values)]
            np.testing.assert_allclose(values, want, atol=5e-5 * scale,
                                       err_msg=f"eik model {k} trace rc={irc}")

        eng.set_misfit_method("floating_l1norm")
        m, n, fshift = eng.get_misfits()
        ms = max(np.abs(m1).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(m), m1, rtol=1e-4,
                                   atol=1e-5 * ms,
                                   err_msg=f"eik model {k} floating_l1")
        np.testing.assert_allclose(np.asarray(n), n1, rtol=1e-4,
                                   err_msg=f"eik model {k} norms")
        np.testing.assert_array_equal(np.asarray(fshift), fs,
                                      err_msg=f"eik model {k} shifts")

        eng.set_misfit_method("l2norm")
        eng.set_floating_shiftrange(0.0, 0.0)
        m, n, _ = eng.get_misfits()
        ms = max(np.abs(m2).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(m), m2, rtol=1e-4,
                                   atol=1e-5 * ms,
                                   err_msg=f"eik model {k} l2")
        eng.set_floating_shiftrange(*SHIFTRANGE)
