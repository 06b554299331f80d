"""End-to-end engine tests: the self-consistency loop of the reference
(synthesize -> set as reference -> misfit == 0 -> perturbed source > 0),
mirroring kiwibench's syntheseis setup in miniature."""

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis


def boxramp_stf():
    return np.array([0, 0, 0, 0.2, 0.5, 0.8, 1, 1, 1], dtype=np.float64)


@pytest.fixture(scope="module")
def store():
    return elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=boxramp_stf(),
    )


@pytest.fixture()
def engine(store):
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for d, az in [(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0)]:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az)
        )
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    return eng


BILAT = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0, 2500.0, 0.2],
    dtype=np.float32,
)


def test_self_consistency_bilateral(engine):
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()

    gm = engine.get_global_misfit()
    assert gm < 1e-5, gm

    p2 = BILAT.copy()
    p2[5] = 121.0  # strike
    engine.set_source_params("bilateral", p2)
    gm2 = engine.get_global_misfit()
    assert gm2 > 0.05


def test_self_consistency_moment_tensor(engine):
    p = np.array([0.2, 50.0, -30.0, 400.0, 1e12, -5e11, 2e11, 3e11, -1e11, 5e11, 0.4],
                 dtype=np.float32)
    engine.set_source_params("moment_tensor", p)
    engine.set_misfit_method("l1norm")
    engine.set_synthetic_reference()
    assert engine.get_global_misfit() < 1e-5

    p2 = p.copy()
    p2[4] *= 1.5
    engine.set_source_params("moment_tensor", p2)
    assert engine.get_global_misfit() > 0.01


def test_moment_scaling_linearity(engine):
    engine.set_source_params("bilateral", BILAT)
    traces1 = engine.get_synthetic_seismograms()
    p2 = BILAT.copy()
    p2[4] *= 3.0
    engine.set_source_params("bilateral", p2)
    traces2 = engine.get_synthetic_seismograms()
    for (v1, i1), (v2, i2) in zip(traces1, traces2):
        assert i1 == i2
        np.testing.assert_allclose(v2, 3.0 * v1, rtol=1e-5)


def test_floating_misfit_recovers_time_shift(engine):
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("floating_l1norm")
    engine.set_floating_shiftrange(-1.0, 1.0)
    engine.set_synthetic_reference()

    p2 = BILAT.copy()
    p2[0] = 0.3  # shift source in time by 3 samples
    engine.set_source_params("bilateral", p2)
    m, n, fs = engine.get_misfits()
    # floating misfit should detect the 3-sample shift and be near zero
    np.testing.assert_array_equal(fs, [3, 3, 3])
    gm = engine.get_global_misfit()
    assert gm < 0.02, gm


def test_batch_matches_serial(engine):
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()

    strikes = [45.0, 91.0, 133.0, 177.0]
    batch = np.stack([BILAT] * len(strikes))
    batch[:, 5] = strikes
    gms = np.asarray(engine.global_misfits_for_source_batch(batch))

    serial = []
    for s in strikes:
        p = BILAT.copy()
        p[5] = s
        engine.set_source_params("bilateral", p)
        serial.append(engine.get_global_misfit())
    np.testing.assert_allclose(gms, serial, rtol=1e-5, atol=1e-7)
    # the true strike must win
    assert np.argmin(gms) == 1


def test_sweep_global_misfits_matches_batch(engine):
    """sweep_global_misfits (the fused on-device sweep, round 4) against
    the host-built batch path, on every branch: shared-kinematics point
    sweep, non-shared finite sweep, the repeat-sweep memo, and the
    grid-shape-change fallback."""
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("floating_l1norm")
    engine.set_floating_shiftrange(-0.3, 0.3)
    engine.set_synthetic_reference()

    def batch_gms(base, col, vals):
        pb = np.tile(base, (len(vals), 1))
        pb[:, col] = vals
        return np.asarray(engine.global_misfits_for_source_batch(pb))

    # point source (degenerate fault): strike sweep is shared-kinematics
    point = BILAT.copy()
    point[9:12] = 0.0
    engine.set_source_params("bilateral", point)
    engine.set_synthetic_reference()
    strikes = np.linspace(41.0, 141.0, 11).astype(np.float32)
    g = np.asarray(engine.sweep_global_misfits(point, 5, strikes))
    np.testing.assert_allclose(g, batch_gms(point, 5, strikes),
                               rtol=1e-5, atol=1e-7)
    assert float(strikes[np.argmin(g)]) == 91.0
    # repeat dispatch with a covered narrower range rides the memo
    key = next(iter(engine._sweep_memo))
    memo_fn = engine._sweep_memo[key][3]
    strikes2 = np.linspace(60.0, 120.0, 11).astype(np.float32)
    g2 = np.asarray(engine.sweep_global_misfits(point, 5, strikes2))
    assert engine._sweep_memo[key][3] is memo_fn
    np.testing.assert_allclose(g2, batch_gms(point, 5, strikes2),
                               rtol=1e-5, atol=1e-7)

    # finite fault: strike rotates subfault positions -> non-shared path
    engine.set_source_params("bilateral", BILAT)
    engine.set_synthetic_reference()
    g3 = np.asarray(engine.sweep_global_misfits(BILAT, 5, strikes))
    np.testing.assert_allclose(g3, batch_gms(BILAT, 5, strikes),
                               rtol=1e-5, atol=1e-7)

    # sweeping a shape parameter (length-a) changes the discretization
    # grid -> fallback path (shape-bucketed), still correct
    lens = np.array([250.0, 300.0, 350.0, 700.0], np.float32)
    g4 = np.asarray(engine.sweep_global_misfits(BILAT, 9, lens))
    serial = []
    for v in lens:
        p = BILAT.copy()
        p[9] = v
        engine.set_source_params("bilateral", p)
        serial.append(engine.get_global_misfit())
    np.testing.assert_allclose(g4, serial, rtol=1e-5, atol=1e-7)


def test_engine_synthetics_match_oracle(engine, store):
    from oracle import synthesize_oracle
    import jax

    engine.set_source_params("bilateral", BILAT)
    model_traces = engine.get_synthetic_seismograms()

    # discretize on host exactly like the engine does
    from kiwi_tpu.sources import get_source_model

    model = get_source_model("bilateral")
    shape = model.grid_shape(BILAT, 0.1)
    cent = jax.jit(lambda p: model.discretize(p, 0.1, shape))(BILAT)
    cent = {k: np.asarray(v) for k, v in cent.items()}

    src_lat, src_lon = np.radians(30.0), np.radians(70.0)
    rec = engine.receivers[0]
    it0 = model_traces[0][1]
    nt = len(model_traces[0][0])
    ard, bazi0 = synthesize_oracle(
        store, src_lat, src_lon, np.radians(rec.lat_deg), np.radians(rec.lon_deg),
        0.0, cent, it0, nt,
    )
    moment = BILAT[4]
    # component 'n': rotate (away, right) by bazi0+pi
    cl, sl = np.cos(bazi0 + np.pi), np.sin(bazi0 + np.pi)
    north = (cl * ard[0] - sl * ard[1]) * moment
    got = model_traces[0][0]
    scale = np.abs(north).max()
    np.testing.assert_allclose(got, north, atol=3e-6 * scale)


def test_per_receiver_floating_shiftrange(engine):
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("floating_l1norm")
    engine.set_floating_shiftrange(-1.0, 1.0)
    # receiver 1 is only allowed tiny shifts
    engine.set_floating_shiftrange(-0.1, 0.1, irec=1)
    engine.set_synthetic_reference()

    p2 = BILAT.copy()
    p2[0] = 0.5  # 5-sample delay
    engine.set_source_params("bilateral", p2)
    m, n, fs = engine.get_misfits()
    assert int(fs[0]) == 5 and int(fs[2]) == 5
    assert abs(int(fs[1])) <= 1  # clamped to its own range


def test_nearest_neighbor_interpolation(engine):
    engine.set_local_interpolation(False)
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    assert engine.get_global_misfit() < 1e-5
    # nearest-neighbor differs from bilinear on off-node sources
    engine.set_local_interpolation(True)
    gm_bilin = engine.get_global_misfit()
    assert gm_bilin > 1e-4  # reference was built nearest-neighbor
    engine.set_local_interpolation(True)


def test_spacial_undersampling(engine):
    engine.set_local_interpolation(True)
    engine.set_spacial_undersampling(2, 2)
    engine.set_source_params("bilateral", BILAT)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    assert engine.get_global_misfit() < 1e-5
    # against a full-resolution reference the undersampled synthetics differ
    engine.set_spacial_undersampling(1, 1)
    engine.set_synthetic_reference()
    engine.set_spacial_undersampling(2, 2)
    gm = engine.get_global_misfit()
    assert gm > 1e-4
    engine.set_spacial_undersampling(1, 1)


ALL_MODEL_PARAMS = {
    "moment_tensor": np.array(
        [0.0, 0, 0, 400.0, 1e12, -5e11, 2e11, 3e11, -1e11, 5e11, 0.3],
        np.float32),
    "bilateral": BILAT,
    "circular": np.array(
        [0.0, 0, 0, 400.0, 1e12, 40.0, 70.0, 30.0, 200.0, 2500.0, 0.2],
        np.float32),
    "point_lp": np.array(
        [0.0, 0, 0, 400.0, 1e12, 1.0, -0.5, 0.3, 0.1, -0.2, 0.4, 1.0, 0.5],
        np.float32),
    "eikonal": np.array(
        [0.0, 0, 0, 400.0, 1e12, 40.0, 70.0, 30.0, 0.0, 0.0, 220.0,
         0.1, -0.1, 0.9, 0.2], np.float32),
    # (time, ns, es, depth, moment-factor, strike, dip, bord-shift-x/y,
    #  bord-radius, nukl-shift-x/y, rel-vrup, m6..., rise-time)
    "mt_eikonal": np.array(
        [0.0, 0, 0, 400.0, 1.0, 40.0, 70.0, 0.1, -0.1, 220.0,
         0.0, 0.0, 0.9, 1e12, -5e11, 3e11, 1e11, -2e11, 4e11, 0.2],
        np.float32),
}


@pytest.mark.parametrize("stype", sorted(ALL_MODEL_PARAMS))
def test_all_source_models_self_consistent(engine, stype):
    """Every source model synthesizes through the engine and scores zero
    misfit against its own synthetics; a perturbed depth scores > 0."""
    from kiwi_tpu.sources import get_source_model

    p = ALL_MODEL_PARAMS[stype]
    model = get_source_model(stype)
    assert p.shape == (model.nparams,), (stype, model.nparams)
    if stype in ("eikonal", "mt_eikonal"):
        engine.set_source_constraints([], [])  # tiny rupture near the surface
    engine.set_source_params(stype, p)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    assert engine.get_global_misfit() < 1e-5, stype

    p2 = p.copy()
    p2[3] += 120.0  # deeper
    engine.set_source_params(stype, p2)
    assert engine.get_global_misfit() > 1e-3, stype


def test_shared_kinematics_forward_matches(engine):
    """Moment-only batches (MT sweep; slip-rake sweep on a fixed fault) take
    the shared-kinematics forward (the reference's only_moment_changed
    shortcut, batched) and must match the general path exactly."""
    from kiwi_tpu.sources import get_source_model

    engine.set_misfit_method("floating_l1norm")
    engine.set_floating_shiftrange(-0.4, 0.4)

    # finite bilateral, slip-rake sweep: kinematics shared, positions finite
    engine.set_source_params("bilateral", BILAT)
    engine.set_synthetic_reference()
    model = get_source_model("bilateral")
    batch = np.tile(BILAT, (6, 1))
    batch[:, 7] = np.linspace(0.0, 300.0, 6).astype(np.float32)  # slip-rake
    batch[:, 4] = np.linspace(0.5e12, 2e12, 6).astype(np.float32)  # moment
    assert model.shared_kin_check(batch)

    m1, n1, fs1 = engine.misfits_for_source_batch(batch)  # shared path
    # force the general path by making one batch row kinematically distinct,
    # evaluating, then comparing row-wise against per-row calls
    for i in (0, 3, 5):
        m_i, n_i, fs_i = engine.misfits_for_source_batch(batch[i][None, :])
        scale = max(float(np.abs(np.asarray(m_i)).max()), 1e-30)
        np.testing.assert_allclose(np.asarray(m1)[i], np.asarray(m_i)[0],
                                   atol=scale * 1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(n1)[i], np.asarray(n_i)[0],
                                   atol=scale * 1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(fs1)[i], np.asarray(fs_i)[0])

    # moment_tensor m6 sweep
    engine.set_source_params("moment_tensor", np.array(
        [0.0, 0, 0, 400.0, 1e12, -5e11, 2e11, 3e11, -1e11, 5e11, 0.3],
        np.float32))
    engine.set_synthetic_reference()
    mt = get_source_model("moment_tensor")
    b2 = np.tile(engine.source_params, (5, 1))
    b2[:, 4:10] *= np.linspace(0.5, 2.0, 5)[:, None].astype(np.float32)
    b2[2, 5] = -b2[2, 5]
    assert mt.shared_kin_check(b2)
    m2, n2, _ = engine.misfits_for_source_batch(b2)
    for i in (1, 2, 4):
        m_i, n_i, _ = engine.misfits_for_source_batch(b2[i][None, :])
        scale = max(float(np.abs(np.asarray(m_i)).max()), 1e-30)
        np.testing.assert_allclose(np.asarray(m2)[i], np.asarray(m_i)[0],
                                   atol=scale * 1e-5, rtol=1e-5)


def test_ng8_store_forward():
    """ng=8 databases (no near-field components, the reference's other
    layout) run through the full engine forward."""
    from kiwi_tpu.gf.store import GFStoreBuilder

    rng = np.random.default_rng(2)
    b = GFStoreBuilder(30, 6, 8, 0.1, 100.0, 100.0, 100.0, 0.0)
    for ix in range(30):
        for iz in range(6):
            for ig in range(8):
                v = rng.normal(size=30).astype(np.float32)
                v[-1] = 0.0
                b.put_trace(ix, iz, ig, v, 10 + ix)
    store8 = b.build()

    eng = Engine(store8)
    olat, olon = 30.0, 70.0
    recs = []
    for d, az in [(1500.0, 0.3), (2400.0, -1.0)]:
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon),
                                  d * np.cos(az), d * np.sin(az))
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_source_params("bilateral", BILAT)
    eng.set_misfit_method("l2norm")
    eng.set_synthetic_reference()
    assert eng.get_global_misfit() < 1e-5
    p2 = BILAT.copy(); p2[5] += 30.0
    eng.set_source_params("bilateral", p2)
    assert eng.get_global_misfit() > 1e-3


def test_teleseismic_scale_windows():
    """A coarse 20,000 km / 10 km-grid store (gemini-like geometry): plan
    windows, f32 distances and the forward stay sane at teleseismic range."""
    from kiwi_tpu.gf.store import GFStoreBuilder

    rng = np.random.default_rng(4)
    nx, nz, ng = 2000, 4, 10
    b = GFStoreBuilder(nx, nz, ng, 1.0, 10e3, 10e3, 10e3, 0.0)
    # sparse fill: only the distance band the receivers touch
    for ix in range(780, 860):
        for iz in range(nz):
            for ig in range(ng):
                v = rng.normal(size=40).astype(np.float32)
                v[-1] = 0.0
                b.put_trace(ix, iz, ig, v, 900 + ix)
    store = b.build()

    eng = Engine(store)
    olat, olon = 10.0, 20.0
    recs = []
    for d_km, az in [(7950.0, 0.5), (8300.0, 2.0)]:
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon),
                                  d_km * 1e3 * np.cos(az), d_km * 1e3 * np.sin(az))
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(1.0)
    eng.set_local_interpolation(True)
    p = np.array([0.0, 0, 0, 15e3, 1e18, 30.0, 60.0, 90.0, 0.0,
                  40e3, 30e3, 20e3, 2500.0, 4.0], np.float32)
    eng.set_source_params("bilateral", p)
    eng.set_misfit_method("l2norm")
    eng.set_synthetic_reference()
    assert eng.get_global_misfit() < 1e-5
    traces = eng.get_synthetic_seismograms()
    assert any(np.abs(v).max() > 0 for v, _ in traces)
    p2 = p.copy(); p2[0] += 5.0  # 5 s later
    eng.set_source_params("bilateral", p2)
    assert eng.get_global_misfit() > 1e-3


def test_tiny_amplitude_misfits_do_not_underflow(engine):
    """Moment-1.0 sources make sample amplitudes ~1e-19; their squares sit
    in the f32 flush-to-zero range and, without the ctx amplitude
    normalization (misfit.MisfitSetup.device), the l2 misfit showed a
    zero plateau degrees wide around the optimum.  Pins a strictly
    increasing, nonzero misfit curve at moment 1.0."""
    p = BILAT.copy()
    p[4] = 1.0  # moment
    engine.set_source_params("bilateral", p)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()

    gms = []
    for strike in (93.0, 96.0, 99.0):
        q = p.copy()
        q[5] = strike
        gms.append(float(engine.global_misfits_for_source_batch(q[None])[0]))
    assert gms[0] > 1e-4, gms
    assert gms[0] < gms[1] < gms[2], gms

    # and the absolute outputs keep reference units: m, n scale with the
    # amplitude (~1e-19 at moment 1.0)
    q = p.copy()
    q[5] = 99.0
    m, n, _ = engine.misfits_for_source_batch(q[None])
    m, n = np.asarray(m), np.asarray(n)
    assert 0.0 < np.abs(m).max() < 1e-12
    assert 0.0 < np.abs(n).max() < 1e-12


def test_shared_forward_nonuniform_components(store):
    """Mixed per-receiver component sets give a NON-uniform rc layout: the
    shared-kinematics forward must take the general (canon) branch and
    still match per-row general-path evaluations.  Guards the round-4
    rotation-fold gating (engine.py rc_uniform)."""
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    comps = ["ned", "d", "ne"]
    recs = []
    for (d, az), c in zip([(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0)],
                          comps):
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az)
        )
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), c))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.4, 0.4)
    eng.set_source_params("bilateral", BILAT)
    eng.set_synthetic_reference()

    batch = np.tile(BILAT, (5, 1))
    batch[:, 7] = np.linspace(0.0, 300.0, 5).astype(np.float32)  # slip-rake
    batch[:, 4] = np.linspace(0.5e12, 2e12, 5).astype(np.float32)
    m1, n1, fs1 = eng.misfits_for_source_batch(batch)  # shared path
    assert m1.shape[1] == 3 + 1 + 2  # ned + d + ne rows
    for i in (0, 2, 4):
        m_i, n_i, fs_i = eng.misfits_for_source_batch(batch[i][None, :])
        scale = max(float(np.abs(np.asarray(m_i)).max()), 1e-30)
        np.testing.assert_allclose(np.asarray(m1)[i], np.asarray(m_i)[0],
                                   atol=scale * 1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(n1)[i], np.asarray(n_i)[0],
                                   atol=scale * 1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(fs1)[i], np.asarray(fs_i)[0])

    # and the fused sweep on the same non-uniform layout (one column only)
    sweep_batch = np.tile(BILAT, (5, 1))
    sweep_batch[:, 7] = batch[:, 7]
    g_s = np.asarray(eng.sweep_global_misfits(BILAT, 7, sweep_batch[:, 7]))
    g_b = np.asarray(eng.global_misfits_for_source_batch(sweep_batch))
    np.testing.assert_allclose(g_s, g_b, rtol=1e-5,
                               atol=float(np.abs(g_b).max()) * 1e-5)


def test_sweep_memo_not_stale_after_set_effective_dt(engine):
    """set_effective_dt (alone among setters) does not invalidate the plan;
    the sweep memo must still re-discretize at the new dt (round-4 review
    finding: the memo key omitted effective_dt and replayed the old
    discretization)."""
    engine.set_misfit_method("l2norm")
    engine.set_source_params("bilateral", BILAT)
    engine.set_synthetic_reference()
    vals = np.linspace(60.0, 120.0, 5).astype(np.float32)
    g1 = np.asarray(engine.sweep_global_misfits(BILAT, 5, vals))
    engine.set_effective_dt(0.2)  # coarser source discretization grid
    g2 = np.asarray(engine.sweep_global_misfits(BILAT, 5, vals))
    pb = np.tile(BILAT, (5, 1))
    pb[:, 5] = vals
    g2_ref = np.asarray(engine.global_misfits_for_source_batch(pb))
    np.testing.assert_allclose(g2, g2_ref, rtol=1e-5,
                               atol=float(np.abs(g2_ref).max()) * 1e-5)
    # the dt change must actually have changed the answers (guards against
    # a vacuous assertion if the grids coincide)
    assert not np.allclose(g1, g2, rtol=1e-4)
