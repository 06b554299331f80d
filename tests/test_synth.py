"""Synthesis kernel tests: device paths vs the numpy reference oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kiwi_tpu import geo, synth
from kiwi_tpu.gf import elseis


def boxramp_stf():
    y = [0, 0, 0, 0.2, 0.5, 0.8, 1, 1, 1]
    return np.array(y, dtype=np.float64)


@pytest.fixture(scope="module")
def store():
    return elseis.build_ahfull_store(
        nx=40, nz=6, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=boxramp_stf(),
    )


@pytest.fixture(scope="module")
def setup(store):
    src_lat, src_lon = np.radians(30.0), np.radians(70.0)
    dists = np.array([1230.0, 2115.0, 2980.0])
    rec_lat, rec_lon = [], []
    for d, az in zip(dists, [0.0, 1.1, -2.3]):
        la, lo = geo.ne_to_latlon(src_lat, src_lon, d * np.cos(az), d * np.sin(az))
        rec_lat.append(float(la))
        rec_lon.append(float(lo))
    geom = synth.precompute_receiver_geometry(src_lat, src_lon, rec_lat, rec_lon)

    rng = np.random.default_rng(42)
    C = 7
    centroids = {
        "north": (rng.uniform(-300, 300, C)).astype(np.float32),
        "east": (rng.uniform(-300, 300, C)).astype(np.float32),
        "depth": (rng.uniform(150, 420, C)).astype(np.float32),
        "time": (rng.uniform(-0.4, 0.9, C)).astype(np.float32),
        "m": (rng.normal(size=(C, 6)) * 1e15).astype(np.float32),
    }
    cfg = synth.plan_config(
        store, geom, extent_m=500.0, depth_range=(100.0, 500.0), time_range=(-0.5, 1.0)
    )
    return src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg


def _rec_slice(geom_dev, i):
    return {k: v[i] for k, v in geom_dev.items()}


def test_centroid_geodesy_matches_reference_formula(setup):
    """The stable vector formulation must agree with the reference formula
    (geo.approx_differential_azidist) to f64 accuracy on CPU."""
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gd = geom.device()
    for i in range(geom.nreceivers):
        rec = _rec_slice(gd, i)
        for j in range(3):
            dn = float(centroids["north"][j])
            de = float(centroids["east"][j])
            na, nb, nd = synth.centroid_geodesy(jnp.float32(dn), jnp.float32(de), rec)
            ra, rb, rd = geo.approx_differential_azidist(
                float(np.float32(dn)), float(np.float32(de)),
                float(geom.azi[i]), float(geom.bazi[i]), float(geom.dist[i]),
            )
            assert abs(float(na) - float(ra)) < 1e-8
            assert abs(float(nb) - float(rb)) < 1e-8
            assert abs(float(nd) - float(rd)) < 1e-5


def test_direct_path_matches_oracle(setup, store):
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gd = geom.device()
    gfd, gfi = synth.window_arrays(store, cfg)
    cdev = {k: jnp.asarray(v) for k, v in centroids.items()}

    from oracle import synthesize_oracle

    for i in range(geom.nreceivers):
        rec = _rec_slice(gd, i)
        ard = np.asarray(synth.synthesize_ard_direct(gfd, gfi, cfg, rec, cdev))
        expected, _ = synthesize_oracle(
            store, src_lat, src_lon, rec_lat[i], rec_lon[i], 0.0,
            centroids, cfg.out_it0, cfg.nt_out,
        )
        scale = np.abs(expected).max()
        assert scale > 0
        # 5e-6: the kernel's f32 differential geodesy (centroid_geodesy_fast)
        # agrees with the oracle's f64 path to ~3e-7 relative, which moves
        # the bilinear GF weights by a few ULPs
        np.testing.assert_allclose(ard, expected, atol=scale * 5e-6)


def test_fast_path_matches_direct(setup, store):
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gd = geom.device()
    gfd, gfi = synth.window_arrays(store, cfg)
    ext = synth.materialize_window(gfd, gfi, cfg)
    cdev = {k: jnp.asarray(v) for k, v in centroids.items()}

    for i in range(geom.nreceivers):
        rec = _rec_slice(gd, i)
        a = np.asarray(synth.synthesize_ard_direct(gfd, gfi, cfg, rec, cdev))
        b = np.asarray(synth.synthesize_ard(ext, cfg, rec, cdev))
        assert b.shape == (3, cfg.nt_out)
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, atol=scale * 5e-6)


def test_grouped_direct_matches_ungrouped(setup, store):
    """Grouped slice accumulation (GF gather shared across centroids at the
    same position) must reproduce the ungrouped direct path, including spans
    and per-centroid active masks."""
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gd = geom.device()
    gfd, gfi = synth.window_arrays(store, cfg)
    sl = np.s_[cfg.ix0:cfg.ix0 + cfg.nxw, cfg.iz0:cfg.iz0 + cfg.nzw]
    gfn = jnp.asarray(store.nsamples[sl])
    ext = synth.materialize_window(gfd, gfi, cfg)

    # grouped layout: P positions x G time points sharing each position
    rng = np.random.default_rng(7)
    P, G = 4, 5
    pos = {
        "north": rng.uniform(-300, 300, P).astype(np.float32),
        "east": rng.uniform(-300, 300, P).astype(np.float32),
        "depth": rng.uniform(150, 420, P).astype(np.float32),
    }
    cent = {k: jnp.asarray(np.repeat(v, G)) for k, v in pos.items()}
    cent["time"] = jnp.asarray(rng.uniform(-0.4, 0.9, P * G).astype(np.float32))
    cent["m"] = jnp.asarray((rng.normal(size=(P * G, 6)) * 1e15).astype(np.float32))
    cent["active"] = jnp.asarray(rng.random(P * G) > 0.2)

    for i in range(geom.nreceivers):
        rec = _rec_slice(gd, i)
        a, lo_a, hi_a = synth.synthesize_with_spans(
            ext, gfi, gfn, cfg, rec, cent, path="direct")
        b, lo_b, hi_b = synth.synthesize_with_spans(
            ext, gfi, gfn, cfg, rec, cent, path="direct", group_size=G)
        scale = max(np.abs(np.asarray(a)).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=scale * 2e-6)
        np.testing.assert_array_equal(np.asarray(lo_a), np.asarray(lo_b))
        np.testing.assert_array_equal(np.asarray(hi_a), np.asarray(hi_b))


def test_fast_path_jits_and_vmaps_over_sources(setup, store):
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gd = geom.device()
    gfd, gfi = synth.window_arrays(store, cfg)
    ext = synth.materialize_window(gfd, gfi, cfg)
    rec = _rec_slice(gd, 0)

    B = 4
    batch = {
        k: jnp.asarray(np.stack([centroids[k]] * B)) for k in centroids
    }
    # vary the times across the batch
    batch["time"] = batch["time"].at[1].add(0.3)

    fn = jax.jit(jax.vmap(lambda c: synth.synthesize_ard(ext, cfg, rec, c)))
    out = fn(batch)
    assert out.shape == (B, 3, cfg.nt_out)
    single = synth.synthesize_ard(ext, cfg, rec, {k: v[1] for k, v in batch.items()})
    scale = float(np.abs(np.asarray(single)).max())
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=scale * 1e-5)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_ard_to_components_rotation(setup):
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    ard = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32))
    bazi = jnp.float64(geom.bazi[1])
    comp = synth.ard_to_components(
        ard, bazi, tuple(synth.COMPONENT_IDS[c] for c in "ardne")
    )
    np.testing.assert_allclose(np.asarray(comp[0]), np.asarray(ard[0]))
    np.testing.assert_allclose(np.asarray(comp[2]), np.asarray(ard[2]))
    # (north, east) rotated back by -(bazi+pi) must reproduce (away, right)
    cl = np.cos(float(bazi) + np.pi)
    sl = np.sin(float(bazi) + np.pi)
    away = cl * np.asarray(comp[3]) + sl * np.asarray(comp[4])
    np.testing.assert_allclose(away, np.asarray(ard[0]), atol=1e-6)
    # signs: 'c' = -away, 'u' = -down
    comp2 = synth.ard_to_components(ard, bazi, (synth.COMPONENT_IDS["c"], synth.COMPONENT_IDS["u"]))
    np.testing.assert_allclose(np.asarray(comp2[0]), -np.asarray(ard[0]))
    np.testing.assert_allclose(np.asarray(comp2[1]), -np.asarray(ard[2]))


def test_fast_geodesy_matches_f64_reference():
    """centroid_geodesy_fast (all-f32, no inverse trig) must agree with the
    f64 reference-formula path across distances 2 km .. 16000 km, all
    azimuth quadrants and centroid offsets."""
    rng = np.random.default_rng(11)
    worst = 0.0
    for _ in range(60):
        src_lat = rng.uniform(-1.2, 1.2)
        src_lon = rng.uniform(-3, 3)
        d = 10 ** rng.uniform(3.3, 7.2)
        az = rng.uniform(-np.pi, np.pi)
        rl, ro = geo.ne_to_latlon(src_lat, src_lon, d * np.cos(az), d * np.sin(az))
        gm = synth.precompute_receiver_geometry(src_lat, src_lon, [float(rl)], [float(ro)])
        rec = {k: v[0] for k, v in gm.device().items()}
        ext = min(d * 0.4, 1e5)
        dn = jnp.float32(rng.uniform(-ext, ext))
        de = jnp.float32(rng.uniform(-ext, ext))
        azi, bazi, dist = synth.centroid_geodesy(
            dn.astype(jnp.float64), de.astype(jnp.float64), rec)
        saz, caz, sl, cl, dist_f = synth.centroid_geodesy_fast(dn, de, rec)
        lam = float(bazi - rec["bazi"])
        worst = max(
            worst,
            abs(float(saz) - np.sin(float(azi))),
            abs(float(caz) - np.cos(float(azi))),
            abs(float(sl) - np.sin(lam)),
            abs(float(cl) - np.cos(lam)),
            abs(float(dist_f) - float(dist)) / max(float(dist), 1.0),
        )
    assert worst < 1e-6, worst


def test_span_tables_match_physical_spans(setup, store):
    """The precomputed span-union tables (one row gather per centroid)
    must reproduce physical_spans' [C, 2, 2, ng] gather exactly, including
    masked/out-of-window centroids and empty traces."""
    src_lat, src_lon, rec_lat, rec_lon, geom, centroids, cfg = setup
    gfi = jnp.asarray(store.itmin[cfg.ix0:cfg.ix0 + cfg.nxw,
                                  cfg.iz0:cfg.iz0 + cfg.nzw])
    gfn = np.asarray(store.nsamples[cfg.ix0:cfg.ix0 + cfg.nxw,
                                    cfg.iz0:cfg.iz0 + cfg.nzw]).copy()
    # punch some empty traces into the window to exercise the sentinels
    gfn[1, 1, :] = 0
    gfn[3, :, 2] = 0
    gfn_j = jnp.asarray(gfn)
    tables = synth.span_tables(gfi, gfn_j, cfg)

    gd = geom.device()
    rng = np.random.default_rng(7)
    cents = dict(centroids)
    # push a couple of centroids outside the window so valid=False rows hit
    # the masked branch in both implementations
    cents["depth"] = np.array(cents["depth"], np.float32).copy()
    cents["depth"][2] = 5e4
    cents["time"] = np.array(cents["time"], np.float32).copy()
    cents["time"][4] = 3.7
    for i in range(geom.nreceivers):
        rec = _rec_slice(gd, i)
        kin = synth._centroid_kinematics(cfg, rec, {
            k: jnp.asarray(v) for k, v in cents.items()})
        lo_ref, hi_ref = synth.physical_spans(gfi, gfn_j, cfg, kin)
        lo_tab, hi_tab = synth.physical_spans_from_tables(tables, cfg, kin)
        np.testing.assert_array_equal(np.asarray(lo_tab), np.asarray(lo_ref))
        np.testing.assert_array_equal(np.asarray(hi_tab), np.asarray(hi_ref))
