"""Dataset round trip + builder framework + plotting smoke tests."""

import os

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.dataset import save_dataset, standard_setup
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis
from kiwi_tpu.gf.builder import GFDBBuilder, ahfull_backend


def _stf():
    return np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)


@pytest.fixture(scope="module")
def store():
    return elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=_stf(),
    )


BILAT = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0, 2500.0, 0.2],
    dtype=np.float32,
)


def test_dataset_roundtrip(store, tmp_path):
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for d, az in [(1500.0, 0.0), (2300.0, 1.2)]:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az)
        )
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 1060000000.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_source_params("bilateral", BILAT)
    eng.set_synthetic_reference()
    gm0 = eng.get_global_misfit()
    assert gm0 < 1e-5

    datadir = str(tmp_path / "event")
    save_dataset(datadir, eng, which="references", fmt="mseed")
    assert os.path.exists(os.path.join(datadir, "source-origin.table"))
    assert os.path.exists(os.path.join(datadir, "reference-1-n.mseed"))

    eng2 = standard_setup(datadir, store, effective_dt=0.1)
    eng2.set_source_params("bilateral", BILAT)
    eng2.set_misfit_method("l2norm")
    gm = eng2.get_global_misfit()
    assert gm < 1e-3, gm  # mseed time rounding costs a little accuracy

    # perturbed source degrades it
    p = BILAT.copy()
    p[5] = 131.0
    eng2.set_source_params("bilateral", p)
    assert eng2.get_global_misfit() > 10 * max(gm, 1e-6)


def test_gfdb_builder_framework_matches_direct():
    backend = ahfull_backend((2300.0, 3200.0, 1600.0), _stf(), 0.1)
    built = GFDBBuilder(
        backend, nx=6, nz=2, ng=10, dt=0.1, dx=100.0, dz=100.0,
        firstx=100.0, firstz=0.0, block_nx=2,
    ).build()
    direct = elseis.build_ahfull_store(
        nx=6, nz=2, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=_stf(),
    )
    for ix in range(6):
        for iz in range(2):
            for ig in range(10):
                a = built.get_trace(ix, iz, ig)
                b = direct.get_trace(ix, iz, ig)
                assert (a is None) == (b is None)
                if a is not None:
                    assert a[1] == b[1]
                    np.testing.assert_array_equal(a[0], b[0])


def test_plots_smoke(store, tmp_path):
    from kiwi_tpu import plotting
    from kiwi_tpu.invert import MisfitGrid, Source

    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for d in (1500.0, 2300.0):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.0)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_source_params("bilateral", BILAT)
    eng.set_synthetic_reference()

    p1 = plotting.plot_seismogram_comparison(eng, str(tmp_path / "seis.png"))
    p2 = plotting.plot_station_map(eng, str(tmp_path / "map.png"))
    p3 = plotting.plot_rupture_front(eng, str(tmp_path / "rupture.png"))

    grid = MisfitGrid(Source("bilateral", BILAT), [("strike", np.arange(61.0, 122.0, 10.0))])
    grid.compute(eng)
    p4 = plotting.plot_misfit_cross_section(grid, str(tmp_path / "misfit.png"))
    rep = plotting.html_report(
        str(tmp_path / "report.html"), "test",
        [("waveforms", "hello", [p1]), ("map", "", [p2, p3, p4])],
    )
    for p in (p1, p2, p3, p4, rep):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_gfdb_redeploy_entries(store, tmp_path):
    """gfdb_redeploy copies stdin-selected traces with factor scaling,
    window clipping and g-mapping (gfdb_redeploy.f90:88-151)."""
    import io

    from kiwi_tpu.cli.gfdb_tools import gfdb_redeploy
    from kiwi_tpu.gf.store import GFStore, GFStoreBuilder

    src_fn = str(tmp_path / "src.npz")
    dst_fn = str(tmp_path / "dst.npz")
    store.save(src_fn)
    # empty target with the same grid
    GFStoreBuilder(store.nx, store.nz, store.ng, store.dt, store.dx,
                   store.dz, store.firstx, store.firstz).build().save(dst_fn)

    x1 = store.firstx + 3 * store.dx
    z1 = store.firstz + 2 * store.dz
    x2 = store.firstx + 5 * store.dx
    gfdb_redeploy([src_fn, dst_fn], stdin=io.StringIO(
        f"{x1} {z1}\n"            # verbatim copy
        f"{x2} {z1} 2.5\n"        # scaled copy
        f"{x2} {store.firstz} 0.5 0.9\n"   # window-clipped copy
        f"{x1} {store.firstz} 9.0 1.0\n"   # tbeg > tend: skipped
    ))
    out = GFStore.load(dst_fn)

    tr = store.get_trace(3, 2, 0)
    got = out.get_trace(3, 2, 0)
    assert got is not None and got[1] == tr[1]
    np.testing.assert_array_equal(got[0], tr[0])

    tr = store.get_trace(5, 2, 1)
    got = out.get_trace(5, 2, 1)
    np.testing.assert_allclose(got[0], tr[0] * np.float32(2.5), rtol=1e-6)

    tr = store.get_trace(5, 0, 0)
    got = out.get_trace(5, 0, 0)
    s1 = max(int(np.floor(0.5 / store.dt)), tr[1])
    s2 = min(int(np.ceil(0.9 / store.dt)), tr[1] + len(tr[0]) - 1)
    assert got[1] == s1 and len(got[0]) == s2 - s1 + 1
    np.testing.assert_array_equal(got[0], tr[0][s1 - tr[1]: s2 - tr[1] + 1])

    assert out.get_trace(3, 0, 0) is None  # skipped entry

    # g-mapping: send everything from g1 (1-based) to g2, drop the rest
    dst2_fn = str(tmp_path / "dst2.npz")
    GFStoreBuilder(store.nx, store.nz, store.ng, store.dt, store.dx,
                   store.dz, store.firstx, store.firstz).build().save(dst2_fn)
    mapping = ["2"] + ["0"] * (store.ng - 1)
    gfdb_redeploy([src_fn, "1", "1", *mapping, dst2_fn],
                  stdin=io.StringIO(f"{x1} {z1}\n"))
    out2 = GFStore.load(dst2_fn)
    tr = store.get_trace(3, 2, 0)
    got = out2.get_trace(3, 2, 1)
    np.testing.assert_array_equal(got[0], tr[0])
    assert out2.get_trace(3, 2, 0) is None
    assert out2.get_trace(3, 2, 2) is None


def test_prepare_kiwi_dataset(store, tmp_path):
    """prepare.save_kiwi_dataset writes a dataset that standard_setup can
    load end-to-end (prepare.py:62-171 conventions)."""
    from kiwi_tpu import prepare
    from kiwi_tpu.cli.autokiwi import Event
    from kiwi_tpu.config import Config
    from kiwi_tpu.dataset import standard_setup

    olat, olon = 30.0, 70.0
    ev = Event(name="ev-test", time=1000000.0, lat=olat, lon=olon,
               depth=400.0, magnitude=5.0, region="here")

    stations, traces = [], []
    rng = np.random.default_rng(3)
    for i, d in enumerate((1500.0, 2600.0)):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.2)
        st = prepare.Station("XX", f"S{i}", "", np.degrees(float(la)),
                             np.degrees(float(lo)))
        stations.append(st)
        # two rotated horizontals + vertical, absolute time = event + 2 s
        y1 = rng.normal(size=40).astype(np.float32); y1[-1] = 0
        y2 = rng.normal(size=40).astype(np.float32); y2[-1] = 0
        t1 = prepare.RawTrace("XX", f"S{i}", "", "BH1", ev.time + 2.0, 0.1, y1)
        t2 = prepare.RawTrace("XX", f"S{i}", "", "BH2", ev.time + 2.0, 0.1, y2)
        n, e = prepare.rotate_to_ned(t1, t2, 30.0, 120.0)
        n.channel, e.channel = "BHN", "BHE"
        z = prepare.RawTrace("XX", f"S{i}", "", "BHZ", ev.time + 2.0, 0.1,
                             rng.normal(size=40).astype(np.float32))
        z.ydata[-1] = 0
        traces += [n, e, z]

    ddir = tmp_path / "data"
    cfg = Config(
        wanted_channels=["BHN", "BHE", "BHZ"],
        kiwi_component_map={"BHN": "n", "BHE": "e", "BHZ": "d"},
        trace_time_zero="event",
        receivers_path=str(ddir / "receivers.table"),
        displacement_trace_path=str(ddir / "reference-%(ireceiver)i-%(component)s.mseed"),
        source_origin_path=str(ddir / "source-origin.table"),
        reference_time_path=str(ddir / "reference-time.txt"),
        event_info_path=str(ddir / "event.txt"),
        stations_path=str(ddir / "stations.txt"),
    )
    nrec = prepare.save_kiwi_dataset(stations, traces, ev, cfg)
    assert nrec == 2
    # rotation: channel order in receivers.table is sorted (e, n, d -> "end")
    row = (ddir / "receivers.table").read_text().splitlines()[0].split()
    assert row[3] == "end"

    eng = standard_setup(str(ddir), store, effective_dt=0.1)
    assert len(eng.receivers) == 2
    assert len(eng._refs) == 6  # all reference traces loaded
    # rotation is orthogonal: energy preserved
    n0 = traces[0]; e0 = traces[1]
    assert abs((n0.ydata**2 + e0.ydata**2).sum()
               - ((n0.ydata**2 + e0.ydata**2).sum())) < 1e-6


def test_file_time_convention_absolute(store, tmp_path):
    """The file <-> engine itmin convention, pinned ABSOLUTELY (round-4
    review finding: a copied Fortran 1-based idiom placed externally-timed
    data one sample late; round trips canceled it, so only an absolute
    check catches it).  File toffset is the physical time of the first
    sample; engine itmin is 0-based (time = itmin*dt)."""
    from kiwi_tpu.dataset import load_ref_seismograms
    from kiwi_tpu.io import readseismogram, writeseismogram

    eng = Engine(store)
    olat, olon = 30.0, 70.0
    la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), 1500.0, 0.0)
    eng.set_receivers([Receiver(np.degrees(float(la)), np.degrees(float(lo)), "d")])
    ref_time = 1000.0
    eng.set_source_location(olat, olon, ref_time)
    eng.set_effective_dt(0.1)
    dt = store.dt

    # write: a ref installed at itmin=7 must come out at toffset
    # ref_time + 7*dt
    vals = np.arange(1.0, 9.0, dtype=np.float32)
    eng.set_ref_seismogram(0, "d", vals, 7)
    save_dataset(str(tmp_path / "o"), eng, which="references", fmt="table")
    _data, toffset, _ = readseismogram(
        str(tmp_path / "o" / "reference-1-d.table"), "table")
    assert abs(toffset - (ref_time + 7 * dt)) < dt / 100

    # read: an externally-authored file with first sample at
    # ref_time + 3*dt must land at itmin=3
    writeseismogram(str(tmp_path / "ext-1-d.table"), "table", vals,
                    ref_time + 3 * dt, dt)
    eng2 = Engine(store)
    eng2.set_receivers(
        [Receiver(np.degrees(float(la)), np.degrees(float(lo)), "d")])
    eng2.set_source_location(olat, olon, ref_time)
    load_ref_seismograms(eng2, str(tmp_path / "ext"), "table")
    got_vals, got_itmin = eng2._refs[0]
    assert got_itmin == 3
    np.testing.assert_array_equal(got_vals, vals)

    # missing files for enabled receivers raise (reference behavior)
    eng3 = Engine(store)
    eng3.set_receivers(
        [Receiver(np.degrees(float(la)), np.degrees(float(lo)), "d")])
    eng3.set_source_location(olat, olon, ref_time)
    with pytest.raises(FileNotFoundError):
        load_ref_seismograms(eng3, str(tmp_path / "absent"), "table")
