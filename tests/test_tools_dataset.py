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
