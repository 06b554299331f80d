"""End-to-end runner test: full kiwi_main work cycle on a synthetic event."""

import os

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.dataset import save_dataset
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis


def test_kiwi_main_work(tmp_path):
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    dbfile = str(tmp_path / "db.npz")
    store.save(dbfile)

    # build a synthetic "observed" dataset from a known source
    true_params = np.array(
        [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0, 2500.0, 0.2],
        dtype=np.float32,
    )
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for d, az in [(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0), (2700.0, 2.6)]:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), d * np.cos(az), d * np.sin(az)
        )
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_source_params("bilateral", true_params)
    eng.set_synthetic_reference()
    datadir = str(tmp_path / "event")
    save_dataset(datadir, eng, which="references", fmt="mseed")

    from kiwi_tpu.cli.kiwi_main import work

    workdir = str(tmp_path / "work")
    best, steps = work(
        datadir, dbfile, workdir,
        components="ned", effective_dt="0.1", sourcetype="bilateral",
        depth="600", moment="5e11", grid_step_deg="20", bootstrap_iterations="20",
        **{"rupture-velocity": "2500", "rise-time": "0.2"},
    )

    # mechanism recovered: compare moment tensors (a grid search on a point
    # source legitimately lands on either nodal plane)
    from kiwi_tpu.euler import mt_from_sdr

    truth = mt_from_sdr(np.radians(91.0), np.radians(87.0), np.radians(164.0))
    got = mt_from_sdr(
        np.radians(best["strike"]), np.radians(best["dip"]),
        np.radians(best["slip-rake"]),
    )
    corr = (truth * got).sum() / np.sqrt((truth**2).sum() * (got**2).sum())
    assert corr > 0.9, (corr, best)
    assert abs(np.log10(best["moment"] / 1e12)) < 0.2
    assert abs(best["depth"] - 400.0) < 150.0

    assert os.path.exists(os.path.join(workdir, "report.html"))
    assert os.path.exists(
        os.path.join(workdir, "traceplotter", "current", "seismograms.png")
    )
