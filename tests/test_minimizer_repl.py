"""Protocol-server tests: a mini.inp-style scripted session through the
text protocol (minimizer.f90:1676-1812 framing)."""

import io

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.gf import elseis
from kiwi_tpu.cli.minimizer import MinimizerServer


@pytest.fixture(scope="module")
def dbfile(tmp_path_factory):
    d = tmp_path_factory.mktemp("db")
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=40, nz=6, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    fn = str(d / "testdb.npz")
    store.save(fn)
    return fn


@pytest.fixture(scope="module")
def rcvfile(tmp_path_factory):
    d = tmp_path_factory.mktemp("rcv")
    olat, olon = 30.0, 70.0
    lines = []
    for dist, az in [(1500.0, 0.0), (2300.0, 1.2), (3100.0, -2.0)]:
        la, lo = geo.ne_to_latlon(
            np.radians(olat), np.radians(olon), dist * np.cos(az), dist * np.sin(az)
        )
        lines.append(f"{np.degrees(float(la)):.6f} {np.degrees(float(lo)):.6f} ned")
    fn = str(d / "receivers.table")
    with open(fn, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fn


def run_session(script):
    srv = MinimizerServer()
    out = io.StringIO()
    srv.run(io.StringIO(script), out)
    return srv, out.getvalue()


def test_scripted_session(dbfile, rcvfile, tmp_path):
    outbase = str(tmp_path / "seis")
    script = f"""
set_database            {dbfile}
set_effective_dt        0.1
set_local_interpolation bilinear
set_receivers           {rcvfile}
set_source_location     30.0 70.0 0
set_source_params       bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
output_seismograms      {outbase} table synthetics plain
get_global_misfit
bogus_command 1 2 3
"""
    srv, out = run_session(script)
    lines = out.strip().splitlines()
    assert "set_database: ok" in lines
    assert "set_receivers: ok >" in lines
    assert "output_seismograms: ok" in lines
    assert "bogus_command: nok >" in lines
    # get_global_misfit fails politely: no reference seismograms set
    assert any(l.startswith("get_global_misfit: nok") for l in lines)
    # 3 receivers x ned written
    import os

    written = [f for f in os.listdir(tmp_path) if f.startswith("seis-")]
    assert len(written) == 9
    # the files parse as tables
    from kiwi_tpu.io import readseismogram

    data, t0, dt = readseismogram(str(tmp_path / "seis-1-n.table"))
    assert dt == pytest.approx(0.1, rel=1e-6)
    assert np.abs(data).max() > 0


def test_self_consistency_via_protocol(dbfile, rcvfile, tmp_path):
    outbase = str(tmp_path / "ref")
    script1 = f"""
set_database {dbfile}
set_effective_dt 0.1
set_local_interpolation bilinear
set_receivers {rcvfile}
set_source_location 30.0 70.0 0
set_source_params bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
output_seismograms {outbase} mseed synthetics plain
"""
    srv, out = run_session(script1)
    assert "output_seismograms: ok" in out

    # second session: read those as references, misfit of the same source = 0
    script2 = f"""
set_database {dbfile}
set_effective_dt 0.1
set_local_interpolation bilinear
set_receivers {rcvfile}
set_source_location 30.0 70.0 0
set_source_params bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
set_ref_seismograms {outbase} mseed
set_misfit_method l2norm
get_global_misfit
get_misfits
set_source_params bilateral 0 0 0 400 1e12 121 87 164 0 300 200 250 2500 0.2
get_global_misfit
"""
    srv, out = run_session(script2)
    lines = out.strip().splitlines()
    assert "set_ref_seismograms: ok" in lines
    i = lines.index("get_global_misfit: ok >")
    gm_same = float(lines[i + 1])
    assert gm_same < 1e-4, (gm_same, out)
    # misfit pairs answer parses as floats (2 per enabled rc row)
    j = lines.index("get_misfits: ok >")
    vals = [float(x) for x in lines[j + 1].split()]
    assert len(vals) == 18
    # perturbed strike -> bigger misfit (last answer)
    gm2 = float(lines[-1])
    assert gm2 > 0.05


def test_protocol_subparams_and_axes(dbfile, rcvfile):
    script = f"""
set_database {dbfile}
set_effective_dt 0.1
set_receivers {rcvfile}
set_source_location 30.0 70.0 0
set_source_params bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
set_source_params_mask F F F F F T F F F F F F F F
get_source_subparams
set_source_subparams 101.0
get_source_subparams
get_principal_axes
"""
    srv, out = run_session(script)
    lines = out.strip().splitlines()
    idx = [i for i, l in enumerate(lines) if l == "get_source_subparams: ok >"]
    assert float(lines[idx[0] + 1]) == 91.0
    assert float(lines[idx[1] + 1]) == 101.0
    k = lines.index("get_principal_axes: ok >")
    vals = [float(x) for x in lines[k + 1].split()]
    assert len(vals) == 4
