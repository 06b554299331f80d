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


def test_diagnostics_and_lm_session(dbfile, rcvfile, tmp_path):
    """The long tail of protocol commands: distances/spectra/source-model
    outputs, peak/arias/floating diagnostics, shifts, filters/tapers,
    subparam limits + minimize_lm, crustal thickness, cache commands."""
    base = str(tmp_path / "out")
    script = f"""
set_database            {dbfile}
set_effective_dt        0.1
set_local_interpolation bilinear
set_receivers           {rcvfile}
set_source_location     30.0 70.0 0
set_source_params       bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
output_seismograms      {base}-ref mseed synthetics plain
set_ref_seismograms     {base}-ref mseed
set_misfit_method       floating_l1norm
set_floating_shiftrange 0 -0.5 0.5
set_misfit_taper        1 0.1 0 2.5 1 6.0 1 8.0 0
set_misfit_filter       0 0 1 0.2 1 3.0 0 4.0
get_global_misfit
get_floating_shifts
get_peak_amplitudes     1
get_peak_amplitudes     2
get_arias_intensities
output_distances        {base}-dist.table
output_source_model     {base}-model
output_seismogram_spectra {base}-spec references plain
output_cross_correlations {base}-xcorr -0.3 0.3
shift_ref_seismogram    1 0.2
autoshift_ref_seismogram 1 -0.5 0.5
get_source_crustal_thickness
set_source_crustal_thickness_limit 40000
set_cached_traces_memory_limit 1000000000
get_cached_traces_memory
set_synthetics_factor   1.0
set_source_params_mask  F F F T F T F F F F F F F F
set_source_subparams_limits 300 85 500 95
minimize_lm
minimize_gradient       10 0.01
get_source_subparams    2 3 5
set_verbose             T
set_ignore_sigint       T
"""
    srv, out = run_session(script.strip())
    noks = [l for l in out.splitlines() if ": nok" in l]
    assert not noks, noks
    # LM answered "info nfev misfit"
    lm_line = [l for l in out.splitlines() if l.startswith("minimize_lm: ok")]
    assert lm_line
    # the gradient extension answered "steps starts misfit"
    mg_line = [l for l in out.splitlines()
               if l.startswith("minimize_gradient: ok")]
    assert mg_line
    # outputs exist
    import os
    assert os.path.exists(f"{base}-dist.table")
    assert os.path.exists(f"{base}-model-dsm.table")  # discretized source table
    dsm = np.loadtxt(f"{base}-model-dsm.table")
    assert dsm.shape[1] == 10  # north east depth time m6
    assert os.path.exists(f"{base}-spec-1-n.table")
    assert os.path.exists(f"{base}-xcorr-1-n.table")
    dist = np.loadtxt(f"{base}-dist.table")
    assert dist.shape[0] == 3  # one row per receiver


def test_protocol_survives_malformed_input(dbfile, rcvfile):
    """Malformed commands answer nok and the session keeps going
    (minimizer.f90:1682-1697's error protocol)."""
    script = f"""
bogus_command 1 2 3
set_database
set_database /nonexistent/path.npz
set_database {dbfile}
set_source_location not a number
set_source_params bilateral 1 2
set_receivers /nonexistent.table
set_receivers {rcvfile}
set_source_location 30.0 70.0 0
set_source_params bilateral 0 0 0 400 1e12 91 87 164 0 300 200 250 2500 0.2
set_effective_dt 0.1
get_global_misfit
minimize_lm extra args here
output_seismograms
get_distances_typo
set_misfit_method not_a_norm
get_source_subparams 99
"""
    srv, out = run_session(script.strip())
    lines = [l for l in out.splitlines() if l.strip()]
    # the good commands succeeded
    assert any(l.startswith("set_database: ok") for l in lines)
    assert any(l.startswith("set_receivers: ok") for l in lines)
    assert any(l.startswith("set_source_params: ok") for l in lines)
    # the bad ones answered nok (no crash, no silent ok)
    for bad in ("bogus_command", "set_misfit_method: nok",
                "get_source_subparams: nok"):
        assert any(bad in l for l in lines), (bad, lines)
    # get_global_misfit noks cleanly without references
    assert any(l.startswith("get_global_misfit: nok") for l in lines)
