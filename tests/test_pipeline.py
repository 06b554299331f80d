"""Pipeline step tests: a miniature end-to-end inversion workflow."""

import os

import numpy as np
import pytest

from kiwi_tpu import geo
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis
from kiwi_tpu.invert import Source
from kiwi_tpu.pipeline import Informer, ParamTuner, Shifter, WeightMaker


@pytest.fixture(scope="module")
def engine():
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=45, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
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


TRUE = np.array(
    [0.0, 0.0, 0.0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0, 2500.0, 0.2],
    dtype=np.float32,
)


def test_param_tuner_workflow(engine, tmp_path):
    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()

    base = Source("bilateral", TRUE)
    base["strike"] = 60.0  # start away from truth

    info = Informer(str(tmp_path), "informer")
    lines = info.work(engine)
    assert len(lines) == 3

    tuner = ParamTuner(
        str(tmp_path),
        [("strike", np.arange(31.0, 152.0, 10.0))],
        bootstrap_iterations=20,
    ).chain(info)
    best, stats = tuner.work(engine, base)
    assert base["strike"] == pytest.approx(91.0)
    assert tuner.out_config["min_misfit"] < 1e-4

    # run dirs + persisted artifacts
    stepdir = os.path.join(str(tmp_path), tuner.name)
    assert os.path.islink(os.path.join(stepdir, "current"))
    assert os.path.exists(os.path.join(stepdir, "001", "config-out.pickle"))
    dumped = tuner.load(tuner.name)
    assert dumped["misfits_by_src"].shape[0] == 13

    # second run gets a new run dir, current moves
    tuner.work(engine, base)
    assert os.path.exists(os.path.join(stepdir, "002"))
    assert os.readlink(os.path.join(stepdir, "current")) == "002"


def test_weightmaker(engine, tmp_path):
    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    refs_before = {k: (v[0].copy(), v[1]) for k, v in engine._refs.items()}

    wm = WeightMaker(str(tmp_path))
    weights = wm.work(engine, Source("bilateral", TRUE))
    assert weights.shape == (3,)
    assert np.all(weights > 0)
    # references restored
    for k, (v, i) in refs_before.items():
        np.testing.assert_array_equal(engine._refs[k][0], v)


def test_shifter(engine, tmp_path):
    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    # shift all references by +0.4 s, shifter should undo it
    for irec in range(3):
        engine.shift_ref_seismogram(irec, 4)
    sh = Shifter(str(tmp_path), shiftrange=(-1.0, 1.0))
    shifts = sh.work(engine)
    assert np.allclose(shifts, -0.4, atol=1e-6), shifts
    assert engine.get_global_misfit() < 1e-4


def test_greeper(engine, tmp_path):
    from kiwi_tpu.pipeline import Greeper

    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    base = Source("bilateral", TRUE)
    gr = Greeper(str(tmp_path), [("strike", np.array([70.0, 110.0]))])
    src, gm = gr.work(engine, base)
    assert gm < 1e-3
    assert abs(src["strike"] - 91.0) < 1.0


def test_gradient_greeper(engine, tmp_path):
    from kiwi_tpu.pipeline import GradientGreeper

    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    base = Source("bilateral", TRUE)
    gr = GradientGreeper(
        str(tmp_path), [("strike", np.array([78.0, 104.0]))],
        steps=40, lr=0.02)
    src, gm = gr.work(engine, base)
    assert gm < 1e-3
    assert abs(src["strike"] - 91.0) < 1.0


def test_effective_dt_tester(engine, tmp_path):
    from kiwi_tpu.pipeline import EffectiveDtTester

    engine.set_source_params("bilateral", TRUE)
    engine.set_misfit_method("l2norm")
    engine.set_synthetic_reference()
    base = Source("bilateral", TRUE)
    t = EffectiveDtTester(str(tmp_path), dts=[0.1, 0.2, 0.4], tolerance=0.5)
    chosen, curve = t.work(engine, base)
    assert chosen in (0.1, 0.2, 0.4)
    assert len(curve) == 3


def test_config_path_templating(tmp_path):
    """Chained %(key)s path templating + python config files
    (configurator.py:12-96)."""
    from kiwi_tpu.config import Config, load_pyconfig

    base = Config(base_dir="/data/events", event_name="ev2024")
    c = Config(base, event_dir="%(base_dir)s/%(event_name)s",
               work="%(event_dir)s/work-%(run)s")
    assert c.path("event_dir") == "/data/events/ev2024"
    assert c.mkpath(c["work"], additional={"run": 3}) == "/data/events/ev2024/work-3"
    assert c.path_or_none("missing") is None
    assert c.event_name == "ev2024"  # attribute access walks the chain

    fn = tmp_path / "conf.py"
    fn.write_text("base = Config(gfdb='/gf/db')\n"
                  "run = Config(base, out='%(gfdb)s/out')\n")
    cfgs = load_pyconfig(str(fn))
    assert cfgs["run"].path("out") == "/gf/db/out"


def test_autokiwi_workflow(tmp_path, monkeypatch, capsys):
    """Offline autokiwi cycle: pull -> prepare -> process -> report -> post
    -> list over event directories (python/scripts/autokiwi's command
    surface with a local catalog backend)."""
    from kiwi_tpu.cli import autokiwi

    (tmp_path / "autokiwi.conf").write_text(
        "base_config = Config(base_dir='.',\n"
        "    event_dir='%(base_dir)s/events/%(event_name)s',\n"
        "    seed_volume='%(event_dir)s/data.kiwi',\n"
        "    fail_filename='%(event_dir)s/failed')\n"
        "pull_config = Config(base_config, catalog='catalog.txt')\n"
        "kiwi_config = Config(base_config,\n"
        "    processing_dir='%(event_dir)s/work',\n"
        "    processing_command=['python', '-c',\n"
        "        \"open('result.txt','w').write('x')\"],\n"
        "    report_command=['python', '-c', \"open('r.html','w').write('x')\"],\n"
        "    done_filename='%(event_dir)s/work/result.txt')\n"
        "post_config = Config(base_config,\n"
        "    source_dir='%(event_dir)s/work',\n"
        "    target_dir='%(base_dir)s/pub/%(event_name)s')\n"
    )
    (tmp_path / "catalog.txt").write_text(
        "ev-a 1000.0 40.0 29.0 17000 7.6 SomeRegion\n"
        "ev-b 2000.0 38.0 142.0 29000 9.1 Other\n"
    )
    monkeypatch.chdir(tmp_path)

    autokiwi.main(["pull", "first"])
    assert capsys.readouterr().out.strip() == "ev-b"  # newest first
    autokiwi.main(["pull", "all"])
    autokiwi.main(["list"])
    assert set(capsys.readouterr().out.split()) >= {"ev-a", "ev-b"}

    autokiwi.main(["prepare,process,report", "all"])
    assert (tmp_path / "events/ev-a/work/result.txt").exists()
    assert (tmp_path / "events/ev-b/work/r.html").exists()

    autokiwi.main(["post", "all"])
    assert (tmp_path / "pub/ev-a/result.txt").exists()

    # nothing missing once results exist
    autokiwi.main(["process", "missing"])

    ev = autokiwi.Event.load(str(tmp_path / "events/ev-b/data.kiwi.event"))
    assert ev.name == "ev-b" and ev.magnitude == 9.1


def test_profiling_utilities():
    """Timers + MPS counter (SURVEY §5 tracing)."""
    import time as _t

    from kiwi_tpu.profiling import MPSCounter, Timers

    tm = Timers()
    with tm("phase_a"):
        _t.sleep(0.01)
    with tm("phase_a"):
        pass
    with tm("phase_b"):
        pass
    assert tm.counts["phase_a"] == 2 and tm.acc["phase_a"] >= 0.01
    rep = tm.report()
    assert "phase_a" in rep and "%" in rep

    c = MPSCounter(window=3)
    for _ in range(4):
        c.add(100)
        _t.sleep(0.002)
    total, window, last = c.rates()
    assert total > 0 and window > 0 and last > 0


def test_enduring_point_source_and_traceplotter(tmp_path, engine):
    """EnduringPointSource recovers a bilateral source's mechanism as a
    point MT sweep; TracePlotter writes the figures (inversion.py:558+)."""
    from kiwi_tpu.pipeline import EnduringPointSource, TracePlotter
    from kiwi_tpu.invert import Source

    eng = engine
    true_params = TRUE
    eng.set_misfit_method("l2norm")
    eng.set_source_params("bilateral", true_params)
    eng.set_synthetic_reference()

    base = Source("bilateral", true_params)
    base["strike"] = 0.0
    eps = EnduringPointSource(str(tmp_path))
    src = eps.work(eng, base)
    # mechanism recovered up to the conjugate-plane ambiguity
    d = abs(((src["strike"] - true_params[5] + 180.0) % 360.0) - 180.0)
    dc = abs(((src["strike"] - true_params[5] - 180.0 + 180.0) % 360.0) - 180.0)
    assert min(d, dc) <= 30.0
    assert eps.out_config["min_misfit"] < 0.9

    tp = TracePlotter(str(tmp_path))
    figs = tp.work(eng)
    import os as _os
    for f in figs:
        assert _os.path.exists(f) and _os.path.getsize(f) > 0


def test_ext_configurator(tmp_path):
    """ExtConfigurator (inversion.py:823-864): filter corners retuned to
    the found rise time, eikonal search ranges scaled by
    size_factor * rise_time, constraining planes bounded by 2 * depth."""
    from kiwi_tpu.pipeline import ExtConfigurator
    from kiwi_tpu.plf import PLF

    ec = ExtConfigurator(str(tmp_path), frequency_factor=2.0,
                         size_factor=4000.0, steps=5.0)
    ec.in_config = {
        "rise_time": 0.5,
        "depth": 1000.0,
        "filter": PLF([0.05, 0.1, 2.0, 4.0], [0.0, 1.0, 1.0, 0.0]),
        "constraining_planes": [((0.0, 0.0, 0.0), (0.0, 0.0, -1.0)),
                                ((0.0, 0.0, 30000.0), (0.0, 0.0, 1.0))],
    }
    out = ec.work()
    f = out["filter"]
    np.testing.assert_allclose(f.x[2], 4.0)   # 2.0 / 0.5
    np.testing.assert_allclose(f.x[3], 6.0)   # 3.0 / 0.5
    assert out["bord_radius_range"] == (0.0, 2000.0, 400.0)
    assert out["nukl_shift_x_range"] == (-2000.0, 2000.0, 400.0)
    assert out["nukl_shift_y_range"] == (-2000.0, 2000.0, 400.0)
    # depth*2 = 2000 < 30000 -> the lower plane tightens to 2000
    assert out["constraining_planes"][1][0][2] == 2000.0
    assert out["constraining_planes"][0][1] == (0.0, 0.0, -1.0)


def test_misfit_grid_stats_xml_and_converted():
    """MisfitGridStats.as_xml (gridsearch.py:84-98) + converted unit
    re-derivation (gridsearch.py:100-108)."""
    from kiwi_tpu.invert.gridsearch import MisfitGridStats

    rng = np.random.default_rng(3)
    dist = rng.normal(5000.0, 300.0, 400)
    st = MisfitGridStats("depth", 5000.0, dist,
                         tested_values=np.linspace(4000.0, 6000.0, 11))
    xml = st.as_xml()
    assert "<name>Depth</name>" in xml
    assert f"<value>{5000.0:e}</value>" in xml
    assert "<interval>68</interval>" in xml
    assert "<low_unclear>0</low_unclear>" in xml

    km = st.converted("depth-km", lambda v: np.asarray(v) / 1000.0)
    np.testing.assert_allclose(km.best, 5.0)
    np.testing.assert_allclose(km.percentile84, st.percentile84 / 1000.0,
                               rtol=1e-3)
    assert km.percentile16_warn == st.percentile16_warn
