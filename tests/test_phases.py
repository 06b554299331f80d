"""Phase/timing/taper tests."""

import numpy as np
import pytest

from kiwi_tpu.phases import Phase, Taper, Timing


def test_phase_interpolation_no_depth():
    sn = Phase("Sn")  # 2-column table
    t1 = sn(300e3)
    t2 = sn(400e3)
    assert t1 is not None and t2 is not None
    assert t2 > t1
    tm = sn(350e3)
    assert min(t1, t2) < tm < max(t1, t2)


def test_phase_out_of_bounds_returns_none():
    sn = Phase("Sn")
    assert sn(-10.0) is None
    assert sn(1e12) is None


def test_phase_with_depth():
    p = Phase("P")  # 3-column table
    assert p.have_depth
    t_shallow = p(2e6, 35000.0)
    t_deep = p(2e6, 300000.0)
    assert t_shallow is not None and t_deep is not None
    assert t_deep < t_shallow  # deeper source arrives earlier


def test_timing_fallback():
    t = Timing(("S", "Sn"), offset=-10.0)
    v = t(1e6)  # S table may not cover; Sn does
    assert v is not None
    sn = Phase("Sn")(1e6)
    s = Phase("S")(1e6)
    expected = (s if s is not None else sn) - 10.0
    assert abs(v - expected) < 1e-9


def test_taper_points_ordered():
    tap = Taper(phases=("S", "Sn"), offsets=(-10, 0, 40, 50))
    pts = tap(1e6)
    xs = pts[0::2]
    ys = pts[1::2]
    assert list(ys) == [0.0, 1.0, 1.0, 0.0]
    assert all(b > a for a, b in zip(xs, xs[1:]))


def test_taper_engine_application():
    from kiwi_tpu import geo
    from kiwi_tpu.engine import Engine, Receiver
    from kiwi_tpu.gf.store import GFStoreBuilder
    from kiwi_tpu.phases import apply_taper_to_engine

    b = GFStoreBuilder(nx=4, nz=2, ng=10, dt=0.5, dx=100e3, dz=10e3, firstx=100e3)
    eng = Engine(b.build())
    olat, olon = 30.0, 70.0
    recs = []
    for d in (300e3, 1e3):  # second receiver is below the Sn table minimum
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.0)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    tap = Taper(phases=("Sn",), offsets=(-10, 0, 40, 50))
    apply_taper_to_engine(eng, tap)
    assert 0 in eng._tapers  # receiver 0 got a taper
    assert eng.receivers[1].enabled is False  # out-of-table receiver disabled
    assert len(eng._tapers) == 3  # 3 components of receiver 0
