"""FDSN acquisition layer against recorded fixtures (zero egress).

Covers the role of the reference's wilber.py (event catalog + waveform
volume fetching) with a fake transport injected as the `opener`."""

import calendar
import os
import time as time_mod

import numpy as np
import pytest

from kiwi_tpu import acquisition as acq
from kiwi_tpu.io import mseed


EVENT_TEXT = """#EventID|Time|Latitude|Longitude|Depth/km|Author|Catalog|Contributor|ContributorID|MagType|Magnitude|MagAuthor|EventLocationName
ev001|1999-08-17T00:01:39.13|40.74|29.86|17.0|ISC|ISC|ISC|123|MW|7.6|GCMT|TURKEY
ev002|1999-08-17T12:00:00|35.00|25.00|40.0|ISC|ISC|ISC|124|MB|4.9|ISC|CRETE
"""

STATION_TEXT = """#Network|Station|Location|Channel|Latitude|Longitude|Elevation|Depth|Azimuth|Dip|SensorDescription|Scale|ScaleFreq|ScaleUnits|SampleRate|StartTime|EndTime
GE|APE||BHE|37.07|25.52|620.0|0.0|90|0|STS-2|6.0E8|0.02|M/S|20|1999-01-01T00:00:00|
GE|APE||BHN|37.07|25.52|620.0|0.0|0|0|STS-2|6.0E8|0.02|M/S|20|1999-01-01T00:00:00|
GE|APE||BHZ|37.07|25.52|620.0|0.0|0|-90|STS-2|6.0E8|0.02|M/S|20|1999-01-01T00:00:00|
GE|FAR||BHZ|62.01|-7.0|0.0|0.0|0|-90|STS-2|6.0E8|0.02|M/S|20|1999-01-01T00:00:00|
"""


class Fixtures:
    """Recorded-response transport; logs requested URLs."""

    def __init__(self, tmp_path):
        self.urls = []
        # a real mseed payload produced by our own writer
        data = np.sin(np.linspace(0, 30, 400)).astype(np.float32)
        fn = str(tmp_path / "payload.mseed")
        t0 = calendar.timegm(time_mod.strptime("1999-08-17T00:00:39",
                                               "%Y-%m-%dT%H:%M:%S"))
        mseed.write_py(fn, data, t0, 0.05, "GE", "APE", "", "BHZ")
        with open(fn, "rb") as f:
            self.payload = f.read()

    def __call__(self, url, timeout=60):
        self.urls.append(url)
        if "/fdsnws/event/" in url:
            return EVENT_TEXT.encode()
        if "/fdsnws/station/" in url:
            return STATION_TEXT.encode()
        if "/fdsnws/dataselect/" in url:
            if "channel=BHE" in url or "channel=BHN" in url:
                raise OSError("404 no data")
            return self.payload
        raise AssertionError(f"unexpected url {url}")


def test_catalog_parses_and_filters(tmp_path):
    fx = Fixtures(tmp_path)
    cat = acq.FDSNCatalog("http://fixture", opener=fx)
    t0 = calendar.timegm(time_mod.strptime("1999-08-17", "%Y-%m-%d"))
    events = cat.get_events((t0, t0 + 86400), min_magnitude=4.0)
    assert len(events) == 2
    ev = events[0]
    assert ev.name == "ev001"
    assert ev.mag == pytest.approx(7.6)
    assert ev.depth == pytest.approx(17000.0)
    assert ev.region == "TURKEY"
    assert abs(ev.timestamp - (t0 + 99.13)) < 1e-3
    assert "minmagnitude=4.0" in fx.urls[0]


def test_stations_distance_annotation(tmp_path):
    fx = Fixtures(tmp_path)
    ws = acq.FDSNWaveforms("http://fixture", opener=fx)
    ev = acq.Event(timestamp=9.3e8, mag=7.6, lat=40.74, lon=29.86,
                   depth=17000.0, name="ev001")
    sts = ws.get_stations(ev, dist_range_m=(1e5, 1e6))
    # APE (Aegean, ~560 km) is in range; FAR (Faroes, ~3800 km) is not
    assert [s.station for s in sts] == ["APE"]
    assert 4.0e5 < sts[0].dist_m < 7.0e5
    assert set(sts[0].channels) == {"BHE", "BHN", "BHZ"}


def test_fetch_dataset_writes_raw_layout(tmp_path):
    fx = Fixtures(tmp_path)
    ws = acq.FDSNWaveforms("http://fixture", opener=fx)
    ev = acq.Event(timestamp=9.3e8, mag=7.6, lat=40.74, lon=29.86,
                   depth=17000.0, name="ev001", region="TURKEY")
    workdir = str(tmp_path / "data")
    stations, paths = acq.fetch_dataset(
        ev, workdir, waveform_source=ws, dist_range_m=(1e5, 1e6))
    assert len(paths) == 1  # only BHZ had data; BHE/BHN 404ed gracefully
    assert os.path.exists(os.path.join(workdir, "stations.txt"))
    assert os.path.exists(os.path.join(workdir, "event.txt"))
    # the fetched file is readable mseed
    d, t0, dt = mseed.read(paths[0])
    assert len(d) == 400 and abs(dt - 0.05) < 1e-9


def test_autokiwi_pull_with_fdsn_fixtures(tmp_path):
    """End-to-end: autokiwi pull drives the FDSN catalog + fetcher against
    fixtures (VERDICT round-1 item 7's 'autokiwi pull works against a
    fixture catalog')."""
    from kiwi_tpu.cli.autokiwi import pull
    from kiwi_tpu.config import Config

    fx = Fixtures(tmp_path)
    t0 = calendar.timegm(time_mod.strptime("1999-08-17", "%Y-%m-%d"))
    pull_config = Config(
        catalog=acq.fdsn_catalog("http://fixture", opener=fx, min_magnitude=5.0),
        fetch=acq.fdsn_fetcher("http://fixture", opener=fx,
                               dist_range_m=(1e5, 1e6)),
        time_range=(t0, t0 + 86400),
        event_filter=lambda ev: ev.magnitude > 6.0,
        seed_volume=str(tmp_path / "events" / "%(event_name)s" / "data"),
    )
    got = pull(pull_config, which="all")
    assert got == ["ev001"]
    vol = str(tmp_path / "events" / "ev001" / "data")
    assert os.path.isdir(vol)
    assert os.path.exists(os.path.join(vol, "stations.txt"))
    assert any(f.startswith("raw-GE.APE") for f in os.listdir(vol))
