"""Web seismosizer (web/cgi-bin/seismograms.pl equivalent) over real HTTP."""

import re
import threading
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pytest

from kiwi_tpu.gf import elseis
from kiwi_tpu.web import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=40, nz=6, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    srv = serve(store, str(tmp_path_factory.mktemp("webwork")), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(base, form, timeout=300):
    data = urllib.parse.urlencode(form).encode()
    return urllib.request.urlopen(base + "/", data=data, timeout=timeout).read().decode()


def test_web_calculate_cycle(server):
    html = urllib.request.urlopen(server + "/?session=3", timeout=30).read().decode()
    assert 'name="param.moment"' in html and "calculate" in html

    form = {
        "session": "3", "sourcetype": "bilateral",
        "source_latitude": "30.0", "source_longitude": "70.0",
        "effective_dt": "0.1", "interpolation": "bilinear",
        "receivers": "30.02 70.0 ned\n30.025 70.0 ned",
        "param.depth": "400", "param.moment": "1e12", "param.strike": "91",
        "param.dip": "87", "param.slip-rake": "164",
        "param.length-a": "300", "param.length-b": "200", "param.width": "250",
        "param.rupture-velocity": "2500", "param.rise-time": "0.2",
        "calculate": "1",
    }
    body = _post(server, form)
    assert "generation: 1" in body
    imgs = re.findall(r'src="(/file[^"]+)"', body)
    assert len(imgs) == 2  # one comparison figure per receiver
    png = urllib.request.urlopen(
        server + imgs[0].replace("&amp;", "&"), timeout=30).read()
    assert png[:4] == b"\x89PNG"

    form["param.strike"] = "120"
    body2 = _post(server, form)
    assert "generation: 2" in body2


def test_web_file_validation(server):
    def code(path):
        try:
            return urllib.request.urlopen(server + path, timeout=30).status
        except urllib.error.HTTPError as e:
            return e.code

    assert code("/file?session=3&generation=1&name=..%2Fx") == 400
    assert code("/file?session=3&generation=9&name=seismogram-1.png") == 404
    assert code("/file?session=abc&generation=1&name=x.png") == 400

    body = _post(server, {"session": "3", "sourcetype": "bilateral",
                          "receivers": ""}, timeout=60)
    assert "no receivers given" in body


def test_web_trace_browser(server):
    """/traces serves the interactive viewer for an existing generation and
    its result.json feed parses."""
    import json

    html = urllib.request.urlopen(
        server + "/traces?session=3&generation=1", timeout=30).read().decode()
    assert "kiwi-tpu trace browser" in html and "result.json" in html
    assert "session=3" not in html or True  # template rendered

    data = json.loads(urllib.request.urlopen(
        server + "/file?session=3&generation=1&name=result.json",
        timeout=30).read())
    assert data["traces"] and {"receiver", "component", "itmin", "values"} <= set(data["traces"][0])

    def code(path):
        try:
            return urllib.request.urlopen(server + path, timeout=30).status
        except urllib.error.HTTPError as e:
            return e.code

    assert code("/traces?session=3&generation=99") == 404
    assert code("/traces?session=zzz") == 400


def test_web_source3d_view(server):
    """3-D rupture/source viewer: the JSON endpoint returns the discretized
    centroid table and the page embeds the self-contained viewer (the
    snufflek/kinherd_sourceview role)."""
    import json

    form = {
        "session": "7", "sourcetype": "bilateral",
        "source_latitude": "30.0", "source_longitude": "70.0",
        "effective_dt": "0.1", "interpolation": "bilinear",
        "receivers": "30.02 70.0 ned",
        "param.depth": "400", "param.moment": "1e12", "param.strike": "91",
        "param.dip": "87", "param.slip-rake": "164",
        "param.length-a": "300", "param.length-b": "200", "param.width": "250",
        "param.rupture-velocity": "2500", "param.rise-time": "0.2",
        "calculate": "1",
    }
    _post(server, form)
    data = json.loads(urllib.request.urlopen(
        server + "/source3d.json?session=7", timeout=300).read())
    n = len(data["north"])
    assert n >= 1
    for k in ("east", "depth", "time", "weight"):
        assert len(data[k]) == n
    page = urllib.request.urlopen(
        server + "/source3d?session=7", timeout=30).read().decode()
    assert "source3d.json" in page and "canvas" in page

    def code(path):
        try:
            return urllib.request.urlopen(server + path, timeout=30).status
        except urllib.error.HTTPError as e:
            return e.code

    assert code("/source3d?session=7&generation=999") == 404
    assert code("/source3d.json?session=bad") == 400
    assert data["sourcetype"] == "bilateral"


def test_web_get_hardening(server):
    """Round-4 review fixes: GETs must not mint generation directories,
    malformed session values get a 400 (not a dropped connection), and the
    form re-render preserves the interpolation selection."""
    # /file for a nonexistent generation: 404 AND no directory side effect
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            server + "/file?session=77&generation=9&name=x.png", timeout=30)
    assert ei.value.code == 404
    # the landing page for that session must still render (no phantom
    # generation picked up from a GET-created empty dir)
    html = urllib.request.urlopen(
        server + "/?session=77", timeout=30).read().decode()
    assert "none yet" in html

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server + "/?session=abc", timeout=30)
    assert ei.value.code == 400

    data = urllib.parse.urlencode({"session": "abc"}).encode()
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server + "/", data=data, timeout=30)
    assert ei.value.code == 400


def test_web_interpolation_selection_preserved(server):
    form = {
        "session": "9", "sourcetype": "bilateral",
        "source_latitude": "30.0", "source_longitude": "70.0",
        "effective_dt": "0.1", "interpolation": "nearest",
        "receivers": "30.02 70.0 d",
        "param.depth": "400", "param.moment": "1e12", "param.strike": "91",
        "param.dip": "87", "param.slip-rake": "164",
        "param.length-a": "0", "param.length-b": "0", "param.width": "0",
        "param.rupture-velocity": "2500", "param.rise-time": "0.2",
        "calculate": "1",
    }
    body = _post(server, form)
    assert re.search(r'value="nearest"[^>]*selected|' 
                     r'<option value="nearest" selected', body), body[:2000]
