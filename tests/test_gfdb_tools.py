"""gfdb_* CLI tools end-to-end on small stores (gfdb_build.f90,
gfdb_extract.f90, gfdb_info.f90 + the downsample/phaser/meta scripts)."""

import io
import json
import sys

import numpy as np
import pytest

from kiwi_tpu.cli import gfdb_tools
from kiwi_tpu.gf.store import GFStore, GFStoreBuilder


@pytest.fixture()
def small_store(tmp_path):
    b = GFStoreBuilder(6, 3, 10, 0.5, 100.0, 100.0, 100.0, 0.0)
    rng = np.random.default_rng(0)
    for ix in range(6):
        for iz in range(3):
            for ig in range(10):
                v = rng.normal(size=24).astype(np.float32)
                v[-1] = 0.0
                b.put_trace(ix, iz, ig, v, 4 + ix)
    fn = str(tmp_path / "db.npz")
    b.build().save(fn)
    return fn


def test_gfdb_info_and_meta(small_store, capsys):
    gfdb_tools.gfdb_info([small_store])
    out = capsys.readouterr().out
    assert "dt=0.5" in out and "nx=6" in out and "total_traces=180/180" in out

    gfdb_tools.gfdb_meta([small_store])
    meta = json.loads(capsys.readouterr().out)
    assert meta["ng"] == 10 and meta["distance_max"] == 100.0 + 5 * 100.0


def test_gfdb_extract_and_build_roundtrip(small_store, tmp_path, capsys,
                                          monkeypatch):
    src = GFStore.load(small_store)
    # extract one trace to a table file
    outfn = str(tmp_path / "tr.table")
    monkeypatch.setattr("sys.stdin", io.StringIO(f"300 100 3 '{outfn}'\n"))
    gfdb_tools.gfdb_extract([small_store])
    assert "ok" in capsys.readouterr().out
    tab = np.loadtxt(outfn)
    ref_v, ref_it = src.get_trace(2, 1, 2)
    np.testing.assert_allclose(tab[:, 1], ref_v, rtol=1e-6)
    np.testing.assert_allclose(tab[0, 0], ref_it * 0.5, atol=1e-6)

    # build a fresh db from that trace file
    newfn = str(tmp_path / "new.npz")
    monkeypatch.setattr("sys.stdin", io.StringIO(f"300 100 3 '{outfn}'\n"))
    gfdb_tools.gfdb_build([newfn, "1", "6", "3", "10", "0.5", "100", "100",
                           "100", "0"])
    new = GFStore.load(newfn)
    v2, it2 = new.get_trace(2, 1, 2)
    np.testing.assert_allclose(v2, ref_v, rtol=1e-5)
    assert it2 == ref_it


def test_gfdb_downsample(small_store, tmp_path):
    outfn = str(tmp_path / "ds.npz")
    gfdb_tools.gfdb_downsample([small_store, outfn, "2"])
    ds = GFStore.load(outfn)
    assert abs(ds.dt - 1.0) < 1e-9
    src = GFStore.load(small_store)
    v0, _ = src.get_trace(0, 0, 0)
    v1, _ = ds.get_trace(0, 0, 0)
    assert 0 < len(v1) <= len(v0) // 2 + 2
    # energy is preserved to first order by the anti-alias decimation
    assert np.abs(v1).max() < 3 * np.abs(v0).max()

    # time-label exactness for q != 4 (round-4 review finding: a fixed
    # [4::q] keep-phase mislabeled q=2 outputs one coarse sample early):
    # kept samples must BE fine-grid samples at the labeled coarse times
    from scipy import signal

    for q in (2, 3, 8):
        outq = str(tmp_path / f"ds{q}.npz")
        gfdb_tools.gfdb_downsample([small_store, outq, str(q)])
        dsq = GFStore.load(outq)
        vq, itq = dsq.get_trace(0, 0, 0)
        v_f, it_f = src.get_trace(0, 0, 0)
        b, a = signal.cheby1(8, 0.05, 0.8 / q)
        pre = it_f % q
        filt = signal.lfilter(
            b, a, np.concatenate([np.zeros(pre, np.float32), v_f]))
        j0 = q * (-(-4 // q))
        np.testing.assert_allclose(vq, filt[j0::q], rtol=1e-6)
        assert itq * q == (it_f - pre) + j0  # same absolute fine-grid time


def test_gfdb_specialextract(small_store, tmp_path, capsys, monkeypatch):
    outfn = str(tmp_path / "slice.table")
    monkeypatch.setattr("sys.stdin", io.StringIO(f"100 3 '{outfn}'\n"))
    gfdb_tools.gfdb_specialextract([small_store])
    tab = np.loadtxt(outfn)
    src = GFStore.load(small_store)
    lo, hi = src.span()
    assert tab.shape == (hi - lo + 1, src.nx)  # one column per distance
    v, it0 = src.get_trace(4, 1, 2)  # z=100 -> iz=1; ig 3 -> 0-based 2
    np.testing.assert_allclose(tab[it0 - lo : it0 - lo + len(v), 4], v,
                               rtol=2e-5)
