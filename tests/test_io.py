"""I/O round-trip tests (counterpart of test_io.f90 + test_gfdb.f90's
storage round trip)."""

import numpy as np
import pytest

from kiwi_tpu.io import readseismogram, writeseismogram
from kiwi_tpu.io import mseed as ms
from kiwi_tpu.io.gfdb_hdf5 import load_gfdb, save_gfdb
from kiwi_tpu.gf.store import GFStoreBuilder


def test_table_roundtrip(tmp_path):
    fn = str(tmp_path / "x.table")
    data = np.array([0.5, -1.25, 3.0, 0.0, 2.0], dtype=np.float32)
    writeseismogram(fn, "*", data, 12.25, 0.5)
    d2, t0, dt = readseismogram(fn)
    np.testing.assert_allclose(d2, data, rtol=1e-6)
    assert abs(t0 - 12.25) < 1e-9
    assert abs(dt - 0.5) < 1e-9


def test_mseed_roundtrip(tmp_path):
    fn = str(tmp_path / "x.mseed")
    rng = np.random.default_rng(0)
    data = rng.normal(size=2500).astype(np.float32)  # spans 3 records
    t0 = 1060000000.12345
    writeseismogram(fn, "*", data, t0, 0.1, network="KW", station="STA1", channel="nd")
    d2, t02, dt2 = readseismogram(fn)
    np.testing.assert_array_equal(d2, data)
    # the writer rounds to 1e-5 s like the reference (mseed_simple.c:70-78)
    assert abs(t02 - t0) < 2e-4
    assert abs(dt2 - 0.1) < 1e-12


def test_mseed_nonintegral_rate(tmp_path):
    fn = str(tmp_path / "y.mseed")
    data = np.arange(10, dtype=np.float32)
    ms.write(fn, data, 0.0, 0.3)
    d2, t0, dt = ms.read(fn)
    np.testing.assert_array_equal(d2, data)
    assert abs(dt - 0.3) < 1e-4


def test_steim1_decode():
    # build a tiny synthetic steim1 record payload: one 64-byte frame
    import struct

    samples = np.array([5, 7, 6, 6, 10], dtype=np.int64)
    diffs = np.diff(samples, prepend=samples[0])
    # w1 = x0, w2 = xn, w3 = 4 byte diffs... need 5 diffs: w3: 4x int8, w4: 1x int32
    frame = bytearray(64)
    codes = [0, 0, 0, 1, 3] + [0] * 11
    w0 = 0
    for i, c in enumerate(codes):
        w0 |= c << (2 * (15 - i))
    frame[0:4] = struct.pack(">I", w0)
    frame[4:8] = struct.pack(">i", samples[0])
    frame[8:12] = struct.pack(">i", samples[-1])
    frame[12:16] = struct.pack(">4b", *diffs[:4])
    frame[16:20] = struct.pack(">i", diffs[4])
    out = ms._decode_steim(bytes(frame), 5, 1)
    np.testing.assert_array_equal(out, samples.astype(np.float32))


def test_sac_roundtrip(tmp_path):
    fn = str(tmp_path / "x.sac")
    data = np.linspace(-1, 1, 300).astype(np.float32)
    writeseismogram(fn, "*", data, -5.0, 0.25, station="ABC", channel="n")
    d2, t0, dt = readseismogram(fn)
    np.testing.assert_array_equal(d2, data)
    assert abs(t0 + 5.0) < 1e-5
    assert abs(dt - 0.25) < 1e-7


def test_gfdb_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    base = str(tmp_path / "db")
    b = GFStoreBuilder(nx=7, nz=3, ng=10, dt=0.1, dx=50.0, dz=50.0, firstx=50.0)
    rng = np.random.default_rng(1)
    for ix in range(7):
        for iz in range(3):
            for ig in range(10):
                if (ix + iz + ig) % 3 == 0:
                    continue  # leave some traces missing
                n = rng.integers(4, 30)
                v = rng.normal(size=n).astype(np.float32)
                if ig % 2 == 0:
                    v[-3:] = 0.0  # zero tail
                b.put_trace(ix, iz, ig, v, int(rng.integers(-5, 40)))
    store = b.build()

    nchunks = save_gfdb(store, base, nchunks=3)
    assert nchunks == 3
    store2 = load_gfdb(base)

    assert store2.nx == store.nx and store2.ng == store.ng
    assert abs(store2.dt - store.dt) < 1e-7 and store2.firstx == store.firstx
    for ix in range(7):
        for iz in range(3):
            for ig in range(10):
                a = store.get_trace(ix, iz, ig)
                c = store2.get_trace(ix, iz, ig)
                if a is None:
                    assert c is None
                    continue
                va, ia = a
                vc, ic = c
                assert ia == ic, (ix, iz, ig)
                np.testing.assert_array_equal(va, vc)


def test_gfdb_hdf5_sparse_gap_elision(tmp_path):
    pytest.importorskip("h5py")
    base = str(tmp_path / "db2")
    b = GFStoreBuilder(nx=1, nz=1, ng=1, dt=0.1, dx=50.0, dz=50.0)
    v = np.zeros(40, dtype=np.float32)
    v[2:5] = [1, 2, 3]
    v[25:28] = [4, 5, 6]  # gap of 20 zeros -> two strips on disk
    b.put_trace(0, 0, 0, v, 10)
    store = b.build()
    save_gfdb(store, base)

    import h5py

    with h5py.File(f"{base}.1.chunk", "r") as f:
        ds = f["gf/1/1/1"]
        assert len(ds.attrs["pofs"]) == 2  # two strips
        assert ds.shape[0] < 30  # gap elided on disk

    store2 = load_gfdb(base)
    va, ia = store2.get_trace(0, 0, 0)
    vb, ib = store.get_trace(0, 0, 0)
    assert ia == ib
    np.testing.assert_array_equal(va, vb)


def test_native_mseed_cross_compat(tmp_path):
    """The C++ codec and the Python codec must interoperate byte-for-byte."""
    from kiwi_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable (no g++?)")
    rng = np.random.default_rng(3)
    data = rng.normal(size=1500).astype(np.float32)
    t0 = 123456.789
    f1 = str(tmp_path / "native.mseed")
    f2 = str(tmp_path / "python.mseed")
    assert native.mseed_write(f1, data, t0, 0.25, "KW", "STA", "", "n")
    ms.write_py(f2, data, t0, 0.25, "KW", "STA", "", "n")
    with open(f1, "rb") as a, open(f2, "rb") as b:
        assert a.read() == b.read()
    # both readers decode the native file
    d1, t1, dt1 = ms.read_py(f1)
    d2, t2, dt2 = native.mseed_read(f1)
    np.testing.assert_array_equal(d1, data)
    np.testing.assert_array_equal(d2, data)
    assert abs(t1 - t2) < 1e-9 and abs(dt1 - 0.25) < 1e-12


def test_native_mseed_steim_matches_python():
    from kiwi_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    # python steim1 synthetic frame from test_steim1_decode, via a full record
    import struct

    samples = np.array([5, 7, 6, 6, 10], dtype=np.int64)
    diffs = np.diff(samples, prepend=samples[0])
    frame = bytearray(64)
    codes = [0, 0, 0, 1, 3] + [0] * 11
    w0 = 0
    for i, c in enumerate(codes):
        w0 |= c << (2 * (15 - i))
    frame[0:4] = struct.pack(">I", w0)
    frame[4:8] = struct.pack(">i", samples[0])
    frame[8:12] = struct.pack(">i", samples[-1])
    frame[12:16] = struct.pack(">4b", *diffs[:4])
    frame[16:20] = struct.pack(">i", diffs[4])
    out = ms._decode_steim(bytes(frame), 5, 1)
    np.testing.assert_array_equal(out, samples.astype(np.float32))


def test_sac_native_codec_byte_identical(tmp_path):
    """C++ SAC codec (native/sac.cc) produces byte-identical files to the
    Python codec and both readers agree (incl. big-endian files)."""
    from kiwi_tpu import native
    from kiwi_tpu.io import sac

    if native.get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")

    data = (np.sin(np.linspace(0, 9, 77)) * 3e-7).astype(np.float32)
    f1 = str(tmp_path / "n.sac")
    f2 = str(tmp_path / "p.sac")
    assert native.sac_write(f1, data, 1.5, 0.1, station="STA", channel="BHE")
    sac.write_py(f2, data, 1.5, 0.1, station="STA", channel="BHE")
    assert open(f1, "rb").read() == open(f2, "rb").read()

    d1, t1, dt1 = native.sac_read(f1)
    d2, t2, dt2 = sac.read_py(f1)
    np.testing.assert_array_equal(d1, data)
    np.testing.assert_array_equal(d2, data)
    assert (t1, dt1) == (t2, dt2)

    # big-endian file: native reader byte-swaps
    f3 = str(tmp_path / "be.sac")
    sac.write_py(f3, data, -2.0, 0.25, endian=">")
    d3, t3, dt3 = native.sac_read(f3)
    np.testing.assert_array_equal(d3, data)
    assert abs(t3 + 2.0) < 1e-6 and abs(dt3 - 0.25) < 1e-9


def test_native_mseed_malformed_robust(tmp_path):
    """Truncated files and garbage data-offset headers must not read out of
    bounds or return uninitialized memory (reads clamp to the payload that
    is actually present)."""
    from kiwi_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    data = rng.normal(size=2500).astype(np.float32)  # spans 3 records
    good = tmp_path / "good.mseed"
    native.mseed_write(str(good), data, 100.0, 0.5, "KW", "STA", "", "n")
    blob = good.read_bytes()

    # truncate mid-record: the counting pass and the filling pass must agree
    # and only return samples whose bytes exist
    trunc = tmp_path / "trunc.mseed"
    cut = 4096 + 64 + 4 * 100  # 100 samples into record 2
    trunc.write_bytes(blob[:cut])
    d, t0, dt = native.mseed_read(str(trunc))
    per_rec = (4096 - 64) // 4
    assert len(d) == per_rec + 100
    np.testing.assert_array_equal(d, data[: per_rec + 100])

    # corrupt dofs (data offset) of record 2 to point past the record: that
    # record contributes nothing, no crash, rest of file still decodes
    bad = bytearray(blob)
    import struct

    bad[4096 + 44 : 4096 + 46] = struct.pack(">H", 5000)
    badf = tmp_path / "bad.mseed"
    badf.write_bytes(bytes(bad))
    d2, _, _ = native.mseed_read(str(badf))
    assert len(d2) == len(data) - per_rec
    np.testing.assert_array_equal(d2[:per_rec], data[:per_rec])
    np.testing.assert_array_equal(d2[per_rec:], data[2 * per_rec :])

    # dofs = 0 (inside the header): also skipped
    bad[4096 + 44 : 4096 + 46] = struct.pack(">H", 0)
    badf.write_bytes(bytes(bad))
    d3, _, _ = native.mseed_read(str(badf))
    assert len(d3) == len(data) - per_rec

    # python fallback also survives the truncated file
    dp, _, _ = ms.read_py(str(trunc))
    assert np.all(np.isfinite(dp))


def test_gfdb_reader_on_golden_foreign_file():
    """The HDF5 GFDB reader must parse files it did NOT write: a committed
    golden fixture hand-assembled to gfdb_io_hdf.f90:182-427's exact layout
    (tests/make_golden_gfdb.py documents every encoded layout fact)."""
    h5py = pytest.importorskip("h5py")  # noqa: F841
    import os as _os

    from kiwi_tpu.io.gfdb_hdf5 import load_gfdb
    from tests.make_golden_gfdb import dense_expected

    here = _os.path.dirname(_os.path.abspath(__file__))
    base = _os.path.join(here, "data", "golden_gfdb", "golden")
    assert _os.path.exists(base + ".index"), "golden fixture missing"

    store = load_gfdb(base)
    assert (store.nx, store.nz, store.ng) == (3, 2, 2)
    assert store.dt == np.float32(0.25)
    assert store.dx == np.float32(100.0)
    assert store.firstx == np.float32(400.0)

    expect = dense_expected()
    for (ix, iz, ig), (values, itmin) in expect.items():
        got = store.get_trace(ix, iz, ig)
        assert got is not None, (ix, iz, ig)
        gv, gi = got
        assert gi == itmin
        np.testing.assert_array_equal(gv, values)
    # missing slots stay empty
    assert store.get_trace(1, 0, 0) is None
    assert store.get_trace(0, 0, 1) is None
