"""Prep step for the measured Fortran-denominator benchmark + golden oracle.

Writes the v2 self-contained binary blob that benchmark/fortran_denominator.cc
consumes, so the C++ transliteration of the reference's scalar hot loop can
replay a workload without any Python/JAX in the timed path, and (in --dump
mode) emit golden traces/misfits for tests/test_golden_oracle.py.

Workloads (CLI):
  point    kiwibench 'syntheseis' (kiwibench.py:94-150): 10 receivers due
           north at 3000..4000 m, bilateral POINT source (depth 5000 m,
           rise 0.2 s), floating_l1norm over +-1 s, 3610-strike sweep.
  finite   same receivers/misfit, the bench.py finite regime: 20x10-km-class
           bilateral (lengths 900/700 m, width 1000 m at the benchdb's
           scale), 195 centroids -- the regime real inversions live in.
  eikonal  table replay: the bench.py eikonal rupture discretized ONCE by
           the host FMM pipeline and dumped; the C++ replays synthesis +
           misfit per model.  GENEROUS to the reference: its per-model
           eikonal solve + downsampling are not charged.

Blob v2 layout (little-endian):
  uint32  magic 'KWI2' (0x4B574932)
  int32   nx, nz, ng, ntmax, nrec, nshift
  float32 dt, dx, dz, firstx, firstz
  float64 azi[nrec], bazi[nrec], dist[nrec]      (host-exact geodesy)
  int32   ntapers; then per taper: int32 irc, float32 x[4], y[4]
  int32   workload (0 = bilateral sweep, 1 = table replay)
  if 0:   float64 edt; float32 ref_params[14]; int32 nsweep; int32 ndump;
          float32 dump_params[ndump][14]
  if 1:   float64 edt; int32 ncent; float32 north/east/depth/time[ncent];
          float32 m6[ncent*6]
  int32   itmin[nx*nz*ng], nsamples[nx*nz*ng]
  float32 data[nx*nz*ng*ntmax]
"""

import struct
import sys

import numpy as np


def write_blob(out, store, geom, *, nshift=21, tapers=(), filters=(),
               workload=None):
    """store: kiwi_tpu.gf.store.GFStore (or any object with dt/dx/dz/
    firstx/firstz/data/itmin/nsamples); geom: (azi, bazi, dist) f64 arrays;
    tapers: [(irc, x4, y4)]; filters: [(irc, x4, y4)] spectral PLF filters
    (frequency coordinates); workload: dict, kind='bilat' with
    ref_params/nsweep/dump_params or kind='table' with north/east/depth/
    time/m6 arrays.  edt in both."""
    data = np.ascontiguousarray(store.data, np.float32)
    itmin = np.ascontiguousarray(store.itmin, np.int32)
    nsamp = np.ascontiguousarray(store.nsamples, np.int32)
    nx, nz, ng, ntmax = data.shape
    azi, bazi, dist = geom
    nrec = len(azi)

    with open(out, "wb") as f:
        f.write(struct.pack("<I", 0x4B574933))
        f.write(struct.pack("<6i", nx, nz, ng, ntmax, nrec, nshift))
        f.write(struct.pack("<5f", float(store.dt), float(store.dx),
                            float(store.dz), float(store.firstx),
                            float(store.firstz)))
        f.write(np.asarray(azi, "<f8").tobytes())
        f.write(np.asarray(bazi, "<f8").tobytes())
        f.write(np.asarray(dist, "<f8").tobytes())
        f.write(struct.pack("<i", len(tapers)))
        for irc, x4, y4 in tapers:
            f.write(struct.pack("<i", int(irc)))
            f.write(np.asarray(x4, "<f4").tobytes())
            f.write(np.asarray(y4, "<f4").tobytes())
        f.write(struct.pack("<i", len(filters)))
        for irc, x4, y4 in filters:
            f.write(struct.pack("<i", int(irc)))
            f.write(np.asarray(x4, "<f4").tobytes())
            f.write(np.asarray(y4, "<f4").tobytes())
        if workload["kind"] == "eikonal":
            # workload 2: self-contained eikonal rupture models (model 0 =
            # reference); the C++ rebuilds each centroid table itself (FMM
            # + downsample + time cells)
            f.write(struct.pack("<i", 2))
            f.write(struct.pack("<d", float(workload["edt"])))
            models = workload["models"]
            f.write(struct.pack("<i", len(models)))
            for m in models:
                sp = np.asarray(m["speed"], np.float32)
                ins = np.asarray(m["inside"], np.uint8)
                ncx, ncy = m["coarse"]
                f.write(struct.pack("<4i", sp.shape[0], sp.shape[1],
                                    int(ncx), int(ncy)))
                f.write(struct.pack(
                    "<8d", float(m["delta"][0]), float(m["delta"][1]),
                    float(m["first"][0]), float(m["first"][1]),
                    float(m["nukl"][0]), float(m["nukl"][1]),
                    float(m["cdelta"][0]), float(m["cdelta"][1])))
                f.write(np.asarray(m["rotmat"], "<f8").reshape(-1).tobytes())
                f.write(np.asarray(m["center"], "<f8").tobytes())
                f.write(np.asarray(m["m6"], "<f4").tobytes())
                f.write(struct.pack("<f", float(m["time0"])))
                f.write(sp.astype("<f4").tobytes())
                f.write(ins.tobytes())
        elif workload["kind"] == "bilat":
            f.write(struct.pack("<i", 0))
            f.write(struct.pack("<d", float(workload["edt"])))
            f.write(np.asarray(workload["ref_params"], "<f4").tobytes())
            dumps = workload.get("dump_params", [])
            f.write(struct.pack("<2i", int(workload.get("nsweep", 0)),
                                len(dumps)))
            for p in dumps:
                f.write(np.asarray(p, "<f4").tobytes())
        else:
            f.write(struct.pack("<i", 1))
            f.write(struct.pack("<d", float(workload["edt"])))
            c = len(workload["time"])
            f.write(struct.pack("<i", c))
            for k in ("north", "east", "depth", "time"):
                f.write(np.asarray(workload[k], "<f4").tobytes())
            f.write(np.ascontiguousarray(workload["m6"], "<f4").tobytes())
            solve = workload.get("solve") or {}
            if solve:
                sp = np.asarray(solve["speed"], np.float32)
                ins = np.asarray(solve["inside"], np.uint8)
                ncx, ncy = solve["coarse"]
                f.write(struct.pack("<i", 1))
                f.write(struct.pack("<4i", sp.shape[0], sp.shape[1],
                                    int(ncx), int(ncy)))
                f.write(struct.pack("<6d", float(solve["delta"][0]),
                                    float(solve["delta"][1]),
                                    float(solve["first"][0]),
                                    float(solve["first"][1]),
                                    float(solve["nukl"][0]),
                                    float(solve["nukl"][1])))
                f.write(sp.astype("<f4").tobytes())
                f.write(ins.tobytes())
            else:
                f.write(struct.pack("<i", 0))
        f.write(itmin.astype("<i4").tobytes())
        f.write(nsamp.astype("<i4").tobytes())
        f.write(data.astype("<f4").tobytes())


def kiwibench_geometry():
    """The kiwibench receiver line: 10 receivers due north, 3000..4000 m."""
    sys.path.insert(0, "/root/repo")
    from kiwi_tpu import synth

    olat, olon = np.radians(30.0), np.radians(70.0)
    dists = np.linspace(3000.0, 4000.0, 10)
    rlat = olat + dists / 6371000.0  # ne_to_latlon for pure-north offsets
    geom = synth.precompute_receiver_geometry(
        olat, olon, rlat, np.full(10, olon))
    return np.asarray(geom.azi), np.asarray(geom.bazi), np.asarray(geom.dist)


POINT = np.array([0, 0, 0, 5000, 1e12, 91, 87, 164, 0, 0, 0, 0, 2500, 0.2],
                 np.float32)
FINITE = np.array([0, 0, 0, 5000, 1e12, 91, 87, 164, 0, 900, 700, 1000,
                   2500, 0.2], np.float32)  # bench.py finite regime
EIK = np.array([0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
                0.0, 0.0, 250.0, 50.0, -50.0, 0.9, 0.3], np.float32)


class _NpzStore:
    def __init__(self, db):
        d = np.load(db)
        self.data = d["data"]
        self.itmin = d["itmin"]
        self.nsamples = d["nsamples"]
        self.dt, self.dx, self.dz = (float(d["dt"]), float(d["dx"]),
                                     float(d["dz"]))
        self.firstx, self.firstz = float(d["firstx"]), float(d["firstz"])


def eikonal_table(db):
    """Discretize the bench.py eikonal rupture once (host FMM pipeline) and
    return the active-centroid table with moment baked into m6."""
    sys.path.insert(0, "/root/repo")
    from kiwi_tpu.engine import Engine
    from kiwi_tpu.gf.store import GFStore
    from kiwi_tpu.sources import get_source_model

    from kiwi_tpu.sources import eikonal as eiksrc

    store = GFStore.load(db)
    eng = Engine(store)
    eng.set_source_location(30.0, 70.0, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_source_constraints(
        [[0, 0, 50.0], [0, 0, 700.0]], [[0, 0, -1.0], [0, 0, 1.0]])
    get_source_model("eikonal")  # ensure registration
    p = EIK.copy()
    p[14] = 0.0  # rise time 0: the C++ replay does no STF post-fold
    pd, m6u, rot = eiksrc._eik_named(p)
    solve = {}
    tab = eiksrc.discretize_eikonal_host(
        pd, 0.1, eng.eikonal_context(), m6u, rot, solve_dump=solve)
    act = np.asarray(tab["active"], bool)
    m6 = np.asarray(tab["m"], np.float32)[act] * float(p[4])
    return {
        "kind": "table", "edt": 0.1,
        "north": np.asarray(tab["north"], np.float32)[act],
        "east": np.asarray(tab["east"], np.float32)[act],
        "depth": np.asarray(tab["depth"], np.float32)[act],
        "time": np.asarray(tab["time"], np.float32)[act],
        "m6": m6,
        "solve": solve,  # per-model FMM problem for the C++ replay
    }


def main(which="point", out=None, db="/tmp/kiwi_tpu_benchdb.npz"):
    out = out or f"/tmp/kiwi_denominator_{which}.bin"
    store = _NpzStore(db)
    geom = kiwibench_geometry()
    if which == "point":
        wl = {"kind": "bilat", "edt": 0.1, "ref_params": POINT,
              "nsweep": 3610, "dump_params": []}
    elif which == "finite":
        wl = {"kind": "bilat", "edt": 0.1, "ref_params": FINITE,
              "nsweep": 360, "dump_params": []}
    elif which == "eikonal":
        wl = eikonal_table(db)
    else:
        raise SystemExit(f"unknown workload {which!r}")
    write_blob(out, store, geom, nshift=21, workload=wl)
    ncent = (len(wl["time"]) if wl["kind"] == "table"
             else "per-model (in-C++ discretizer)")
    print(f"wrote {out}: store {store.data.shape}, 10 receivers, "
          f"centroids: {ncent}")


if __name__ == "__main__":
    main(*sys.argv[1:])
