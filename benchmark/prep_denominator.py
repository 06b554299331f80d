"""Prep step for the measured Fortran-denominator benchmark.

Writes a self-contained binary blob (/tmp/kiwi_denominator.bin by default)
holding the benchdb GF store plus the kiwibench 'syntheseis' receiver
geometry and per-model source setup, so benchmark/fortran_denominator.cc
can replay the reference's scalar hot loop without any Python/JAX in the
timed path.

Workload = /root/reference/benchmark/kiwibench.py:94-150 ('syntheseis'):
10 receivers due north at 3000..4000 m, components 'ned', bilateral point
source (depth 5000 m, rise time 0.2 s -> 3 time-cell centroids),
floating_l1norm over shifts -1..1 s, 3610-strike sweep.

Layout (little-endian):
  int32   nx, nz, ng, ntmax, nrec, ncent, nshift
  float32 dt, dx, dz, firstx, firstz
  float64 azi[nrec], bazi[nrec], dist[nrec]      (host-exact geodesy)
  float32 cent_time[ncent], cent_w[ncent]        (STF time cells + weights)
  int32   itmin[nx*nz*ng], nsamples[nx*nz*ng]
  float32 data[nx*nz*ng*ntmax]
"""

import struct
import sys

import numpy as np


def main(out="/tmp/kiwi_denominator.bin", db="/tmp/kiwi_tpu_benchdb.npz"):
    sys.path.insert(0, "/root/repo")
    from kiwi_tpu import synth
    from kiwi_tpu.sources import get_source_model

    d = np.load(db)
    data = np.ascontiguousarray(d["data"], np.float32)
    itmin = np.ascontiguousarray(d["itmin"], np.int32)
    nsamp = np.ascontiguousarray(d["nsamples"], np.int32)
    nx, nz, ng, ntmax = data.shape

    # kiwibench receiver line: 10 receivers due north, 3000..4000 m
    olat, olon = np.radians(30.0), np.radians(70.0)
    dists = np.linspace(3000.0, 4000.0, 10)
    rlat = olat + dists / 6371000.0  # ne_to_latlon for pure-north offsets
    geom = synth.precompute_receiver_geometry(
        olat, olon, rlat, np.full(10, olon))

    # bilateral point source, rise time 0.2 -> 3 boxcar time cells
    model = get_source_model("bilateral")
    p = np.array([0, 0, 0, 5000, 1e12, 91, 87, 164, 0, 0, 0, 0, 2500, 0.2],
                 np.float32)
    shape = model.grid_shape(p, 0.1)
    tab = model.discretize(p, 0.1, shape)
    t = np.asarray(tab["time"]).reshape(-1)
    m = np.asarray(tab["m"]).reshape(-1, 6)
    w = np.abs(m).max(axis=1)
    w = w / w.sum()  # relative STF weights; C++ rebuilds m6 per strike
    ncent = t.shape[0]

    with open(out, "wb") as f:
        f.write(struct.pack("<7i", nx, nz, ng, ntmax, len(dists), ncent, 21))
        f.write(struct.pack("<5f", float(d["dt"]), float(d["dx"]),
                            float(d["dz"]), float(d["firstx"]),
                            float(d["firstz"])))
        f.write(np.asarray(geom.azi, "<f8").tobytes())
        f.write(np.asarray(geom.bazi, "<f8").tobytes())
        f.write(np.asarray(geom.dist, "<f8").tobytes())
        f.write(np.asarray(t, "<f4").tobytes())
        f.write(np.asarray(w, "<f4").tobytes())
        f.write(itmin.astype("<i4").tobytes())
        f.write(nsamp.astype("<i4").tobytes())
        f.write(data.astype("<f4").tobytes())
    print(f"wrote {out}: store {nx}x{nz}x{ng}x{ntmax}, "
          f"{len(dists)} receivers, {ncent} centroids")


if __name__ == "__main__":
    main(*sys.argv[1:])
