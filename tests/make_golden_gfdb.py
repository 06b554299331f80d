"""Hand-assemble a golden GFDB in the Fortran HDF5 layout.

Writes tests/data/golden_gfdb/golden.index + golden.<i>.chunk with RAW h5py
calls following gfdb_io_hdf.f90:182-427 directly -- deliberately NOT via
kiwi_tpu.io.gfdb_hdf5.save_gfdb, so the committed files pin real interop
with the reference layout independent of the repo's writer.

Layout facts encoded (with f90 line cites):
  * index file: f32 scalar datasets dt, dx, dz, firstx, firstz; i32 scalars
    nchunks, nx, nxc, nz, ng (:205-224)
  * chunk file `<base>.<i>.chunk` (1-based i): object-reference dataset
    "index" with Fortran dims (ng, nz, nxc) == h5py shape (nxc, nz, ng)
    (gfdb_io_create_chunk), traces at group /gf/<ixc>/<iz>/ dataset <ig>
    (1-based names, :344-365), packed strip data as NATIVE_REAL (:391),
    i32 attributes pofs/ofs = 1-based packed offsets / absolute start
    indices per strip (:370-385)

Trace content covers: single strip, two strips with an elided gap (> 5
zero samples, sparse_trace.f90:25), a missing slot (null reference), and a
second chunk.

Run: python tests/make_golden_gfdb.py
"""

import os

import numpy as np


def traces():
    """(ix, iz, ig) -> (packed, pofs, ofs) with known dense equivalents."""
    out = {}
    # single strip at itmin=3
    out[(0, 0, 0)] = (
        np.array([1.0, 2.0, 3.0, 2.0, 1.0], np.float32),
        np.array([1], np.int32),
        np.array([3], np.int32),
    )
    # two strips: [10..12] and [30..31] (gap of 17 elided)
    out[(0, 1, 1)] = (
        np.array([5.0, 6.0, 7.0, -1.0, -2.0], np.float32),
        np.array([1, 4], np.int32),
        np.array([10, 30], np.int32),
    )
    # trace in chunk 2 (ix=2 when nxc=2), negative itmin
    out[(2, 0, 0)] = (
        np.array([9.0, 8.0], np.float32),
        np.array([1], np.int32),
        np.array([-4], np.int32),
    )
    return out


def dense_expected():
    """The dense (values, itmin) each packed trace unpacks to."""
    return {
        (0, 0, 0): (np.array([1, 2, 3, 2, 1], np.float32), 3),
        (0, 1, 1): (
            np.concatenate([
                np.array([5, 6, 7], np.float32),
                np.zeros(17, np.float32),
                np.array([-1, -2], np.float32),
            ]),
            10,
        ),
        (2, 0, 0): (np.array([9, 8], np.float32), -4),
    }


def assemble(outdir):
    import h5py

    os.makedirs(outdir, exist_ok=True)
    base = os.path.join(outdir, "golden")
    nx, nxc, nz, ng, nchunks = 3, 2, 2, 2, 2

    with h5py.File(base + ".index", "w") as f:
        f.create_dataset("dt", data=np.float32(0.25))
        f.create_dataset("dx", data=np.float32(100.0))
        f.create_dataset("dz", data=np.float32(50.0))
        f.create_dataset("firstx", data=np.float32(400.0))
        f.create_dataset("firstz", data=np.float32(0.0))
        f.create_dataset("nchunks", data=np.int32(nchunks))
        f.create_dataset("nx", data=np.int32(nx))
        f.create_dataset("nxc", data=np.int32(nxc))
        f.create_dataset("nz", data=np.int32(nz))
        f.create_dataset("ng", data=np.int32(ng))

    trs = traces()
    for ichunk in range(nchunks):
        nxcthis = nxc if ichunk < nchunks - 1 else nx - nxc * (nchunks - 1)
        with h5py.File(f"{base}.{ichunk + 1}.chunk", "w") as f:
            index = f.create_dataset(
                "index", shape=(nxcthis, nz, ng), dtype=h5py.ref_dtype
            )
            for (ix, iz, ig), (packed, pofs, ofs) in trs.items():
                if ix // nxc != ichunk:
                    continue
                ixc = ix - ichunk * nxc
                g = f.require_group(f"/gf/{ixc + 1}/{iz + 1}")
                ds = g.create_dataset(str(ig + 1), data=packed.astype("<f4"))
                ds.attrs.create("pofs", pofs.astype(np.int32))
                ds.attrs.create("ofs", ofs.astype(np.int32))
                index[ixc, iz, ig] = ds.ref
    return base


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    base = assemble(os.path.join(here, "data", "golden_gfdb"))
    print(f"assembled {base}.index + chunks")
