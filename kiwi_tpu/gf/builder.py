"""GF store builder framework for external modeling codes.

Counterpart of tunguska's qseis.py/poel.py GFDBBuilder machinery: partition
the (distance x depth) grid into blocks, run a user-supplied modeling
backend per block in parallel worker processes, and insert the resulting
elementary traces into a store.  The reference farms external Fortran codes
(QSEIS for layered-earth GFs, POEL for poroelasticity) this way
(qseis.py:500-713); any callable backend with the same contract plugs in
here -- including the built-in analytic fullspace backend used for tests and
benchmarks.
"""

from __future__ import annotations

import concurrent.futures as _fut

import numpy as np

from .store import GFStore, GFStoreBuilder


class GFDBBuilder:
    """Parallel block-wise GF store construction.

    backend(x, z, config) -> [(ig, values f32[n], itmin int)] produces the
    elementary traces for one (distance, depth) node.
    """

    def __init__(self, backend, nx, nz, ng, dt, dx, dz, firstx=0.0, firstz=0.0,
                 config=None, nworkers=None, block_nx=32):
        self.backend = backend
        self.builder = GFStoreBuilder(nx, nz, ng, dt, dx, dz, firstx, firstz)
        self.config = config
        self.nworkers = nworkers
        self.block_nx = block_nx

    def _block(self, ixs):
        out = []
        b = self.builder
        for ix in ixs:
            x = b.firstx + ix * b.dx
            for iz in range(b.nz):
                z = b.firstz + iz * b.dz
                for (ig, values, itmin) in self.backend(x, z, self.config):
                    out.append((ix, iz, ig, np.asarray(values, np.float32), int(itmin)))
        return out

    def build(self, progress=None) -> GFStore:
        blocks = [
            list(range(i, min(i + self.block_nx, self.builder.nx)))
            for i in range(0, self.builder.nx, self.block_nx)
        ]
        if self.nworkers in (None, 0, 1):
            results = map(self._block, blocks)
            for i, traces in enumerate(results):
                for (ix, iz, ig, v, it0) in traces:
                    self.builder.put_trace(ix, iz, ig, v, it0)
                if progress:
                    progress(i + 1, len(blocks))
        else:
            # process pool: the forkmap/nworkers equivalent (qseis.py:17-18)
            with _fut.ProcessPoolExecutor(max_workers=self.nworkers) as ex:
                for i, traces in enumerate(ex.map(self._block, blocks)):
                    for (ix, iz, ig, v, it0) in traces:
                        self.builder.put_trace(ix, iz, ig, v, it0)
                    if progress:
                        progress(i + 1, len(blocks))
        return self.builder.build()


def ahfull_backend(material, stf, dt, nfflag=True, ffflag=True):
    """Analytic fullspace backend (the gfdb_build_ahfull recipe) for
    GFDBBuilder."""
    from .elseis import FullspaceGF, add_ahfull_traces

    fs = FullspaceGF(material[0], material[1], material[2], stf, dt)

    def backend(x, z, _config):
        tmp = GFStoreBuilder(1, 1, 10, dt, 1.0, 1.0, x, z)
        add_ahfull_traces(tmp, fs, x, z, nfflag, ffflag)
        out = []
        for ig in range(10):
            tr = tmp._traces.get((0, 0, ig))
            if tr is not None:
                out.append((ig, tr[0], tr[1]))
        return out

    return backend
