"""Pure-numpy oracle implementations that literally follow the reference
dataflow (per-centroid, per-trace loops).  Slow, but transparent: device
kernels are validated against these."""

import numpy as np

from kiwi_tpu import geo
from kiwi_tpu.gf.trace import fnint, multiply_add_ref


def make_weights_np(azimuth, m):
    sa, ca = np.sin(azimuth), np.cos(azimuth)
    s2a, c2a = np.sin(2 * azimuth), np.cos(2 * azimuth)
    return np.array(
        [
            m[0] * ca**2 + m[1] * sa**2 + m[3] * s2a,
            m[4] * ca + m[5] * sa,
            m[2],
            0.5 * (m[1] - m[0]) * s2a + m[3] * c2a,
            m[5] * ca - m[4] * sa,
            m[0] * sa**2 + m[1] * ca**2 - m[3] * s2a,
        ]
    )


def synthesize_oracle(store, src_lat, src_lon, rec_lat, rec_lon, rec_depth,
                      centroids, out_it0, nt_out, interpolate=True):
    """ard[3, nt_out] for one receiver via the reference per-centroid loop.

    centroids: dict of arrays north, east, depth, time, m[C, 6].
    """
    azi0, bazi0 = (float(x) for x in geo.azibazi(src_lat, src_lon, rec_lat, rec_lon))
    dist0 = float(geo.distance_accurate50m(src_lat, src_lon, rec_lat, rec_lon))

    acc = np.zeros((3, nt_out), dtype=np.float64)
    c = centroids
    for i in range(c["north"].shape[0]):
        azi, bazi, dist = (
            float(x)
            for x in geo.approx_differential_azidist(
                float(c["north"][i]), float(c["east"][i]), azi0, bazi0, dist0
            )
        )
        f = make_weights_np(np.float32(azi), c["m"][i].astype(np.float64))
        x = np.float32(dist)
        z = np.float32(c["depth"][i] - rec_depth)
        if interpolate:
            ix1 = int(np.floor((x - store.firstx) / store.dx))
            iz1 = int(np.floor((z - store.firstz) / store.dz))
            dix = (x - store.firstx - ix1 * store.dx) / store.dx
            diz = (z - store.firstz - iz1 * store.dz) / store.dz
        else:
            ix1 = int(fnint((x - store.firstx) / store.dx))
            iz1 = int(fnint((z - store.firstz) / store.dz))
            dix = diz = 0.0
        rshift = np.float32(c["time"][i]) / np.float32(store.dt)

        lam = bazi - bazi0
        cl, sl = np.cos(lam), np.sin(lam)

        wsp = {
            (0, 0): (1 - dix) * (1 - diz),
            (0, 1): (1 - dix) * diz,
            (1, 0): dix * (1 - diz),
            (1, 1): dix * diz,
        }

        def add(channel, ig, weight):
            for (a, b), w in wsp.items():
                tr = store.get_trace(ix1 + a, iz1 + b, ig)
                if tr is None:
                    continue
                vals, itmin = tr
                multiply_add_ref(acc[channel], out_it0, vals, itmin,
                                 factor=weight * w, rshift=float(rshift))

        # horizontal: away/right with per-centroid bazi rotation
        u1 = np.zeros(nt_out)
        u2 = np.zeros(nt_out)
        for ig, fw in [(0, f[0]), (1, f[1]), (2, f[2])] + ([(8, f[5])] if store.ng == 10 else []):
            for (a, b), w in wsp.items():
                tr = store.get_trace(ix1 + a, iz1 + b, ig)
                if tr is None:
                    continue
                vals, itmin = tr
                multiply_add_ref(u1, out_it0, vals, itmin, factor=fw * w, rshift=float(rshift))
        for ig, fw in [(3, f[3]), (4, f[4])]:
            for (a, b), w in wsp.items():
                tr = store.get_trace(ix1 + a, iz1 + b, ig)
                if tr is None:
                    continue
                vals, itmin = tr
                multiply_add_ref(u2, out_it0, vals, itmin, factor=fw * w, rshift=float(rshift))
        acc[0] += cl * u1 - sl * u2
        acc[1] += cl * u2 + sl * u1

        # vertical
        for ig, fw in [(5, f[0]), (6, f[1]), (7, f[2])] + ([(9, f[5])] if store.ng == 10 else []):
            add(2, ig, fw)

    return acc, bazi0
