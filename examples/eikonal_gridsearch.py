#!/usr/bin/env python
"""Finite eikonal rupture grid search on the device fast-sweeping path.

The eikonal source (source_eikonal.f90) is the reference's most expensive
model: every candidate solves an eikonal equation over a fine rupture
grid.  Here the whole pipeline -- rupture-front solve (anti-diagonal
fast sweeping), fine->coarse moment discretization, synthesis, misfit --
runs batched on the TPU; the reference's serial host pipeline manages
~2 models/s, this search sustains hundreds.

1. builds (or reuses) the analytic benchmark GF database,
2. synthesizes "observed" seismograms from a known eikonal rupture,
3. grid-searches border radius x relative rupture velocity,
4. writes the misfit surface + rupture-front figure + an HTML report.

usage: python examples/eikonal_gridsearch.py [workdir]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kiwi_eik_demo"
    os.makedirs(workdir, exist_ok=True)

    from kiwi_tpu import geo, plotting
    from kiwi_tpu.engine import Engine, Receiver
    from kiwi_tpu.gf.store import GFStore

    cache = os.environ.get("KIWI_BENCHDB", "/tmp/kiwi_tpu_benchdb.npz")
    if os.path.exists(cache):
        store = GFStore.load(cache)
    else:
        from kiwi_tpu.gf import elseis

        print("building benchmark GF database (one-time, ~2 min)...")
        stf = np.r_[0, 0, 0, 0, 0, 0, np.linspace(0.1, 1.0, 10), 1, 1, 1, 1]
        store = elseis.build_ahfull_store(
            nx=200, nz=200, dt=0.1, dx=50.0, dz=50.0, firstx=50.0, firstz=0.0,
            material=(2300.0, 3200.0, 1600.0), stf=stf)
        store.save(cache)

    olat, olon = 30.0, 70.0
    eng = Engine(store)
    recs = []
    for i, d in enumerate(np.linspace(3000.0, 4200.0, 10)):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon),
                                  d * np.cos(0.6 * i), d * np.sin(0.6 * i))
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_misfit_method("l2norm")
    eng.set_floating_shiftrange(0.0, 0.0)
    # rupture plane box: keep the fault inside the GF store's depth span
    eng.set_source_constraints(
        [[0, 0, 50.0], [0, 0, 700.0]], [[0, 0, -1.0], [0, 0, 1.0]]
    )

    # the "true" rupture: radius 250 m, 0.9 of the local shear speed
    # params: time, north, east, depth, moment, strike, dip, slip-rake,
    #         bord-shift-x, bord-shift-y, bord-radius, nukl-shift-x,
    #         nukl-shift-y, rel-rupture-velocity, rise-time
    true_radius, true_relv = 250.0, 0.9
    p_true = np.array(
        [0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
         0.0, 0.0, true_radius, 50.0, -50.0, true_relv, 0.3],
        dtype=np.float32,
    )
    eng.set_source_params("eikonal", p_true)
    eng.set_synthetic_reference()

    radii = np.linspace(150.0, 350.0, 16).astype(np.float32)
    relvs = np.linspace(0.6, 1.1, 12).astype(np.float32)
    RR, VV = np.meshgrid(radii, relvs, indexing="ij")
    batch = np.tile(p_true, (RR.size, 1))
    batch[:, 10] = RR.ravel()
    batch[:, 13] = VV.ravel()

    print(f"grid searching {RR.size} eikonal ruptures "
          f"(radius x rel. rupture velocity)...")
    t0 = time.time()
    g = np.asarray(eng.global_misfits_for_source_batch(batch))
    dt = time.time() - t0
    print(f"  {RR.size / dt:.0f} models/s ({dt:.1f} s total, first call "
          "includes compilation)")
    t0 = time.time()
    g = np.asarray(eng.global_misfits_for_source_batch(batch))
    print(f"  warm: {RR.size / (time.time() - t0):.0f} models/s")

    gg = g.reshape(RR.shape)
    ib = np.unravel_index(np.argmin(gg), gg.shape)
    best_r, best_v = float(radii[ib[0]]), float(relvs[ib[1]])
    print(f"best: radius {best_r:.0f} m (true {true_radius:.0f}), "
          f"rel_vrup {best_v:.2f} (true {true_relv:.2f})")
    assert abs(best_r - true_radius) <= (radii[1] - radii[0]) + 1e-3
    assert abs(best_v - true_relv) <= (relvs[1] - relvs[0]) + 1e-3

    # figures + report
    mpl = plotting._mpl()
    fig, ax = mpl.subplots(figsize=(6, 4.5))
    pc = ax.pcolormesh(radii, relvs, gg.T, shading="nearest", cmap="viridis")
    ax.plot([true_radius], [true_relv], "w*", ms=14, mec="k", label="true")
    ax.plot([best_r], [best_v], "r+", ms=12, mew=2, label="best")
    ax.set_xlabel("border radius [m]")
    ax.set_ylabel("relative rupture velocity")
    ax.legend(loc="upper right")
    fig.colorbar(pc, ax=ax, label="global misfit")
    surf = os.path.join(workdir, "misfit_surface.png")
    fig.savefig(surf, dpi=110, bbox_inches="tight")
    mpl.close(fig)

    eng.set_source_params("eikonal", p_true)
    front = plotting.plot_rupture_front(
        eng, os.path.join(workdir, "rupture_front.png"))
    comp = plotting.plot_seismogram_comparison(
        eng, os.path.join(workdir, "waveforms.png"))
    plotting.html_report(
        os.path.join(workdir, "report.html"),
        "Eikonal rupture grid search",
        [("misfit surface (radius x rupture velocity)", "", [surf]),
         ("rupture front (true model)", "", [front]),
         ("waveform fit", "", [comp])],
    )
    print(f"report: {workdir}/report.html")


if __name__ == "__main__":
    main()
