#!/usr/bin/env python
"""End-to-end synthetic inversion demo (the role of the reference's
examples/ + kiwi_main work/report runs).

1. builds (or reuses) the analytic benchmark GF database,
2. synthesizes "observed" seismograms from a known bilateral finite fault,
3. grid-searches strike x depth with bootstrap confidence intervals,
4. refines with Levenberg-Marquardt,
5. writes waveform/misfit/map figures + an HTML report.

usage: python examples/synthetic_inversion.py [workdir]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kiwi_demo"
    os.makedirs(workdir, exist_ok=True)

    from kiwi_tpu import geo, plotting
    from kiwi_tpu.engine import Engine, Receiver
    from kiwi_tpu.gf.store import GFStore
    from kiwi_tpu.invert import MisfitGrid, Source, minimize_lm

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
    for i, d in enumerate(np.linspace(3000.0, 4200.0, 12)):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon),
                                  d * np.cos(0.5 * i), d * np.sin(0.5 * i))
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.5, 0.5)

    # the "true" earthquake: bilateral rupture, strike 91, depth 5 km
    true_params = np.array(
        [0.0, 0.0, 0.0, 5000.0, 3e15, 91.0, 87.0, 164.0, 0.0,
         900.0, 700.0, 1000.0, 2500.0, 0.3], np.float32)
    eng.set_source_params("bilateral", true_params)
    eng.set_synthetic_reference()
    print(f"observed data synthesized from strike=91, depth=5000 m "
          f"({len(recs)} receivers x ned)")

    # grid search with bootstrap
    start = np.array(true_params)
    start[5] = 0.0  # forget the strike
    start[3] = 4000.0  # and the depth
    grid = MisfitGrid(Source("bilateral", start), [
        ("strike", np.arange(0.0, 360.0, 2.0)),
        ("depth", np.arange(4000.0, 6500.0, 250.0)),
    ])
    t0 = time.time()
    grid.compute(eng)
    best, misfits, stats = grid.postprocess(bootstrap_iterations=400)
    n_models = misfits.size
    dt_grid = time.time() - t0
    print(f"grid search: {n_models} models in {dt_grid:.1f} s "
          f"({n_models / dt_grid:.0f} models/s)")
    for name in ("strike", "depth"):
        s = stats[name]
        print(f"  {name:8s} best {s.best:8.1f}  mean {s.mean:8.1f} "
              f"[16%% {s.percentile16:8.1f} / 84%% {s.percentile84:8.1f}]")

    # autodiff refinement first (no reference counterpart): exact
    # gradients through the forward, several starts descend as one
    # batched device program per step
    from kiwi_tpu.invert import minimize_gradient

    eng.set_source_params("bilateral", np.asarray(best.params, np.float32))
    mask = np.zeros(14, bool)
    mask[[3, 4, 5]] = True  # depth, moment, strike
    t0 = time.time()
    ggm, gsteps, _ = minimize_gradient(eng, mask=mask, steps=60, lr=0.02,
                                       nstarts=4, spread=0.05, seed=0)
    gfinal = eng.source_params
    print(f"gradient: {gsteps} steps x 4 starts in {time.time() - t0:.1f} s "
          f"-> strike {gfinal[5]:.2f}, depth {gfinal[3]:.0f}, "
          f"global misfit {ggm:.2e}")

    # LM polish from the gradient best (the reference's refinement path)
    info, nfev, gm = minimize_lm(eng, mask=mask)
    final = eng.source_params
    print(f"LM: info={info} nfev={nfev} -> strike {final[5]:.2f} (true 91), "
          f"depth {final[3]:.0f} (true 5000), global misfit {gm:.2e}")

    # figures + report
    p1 = plotting.plot_seismogram_comparison(eng, os.path.join(workdir, "seis.png"))
    p2 = plotting.plot_station_map(eng, os.path.join(workdir, "map.png"))
    p3 = plotting.plot_misfit_cross_section(grid, os.path.join(workdir, "misfit.png"))
    p4 = plotting.plot_beachball(plotting.source_m6(eng),
                                 os.path.join(workdir, "beachball.png"),
                                 title="recovered mechanism")
    p5 = plotting.plot_misfogram(eng, os.path.join(workdir, "misfogram.png"),
                                 tmin=-5.0, tmax=5.0, nt=21)
    p6 = plotting.plot_spectra_comparison(eng, os.path.join(workdir, "spectra.png"))
    rep = plotting.html_report(
        os.path.join(workdir, "report.html"), "synthetic inversion demo",
        [("fit", f"strike {final[5]:.2f}, depth {final[3]:.0f} m, "
                 f"global misfit {gm:.2e}", [p1]),
         ("mechanism", "", [p4]),
         ("misfogram", "", [p5]),
         ("spectra", "", [p6]),
         ("geometry", "", [p2]),
         ("misfit surface", "", [p3])])
    print(f"report: {rep}")

    assert abs(((final[5] - 91 + 180) % 360) - 180) < 2.0 or \
        abs(((final[5] - 271 + 180) % 360) - 180) < 2.0, "strike not recovered"
    print("OK: source recovered")


if __name__ == "__main__":
    main()
