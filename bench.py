#!/usr/bin/env python
"""Benchmark: kiwibench regimes on TPU (point sweep, finite source, eikonal).

Reproduces benchmark/kiwibench.py of the reference: build the analytic
200x200x10 fullspace GF database ('makedb', dt=0.1s, dx=dz=50m), then
evaluate source models over 10 receivers x 3 components with
floating_l1norm misfits and bilinear GF interpolation, reporting MPS
(source models evaluated per second) per regime:

* point:   3610-strike sweep of a point bilateral source (the reference
           kiwibench 'syntheseis' configuration, its headline number)
* finite:  strike sweep of a 195-centroid bilateral finite fault (the
           regime real inversions live in; BASELINE.json's configs)
* eikonal: radius sweep of finite eikonal ruptures (device fast sweeping)

Throughput is steady-state: batches are dispatched asynchronously and
fetched one behind, so the axon tunnel's ~25 ms round-trip latency
overlaps device compute instead of being measured as if it were compute.

Prints ONE json line with the point-sweep MPS as the headline metric plus
finite/eikonal MPS and an HBM-bandwidth-utilization estimate for the
finite kernel.

vs_baseline divides by the MEASURED Fortran single-core hot-loop
throughput (benchmark/fortran_denominator.cc: a C++ transliteration of
seismogram.f90 + sparse_trace.f90 + receiver.f90's floating-l1 loop on
the real benchdb store, compiled -O3 -march=native -- a GENEROUS upper
bound on the reference binary, with none of its pipe-pool IPC, text
protocol, OMP criticals or allocation churn).  Measured 2026-08-17 on
this host's Xeon @ 2.10 GHz: 15.4k models/s/core on the kiwibench
syntheseis config.  The north star (BASELINE.json) is >=100x Fortran
single-core on one chip.
"""

import json
import os
import sys
import time

import numpy as np

# benchmark/fortran_denominator.cc on the kiwibench syntheseis config;
# see BASELINE.md for provenance and what the bound omits.  Re-measured
# 2026-08-19 with the v2 oracle (in-C++ bilateral discretizer, probe edge
# extension): 15.3-15.7k/core -- the recorded constant stands.
MEASURED_FORTRAN_CORE_MPS = 15400.0
# per-regime denominators (same host/flags, 2026-08-19):
# finite = the bench_finite 195-centroid bilateral replayed by the same
# C++ loop (prep_denominator.py finite); eikonal = the bench_eikonal
# rupture table replay INCLUDING a per-model FMM solve + downsample
# accumulation (the reference pays both per model)
MEASURED_FORTRAN_FINITE_MPS = 413.0
MEASURED_FORTRAN_EIKONAL_MPS = 327.0
V5E_HBM_GBPS = 819.0
V5E_VPU_GFLOPS = 3930.0  # 4 ALUs x 8x128 lanes x 0.94 GHz, f32

CACHE = os.environ.get("KIWI_BENCHDB", "/tmp/kiwi_tpu_benchdb.npz")

KIWIBENCH_STF = np.array(
    [0, 0, 0, 0, 0, 0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1, 1, 1, 1, 1],
    dtype=np.float64,
)  # benchmark/kiwibench.py:50-70


def get_store(log):
    """Benchmark store + makedb_seconds (the kiwibench 'makedb' metric,
    benchmark/kiwibench.py:45-92: build the 200x200x10 analytic fullspace
    DB and persist it).  The build is timed FRESH every run -- BASELINE.md
    row 2 tracks it -- unless KIWI_BENCH_MAKEDB=0 and a cache exists
    (local iteration)."""
    from kiwi_tpu.gf.store import GFStore

    if os.environ.get("KIWI_BENCH_MAKEDB") == "0" and os.path.exists(CACHE):
        log(f"loading cached benchdb from {CACHE}")
        return GFStore.load(CACHE), 0.0
    from kiwi_tpu.gf import elseis

    log("building benchdb (200x200x10 analytic fullspace, near+far field)...")
    t0 = time.time()
    store = elseis.build_ahfull_store(
        nx=200, nz=200, dt=0.1, dx=50.0, dz=50.0, firstx=50.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=KIWIBENCH_STF,
        progress=lambda i, n: log(f"  distance row {i}/{n}") if i % 50 == 0 else None,
    )
    try:
        store.save(CACHE)
    except OSError:
        pass
    makedb_seconds = time.time() - t0
    log(f"  makedb (build + persist): {makedb_seconds:.1f}s")
    return store, makedb_seconds


def make_engine(store):
    from kiwi_tpu import geo
    from kiwi_tpu.engine import Engine, Receiver

    olat, olon = 30.0, 70.0
    eng = Engine(store)
    recs = []
    for d in np.linspace(3000.0, 4000.0, 10):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), float(d), 0.0)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    return eng


def steady_state_mps(dispatch, batches, log, label, trials=3):
    """Pipelined throughput: dispatch all batches (async), fence at the
    end; tunnel latency overlaps device compute.  min over trials rides
    out the tunnel's random multi-second stalls.

    The fence is a SCALAR FETCH from the last dispatch's output, not
    block_until_ready: the device executes dispatches in FIFO order, so
    the fetch proves every dispatch completed, while block_until_ready
    through the axon tunnel both acks early on occasion (reads too fast)
    and pays extra fixed round trips (measured +0.55 ms/dispatch at 16
    in-flight sweeps -- it turned a 1.90 ms steady state into 2.45 ms)."""
    import jax
    import jax.numpy as jnp

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    # warmup/compile
    t0 = time.time()
    fence(dispatch(batches[0]))
    log(f"  {label}: compile+first batch {time.time() - t0:.1f}s")
    best = np.inf
    n_models = sum(len(b) for b in batches)
    for _ in range(trials):
        t0 = time.time()
        outs = [dispatch(b) for b in batches]
        fence(outs[-1])
        best = min(best, time.time() - t0)
    return n_models / best, outs


def bench_point(eng, log):
    """kiwibench syntheseis: 3610-strike point-bilateral sweep."""
    import jax
    import jax.numpy as jnp

    base = np.array(
        [0, 0, 0, 5000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0, 2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", base)
    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(-1.0, 1.0)
    eng.set_misfit_method("floating_l1norm")

    nstrikes = 3610
    strikes = np.linspace(0.0, 360.0, nstrikes).astype(np.float32)

    def dispatch(sl):
        # fused on-device sweep: the batch is tiled inside the jit, the
        # global-misfit reduction rides the same program, and the host
        # ships/receives one float per model per dispatch (round 4: the
        # old host-built batch path issued slower than the device
        # computed; measured 410k -> 1.0M+ MPS on the same chip/day).
        # The jit specializes to len(sl) -- every row dispatched is a row
        # counted (the old path padded to a 4096-row compiled shape,
        # donating 12%)
        return eng.sweep_global_misfits(base, 5, sl)

    # 16 sweep replicas in flight, 4 replicas PER dispatch: sustained
    # grid searches dispatch many sweeps, and each dispatch carries a
    # fixed ~0.6-1.6 ms of host issue + tunnel cost against a ~2 ms
    # device program at n=3610, so packing 4 sweeps into one 14440-row
    # program amortizes the fixed cost 4x (measured on the v5e: K=1
    # 1.30M, K=2 1.63M, K=4 1.66M, K=8 1.49M MPS -- K=8's program
    # overruns the fused kernel's VMEM-friendly tile set)
    pack = int(os.environ.get("KIWI_BENCH_SWEEP_PACK", "4"))
    batches = [np.concatenate([strikes] * pack)] * max(16 // pack, 2)
    mps, outs = steady_state_mps(dispatch, batches, log, "point")
    g = np.asarray(outs[0])[:nstrikes]
    best = float(strikes[int(np.argmin(g))])
    log(f"  point sweep: best strike {best:.1f} (true 91.0), MPS {mps:.0f}")
    assert abs(best - 91.0) < 1.0

    # TPU-gated value assertion: the fused sweep (transposed fused kernel)
    # vs the per-source XLA forward with the scan kernels DISABLED -- the
    # strongest on-hardware oracle.  Guards both the f32-exactness of the
    # shared contractions (an unpinned einsum routes f32 through one bf16
    # MXU pass: measured 2.7e-3 rel err) and the Mosaic lowering of the
    # fused kernel (pytest only runs it in interpret mode on CPU)
    err = _sweep_vs_xla_err(eng, base, strikes)
    log(f"  sweep-vs-XLA parity: rel err {err:.2e}")
    assert err < 1e-5, (
        f"fused sweep disagrees with the per-source XLA forward on TPU: "
        f"{err:.3e} (tolerance 1e-5)")
    return mps


def _sweep_vs_xla_err(eng, base, strikes):
    """max rel err of the fused sweep against the per-source XLA eval
    (KIWI_FLOAT_SCAN=0, KIWI_FUSED_SCAN=0) on the first 16 strikes."""
    g_s = np.asarray(eng.sweep_global_misfits(base, 5, strikes[:16]))
    pb = np.tile(base, (16, 1))
    pb[:, 5] = strikes[:16]
    os.environ["KIWI_FLOAT_SCAN"] = "0"
    os.environ["KIWI_FUSED_SCAN"] = "0"
    try:
        eng._invalidate()
        g_b = np.asarray(eng.global_misfits_for_source_batch(pb))
    finally:
        os.environ.pop("KIWI_FLOAT_SCAN", None)
        os.environ.pop("KIWI_FUSED_SCAN", None)
        eng._invalidate()
    return float(np.abs(g_s - g_b).max()) / max(float(np.abs(g_b).max()), 1e-30)


def bench_point_filtered(eng, log):
    """The realistic inversion shape: band-pass filtered floating_l1norm
    point sweep (every standard tunguska Step sets spectral filters --
    reference python/tunguska/inversion.py).  Round 4 dropped this
    configuration to the vmapped XLA path (a measured 2.4-16x cliff); the
    fused kernel's in-kernel span masks now cover it.  Reported as its own
    metric so the configuration users actually run is a tracked number."""
    import jax

    base = np.array(
        [0, 0, 0, 5000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0, 2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_misfit_filter(None, [0.0, 0.2, 3.0, 4.0], [0.0, 1.0, 1.0, 0.0])
    try:
        eng.set_source_params("bilateral", base)
        eng.set_synthetic_reference()
        eng.set_floating_shiftrange(-1.0, 1.0)
        eng.set_misfit_method("floating_l1norm")

        nstrikes = 3610
        strikes = np.linspace(0.0, 360.0, nstrikes).astype(np.float32)

        def dispatch(sl):
            return eng.sweep_global_misfits(base, 5, sl)

        batches = [strikes] * 16
        mps, outs = steady_state_mps(dispatch, batches, log, "point_filtered")
        g = np.concatenate([np.asarray(o) for o in outs])[:nstrikes]
        best = float(strikes[int(np.argmin(g))])
        log(f"  filtered point sweep: best strike {best:.1f} (true 91.0), "
            f"MPS {mps:.0f}")
        assert abs(best - 91.0) < 1.0

        # TPU-gated parity: masked fused kernel vs the per-source XLA eval
        # with the full FFT filter chain
        err = _sweep_vs_xla_err(eng, base, strikes)
        log(f"  filtered sweep-vs-XLA parity: rel err {err:.2e}")
        assert err < 1e-5, (
            f"filtered fused sweep disagrees with the per-source forward: "
            f"{err:.3e} (tolerance 1e-5)")
        return mps
    finally:
        eng._filters.clear()
        eng._invalidate()


def bench_finite(eng, log):
    """Finite bilateral (195 centroids): strike sweep, B=256 batches."""
    import jax
    import jax.numpy as jnp

    base = np.array(
        [0, 0, 0, 5000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 900.0, 700.0, 1000.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", base)
    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(-1.0, 1.0)
    eng.set_misfit_method("floating_l1norm")

    # batch at the plan's own chunk cap: the window kernel's per-dispatch
    # fixed cost is ~30% of a max_chunk-row chunk, so a B that the engine
    # must split (256 -> 2 x 128 under a 236 cap) wastes ~25% throughput
    # vs one full-cap dispatch per batch
    B = 256
    warm = np.tile(base, (B, 1))
    eng.misfits_for_source_batch(warm)
    cap = (eng._plan or {}).get("max_chunk")
    if cap and cap < B:
        B = cap
        log(f"  finite: batching at the plan chunk cap B={B}")
    nbatches = 8

    def dispatch(sl):
        batch = np.tile(base, (B, 1))
        batch[:, 5] = sl
        m, n, fs = eng.misfits_for_source_batch(batch)
        return jnp.sqrt((m.astype(jnp.float32) ** 2).sum(axis=1))

    rng = np.random.default_rng(0)
    batches = [
        np.linspace(0.0, 359.0, B).astype(np.float32) + rng.normal(0, 0.01, B).astype(np.float32)
        for _ in range(nbatches)
    ]
    mps, _outs = steady_state_mps(dispatch, batches, log, "finite")
    log(f"  finite (195-centroid bilateral): MPS {mps:.0f}")

    # TPU-gated value assertion: the Pallas window kernel vs the XLA
    # formulation of the same math on a real batch.  pytest only runs the
    # kernel in interpret mode on CPU, so a Mosaic lowering regression
    # (layout, SMEM, VMEM) would otherwise ship a fast wrong number.
    plan0 = eng._plan
    if plan0.get("max_chunk"):  # window-kernel plan
        pb = np.tile(base, (32, 1))
        pb[:, 5] = np.linspace(0.0, 350.0, 32).astype(np.float32)
        cbatch, moments, risetimes, _shape, _g = eng._discretize_batch(pb)
        mts, rts = jnp.asarray(moments), jnp.asarray(risetimes)
        m_k, n_k, _ = jax.block_until_ready(
            plan0["forward_batch"](cbatch, mts, rts))
        m_x, n_x, _ = jax.block_until_ready(
            jax.jit(plan0["forward_batch_raw_xla"])(cbatch, mts, rts))
        scale = float(jnp.abs(m_x).max())
        err_m = float(jnp.abs(m_k - m_x).max()) / max(scale, 1e-30)
        err_n = float(jnp.abs(n_k - n_x).max()) / max(float(jnp.abs(n_x).max()), 1e-30)
        log(f"  kernel-vs-XLA parity: misfit rel err {err_m:.2e}, "
            f"norm rel err {err_n:.2e}")
        assert err_m < 1e-5 and err_n < 1e-5, (
            f"window kernel disagrees with the XLA path on TPU: "
            f"{err_m:.3e} / {err_n:.3e} (tolerance 1e-5)")
    else:
        log("  kernel-vs-XLA parity: skipped (plan not on the window kernel)")

    # Roofline accounting for the shift-bucket kernel (docs/performance.md):
    # intrinsic f32 vector work per model (MAC = 2 flops) and actual HBM
    # traffic (lane-broadcast weight operands + outputs; the GF window is
    # VMEM-resident).  Neither roofline binds -- the kernel is
    # instruction-issue bound -- but both utilizations are reported so
    # regressions toward either wall are visible.
    plan = eng._plan
    cfg = plan["cfg"]
    R, C, G = 10, 195, 3
    P = C // G
    blend_flops = P * 4 * cfg.ng * 128 * 2
    cent_flops = C * (2 * cfg.ng + 10 + 4 + 3) * 128 * 2
    flops_per_model = R * (blend_flops + cent_flops)
    gflops = flops_per_model * mps / 1e9
    wmeta_bytes = R * (P * (G * 10 + 4) * 128 * 4 + C * 3 * cfg.ng * 4)
    hbm_gbps = wmeta_bytes * mps / 1e9
    log(f"  finite kernel: {gflops:.0f} Gflop/s ({gflops/V5E_VPU_GFLOPS:.1%} "
        f"of VPU peak), {hbm_gbps:.0f} GB/s ({hbm_gbps/V5E_HBM_GBPS:.1%} of HBM)")
    return mps, {
        "finite_vpu_gflops": round(gflops, 1),
        "finite_vpu_utilization": round(gflops / V5E_VPU_GFLOPS, 4),
        "finite_hbm_gbps": round(hbm_gbps, 1),
        "finite_hbm_utilization": round(hbm_gbps / V5E_HBM_GBPS, 4),
    }


LONG_CACHE = os.environ.get("KIWI_BENCHDB_LONG", "/tmp/kiwi_tpu_benchdb_long.npz")


def bench_finite_long(log):
    """Long-trace regime (teleseismic-length windows): nt_ext > 128 lanes.

    Round 2 silently dropped these plans to the XLA formulations measured
    ~60x off roofline; the multi-tile window kernel now covers them.  The
    XLA fallback is timed on the same batch for the speedup column."""
    import jax
    import jax.numpy as jnp

    from kiwi_tpu import geo
    from kiwi_tpu.engine import Engine, Receiver
    from kiwi_tpu.gf.store import GFStore

    if os.path.exists(LONG_CACHE):
        store = GFStore.load(LONG_CACHE)
    else:
        from kiwi_tpu.gf import elseis

        log("building long-trace benchdb (100x40, ~560-sample traces)...")
        stf = np.concatenate([
            np.zeros(4), np.linspace(0.0, 1.0, 400), np.ones(80)])
        t0 = time.time()
        store = elseis.build_ahfull_store(
            nx=100, nz=40, dt=0.1, dx=100.0, dz=100.0, firstx=100.0,
            firstz=0.0, material=(2300.0, 3200.0, 1600.0), stf=stf,
        )
        log(f"  built in {time.time() - t0:.1f}s")
        try:
            store.save(LONG_CACHE)
        except OSError:
            pass

    olat, olon = 30.0, 70.0
    eng = Engine(store)
    recs = []
    for d in np.linspace(3000.0, 4000.0, 10):
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), float(d), 0.0)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    base = np.array(
        [0, 0, 0, 2000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 900.0, 700.0, 1000.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", base)
    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(-1.0, 1.0)
    eng.set_misfit_method("floating_l1norm")

    B = 32
    nbatches = 4

    def dispatch(sl):
        batch = np.tile(base, (B, 1))
        batch[:, 5] = sl
        m, n, fs = eng.misfits_for_source_batch(batch)
        return jnp.sqrt((m.astype(jnp.float32) ** 2).sum(axis=1))

    rng = np.random.default_rng(1)
    batches = [
        np.linspace(0.0, 359.0, B).astype(np.float32)
        + rng.normal(0, 0.01, B).astype(np.float32)
        for _ in range(nbatches)
    ]
    mps, _ = steady_state_mps(dispatch, batches, log, "finite_long")
    cfg = eng._plan["cfg"]
    nt_ext = cfg.nt_out + cfg.s_len
    on_kernel = eng._plan.get("max_chunk") is not None
    log(f"  finite long-window (nt_ext={nt_ext}, kernel={on_kernel}): "
        f"MPS {mps:.0f}")

    # same batch through the XLA fallback for the speedup column
    os.environ["KIWI_WINDOW"] = "0"
    try:
        eng._invalidate()
        mps_x, _ = steady_state_mps(dispatch, batches, log, "finite_long_xla")
    finally:
        os.environ.pop("KIWI_WINDOW", None)
        eng._invalidate()
    log(f"  finite long-window XLA fallback: MPS {mps_x:.0f} "
        f"(kernel speedup {mps / max(mps_x, 1e-9):.1f}x)")
    return mps, mps_x, nt_ext


def bench_eikonal(eng, log):
    """Finite eikonal rupture: radius sweep on the device fast-sweeping
    discretizer."""
    import jax.numpy as jnp

    # test-scale rupture (a ~100x100 fine grid; the grid-cell size is the
    # reference's min(100*dt/2, 4000) m, source_eikonal.f90:293, so larger
    # ruptures/denser dt grow the eikonal grid quadratically for BOTH stacks)
    p = np.array(
        [0.0, 0.0, 0.0, 400.0, 1e12, 30.0, 80.0, 164.0,
         0.0, 0.0, 250.0, 50.0, -50.0, 0.9, 0.3],
        dtype=np.float32,
    )
    eng.set_misfit_method("l2norm")
    eng.set_floating_shiftrange(0.0, 0.0)
    eng.set_source_constraints(
        [[0, 0, 50.0], [0, 0, 700.0]], [[0, 0, -1.0], [0, 0, 1.0]]
    )
    eng.set_source_params("eikonal", p)
    eng.set_synthetic_reference()

    # grid searches sweep hundreds of ruptures per round; large B amortizes
    # the fast-sweeping solver's sequential diagonal steps and the
    # window-kernel per-chunk fixed cost over the batch.  Round 5 (Pallas
    # sweep kernel + vectorized host prep): B=384 2225 MPS, B=768 2401 --
    # monotone now; 384 stays the default as the production grid-search
    # shape.  4 batches in flight so the host-side polygon prep of batch
    # i+1 overlaps batch i's device work
    B = int(os.environ.get("KIWI_BENCH_EIK_B", "384"))
    nbatches = 4

    def dispatch(radii):
        batch = np.tile(p, (B, 1))
        batch[:, 10] = radii
        g = eng.global_misfits_for_source_batch(batch)
        return jnp.asarray(g)

    batches = [
        np.linspace(200.0, 350.0, B).astype(np.float32) for _ in range(nbatches)
    ]
    # measured run-to-run spread on this regime is ~2x (684-1198 MPS on
    # one day); extra trials tighten the min
    mps, _ = steady_state_mps(dispatch, batches, log, "eikonal", trials=6)
    log(f"  eikonal finite rupture: MPS {mps:.0f}")
    return mps


def _check_float_scan(log):
    """Fail-safe for the floating-scan Pallas kernel: a 5-second lowering
    + value self-check; any failure pins KIWI_FLOAT_SCAN=0 so the bench
    still reports numbers on the (slower) XLA eval path instead of dying
    inside the first fused forward."""
    if os.environ.get("KIWI_FLOAT_SCAN") == "0":
        return
    try:
        import jax.numpy as jnp

        from kiwi_tpu.ops.float_scan import scan_sums

        ref = np.ones((2 * 3, 128), np.float32)
        syn = np.zeros((3, 32, 128), np.float32)
        out = np.asarray(scan_sums(jnp.asarray(ref), jnp.asarray(syn)))
        assert out.shape == (2, 32, 3) and np.allclose(out, 128.0), out
    except Exception as e:  # noqa: BLE001
        log(f"  float-scan kernel unavailable ({type(e).__name__}: {e}); "
            "falling back to the XLA eval path")
        os.environ["KIWI_FLOAT_SCAN"] = "0"


def bench_mini(log):
    """mini.inp through the text protocol (benchmark/run_mini.py): the one
    scripted session the reference ships, timed warm (8 finite syntheses +
    seismogram file output), as VERDICT r3 asked to track."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmark"))
    import run_mini

    cwd = os.getcwd()
    try:
        r = run_mini.run("/tmp/kiwi_mini_bench")
    finally:
        os.chdir(cwd)
    log(f"  mini.inp protocol replay: warm {r['elapsed']:.2f}s for "
        f"{r['n_synth'] - 1} syntheses (compile+setup {r['t_warm']:.0f}s)")
    return r["elapsed"]


def main():
    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    _check_float_scan(log)
    store, makedb_seconds = get_store(log)
    eng = make_engine(store)

    point_mps = bench_point(eng, log)
    try:
        point_filt_mps = bench_point_filtered(eng, log)
    except Exception as e:  # noqa: BLE001
        log(f"  filtered point bench failed: {e}")
        point_filt_mps = 0.0
    finite_mps, roofline = bench_finite(eng, log)
    try:
        eik_mps = bench_eikonal(eng, log)
    except Exception as e:  # noqa: BLE001
        log(f"  eikonal bench failed: {e}")
        eik_mps = 0.0
    try:
        long_mps, long_mps_xla, long_nt = bench_finite_long(log)
    except Exception as e:  # noqa: BLE001
        log(f"  finite-long bench failed: {e}")
        long_mps = long_mps_xla = long_nt = 0
    try:
        mini_seconds = bench_mini(log)
    except Exception as e:  # noqa: BLE001
        log(f"  mini.inp bench failed: {e}")
        mini_seconds = 0.0

    import jax

    print(json.dumps({
        "metric": "kiwibench_syntheseis_mps",
        "value": round(point_mps, 1),
        "unit": "models/sec",
        "chip": str(jax.devices()[0].device_kind),
        "date": time.strftime("%Y-%m-%d"),
        "vs_baseline": round(point_mps / MEASURED_FORTRAN_CORE_MPS, 2),
        "fortran_core_mps": MEASURED_FORTRAN_CORE_MPS,
        "vs_fortran_pool4": round(point_mps / (4 * MEASURED_FORTRAN_CORE_MPS), 2),
        "point_filtered_mps": round(point_filt_mps, 1),
        "filtered_over_unfiltered": round(point_filt_mps / max(point_mps, 1e-9), 3),
        "finite_mps": round(finite_mps, 1),
        "finite_vs_fortran": round(finite_mps / MEASURED_FORTRAN_FINITE_MPS, 2),
        "eikonal_mps": round(eik_mps, 1),
        "eikonal_vs_fortran": round(eik_mps / MEASURED_FORTRAN_EIKONAL_MPS, 2),
        "finite_long_mps": round(float(long_mps), 1),
        "finite_long_xla_mps": round(float(long_mps_xla), 1),
        "finite_long_nt_ext": int(long_nt),
        "mini_inp_seconds": round(float(mini_seconds), 3),
        "makedb_seconds": round(float(makedb_seconds), 1),
        **roofline,
    }))


if __name__ == "__main__":
    main()
