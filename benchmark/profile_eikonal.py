"""Stage-split profile of the eikonal finite-rupture regime (bench_eikonal).

Times, separately and pipelined where the engine pipelines them:
  1. host prepare_batch (polygon trim + grid shapes)        [host, per batch]
  2. sweep_solve alone (vmapped fast sweeping)              [device]
  3. full discretize_device_batch (solve+downsample+table)  [device]
  4. downsample+table alone = (3) - (2)                     [derived]
  5. synthesis forward after discretization                 [device]
  6. end-to-end global_misfits_for_source_batch             [engine]

Run: python benchmark/profile_eikonal.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import get_store, make_engine  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, n=5):
    import jax

    jax.block_until_ready(fn())  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    return best


def pipelined(fn, n=8):
    """Dispatch n async calls, one block: device throughput per call."""
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96

    store, _mk = get_store(log)
    eng = make_engine(store)
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

    batch = np.tile(p, (B, 1))
    batch[:, 10] = np.linspace(200.0, 350.0, B).astype(np.float32)

    from kiwi_tpu.sources import eikonal as eiksrc

    from kiwi_tpu.sources import get_source_model
    model = get_source_model(eng.source_type)
    ctx = eng.eikonal_context()
    named = eiksrc.named_params_batch(model.name, batch)

    # 1. host prep
    t0 = time.time()
    static, arrays = eiksrc.prepare_batch(named, eng.effective_dt, ctx)
    t_prep = time.time() - t0
    for _ in range(2):
        t0 = time.time()
        eiksrc.prepare_batch(named, eng.effective_dt, ctx)
        t_prep = min(t_prep, time.time() - t0)
    log(f"B={B} NF={static['NF']} NC={static['NC']}")
    log(f"1. prepare_batch (host):          {t_prep*1e3:8.1f} ms")

    diag = np.hypot(arrays["cdelta"][:, 0], arrays["cdelta"][:, 1])
    ntmax_hard = int(np.floor(4.0 * diag / np.maximum(arrays["minspeed"], 1.0)
                              / eng.effective_dt).max()) + 2
    ntmax = ntmax_hard
    log(f"   hard ntmax={ntmax_hard}, ncell={static['NC'][0]*static['NC'][1]} "
        f"(engine calibrates tighter budgets from the host oracle)")

    # 2. sweep_solve alone
    from kiwi_tpu import eikonal as eik

    nfx, nfy = static["NF"]
    adev = {k: jnp.asarray(v, jnp.int32 if v.dtype.kind == "i" else jnp.float32)
            for k, v in arrays.items()}

    @jax.jit
    def solve_only(a):
        def one(ai):
            speed = jnp.ones((nfx, nfy), jnp.float32)  # shape-realistic stand-in
            return eik.sweep_solve(speed, ai["delta"], ai["first"], ai["nukl"],
                                   n_rounds=2)
        return jax.vmap(one)(a)

    t_solve = pipelined(lambda: solve_only(adev))
    log(f"2. sweep_solve alone (device):    {t_solve*1e3:8.1f} ms")

    # 3. full discretizer (with the engine's calibrated table budgets)
    eng._discretize_batch(batch)  # triggers calibration
    (_ck, (nt_cal, budget, _hard)), = eng._eik_calib.items()
    log(f"   calibrated ntmax={nt_cal} ncell_budget={budget}")
    t_disc = pipelined(
        lambda: eiksrc.discretize_device_batch(
            static, arrays, eng.effective_dt, ctx, nt_cal,
            ncell_budget=budget))
    log(f"3. discretize_device_batch:       {t_disc*1e3:8.1f} ms")
    log(f"4. downsample+table (3-2):        {(t_disc-t_solve)*1e3:8.1f} ms")

    # 5. synthesis after discretization (through the engine forward)
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    mts, rts = jnp.asarray(moments), jnp.asarray(risetimes)

    chunk = B
    if plan.get("max_chunk"):
        chunk = max(1, min(chunk, plan["max_chunk"]))
        chunk = -(-B // (-(-B // chunk)))  # engine's balanced chunking
    idxs = [np.arange(i, min(i + chunk, B)) for i in range(0, B, chunk)]
    idxs = [np.concatenate([ix, np.full(chunk - len(ix), B - 1)])
            if len(ix) < chunk else ix for ix in idxs]
    log(f"   synthesis chunk={chunk} x {len(idxs)} dispatches")

    def synth_only():
        outs = []
        for ix in idxs:
            cb = {k: v[jnp.asarray(ix)] for k, v in cbatch.items()}
            m, n, fs = plan["forward_batch"](cb, mts[ix], rts[ix])
            outs.append(m)
        return outs

    t_synth = pipelined(synth_only)
    log(f"5. synthesis forward:             {t_synth*1e3:8.1f} ms "
        f"(path={'kernel' if plan.get('max_chunk') else 'xla'})")

    # 5b. split the kernel-path synthesis: kinematics+pack (XLA) vs the
    # pallas window kernel itself, on one chunk
    if plan.get("max_chunk"):
        from kiwi_tpu import synth as ksynth
        from kiwi_tpu.ops import synth_window as sw

        cfg = plan["cfg"]
        geom_recs = eng._geometry().device()
        ext = ksynth.materialize_window(
            *ksynth.window_arrays(eng.store, cfg), cfg)
        ext_flat = sw.pack_ext(ext, cfg)
        ix0 = idxs[0]
        cb0 = {k: v[jnp.asarray(ix0)] for k, v in cbatch.items()}

        @jax.jit
        def kin_pack(cb):
            def kin_one(cent):
                return jax.vmap(
                    lambda rec: ksynth._centroid_kinematics(cfg, rec, cent)
                )(geom_recs)
            kin = jax.vmap(kin_one)(cb)
            return sw.pack_kinematics(cfg, kin, gsize)

        ops = kin_pack(cb0)
        jax.block_until_ready(ops)
        # blocking per call: 8 async packed-operand sets can exceed HBM
        t_kin = timeit(lambda: jax.block_until_ready(kin_pack(cb0)), n=3)
        log(f"   5b. kinematics+pack (XLA):     {t_kin*1e3:8.1f} ms "
            f"per {len(ix0)}-chunk")
        _t, ngp = sw.ext_layout(cfg)
        t_kern = pipelined(lambda: sw.window_forward(
            ext_flat, *ops, G=sw.packed_g(gsize), ng=cfg.ng, ngp=ngp, nshift=cfg.s_len))
        log(f"   5b. window kernel alone:       {t_kern*1e3:8.1f} ms "
            f"per {len(ix0)}-chunk "
            f"(x{len(idxs)} chunks => {len(idxs)*(t_kin+t_kern)*1e3:.1f} ms)")

        # 5c. spans alone (per-centroid span-union table gathers)
        sl = np.s_[cfg.ix0:cfg.ix0 + cfg.nxw, cfg.iz0:cfg.iz0 + cfg.nzw]
        gfi = jnp.asarray(eng.store.itmin[sl])
        gfn = jnp.asarray(eng.store.nsamples[sl])
        span_tab = jax.jit(ksynth.span_tables, static_argnums=2)(gfi, gfn, cfg)

        @jax.jit
        def spans_fn(cb):
            def kin_one(cent):
                return jax.vmap(
                    lambda rec: ksynth._centroid_kinematics(cfg, rec, cent)
                )(geom_recs)
            kin = jax.vmap(kin_one)(cb)
            return jax.vmap(jax.vmap(
                lambda k: ksynth.physical_spans_from_tables(span_tab, cfg, k)
            ))(kin)

        t_spans = pipelined(lambda: spans_fn(cb0))
        log(f"   5c. kin+spans (XLA):           {t_spans*1e3:8.1f} ms "
            f"per {len(ix0)}-chunk")

        # 5d. one full forward chunk, pipelined
        mts_j, rts_j = jnp.asarray(moments), jnp.asarray(risetimes)
        ixj = jnp.asarray(ix0)

        def fwd():
            return plan["forward_batch"](cb0, mts_j[ixj], rts_j[ixj])

        t_fwd = pipelined(fwd)
        log(f"   5d. full forward chunk:        {t_fwd*1e3:8.1f} ms "
            f"(x{len(idxs)} => {len(idxs)*t_fwd*1e3:.1f} ms; "
            f"eval/rc rest = {(t_fwd-t_kin-t_kern)*1e3:.1f} ms)")

    # 6. end-to-end, split into the engine's own stages
    def disc_full():
        out = eng._discretize_batch(batch)
        jax.block_until_ready(out[0])
        return out

    t_dfull = timeit(disc_full, n=3)
    log(f"6a. _discretize_batch (blocking): {t_dfull*1e3:8.1f} ms "
        f"(host prep + device dispatch + sync)")

    t0 = time.time()
    pf = np.array([model.post_factors(q) for q in batch], dtype=np.float32)
    t_post = time.time() - t0
    log(f"6b. post_factors host loop:       {t_post*1e3:8.1f} ms")

    def mfs():
        m, n, fs = eng.misfits_for_source_batch(batch)
        return m

    t_mfs = timeit(mfs, n=3)
    log(f"6c. misfits_for_source_batch:     {t_mfs*1e3:8.1f} ms (blocking)")

    def e2e():
        return jnp.asarray(eng.global_misfits_for_source_batch(batch))

    t_e2e = timeit(e2e, n=3)
    log(f"6. end-to-end (blocking):         {t_e2e*1e3:8.1f} ms "
        f"=> {B/t_e2e:.0f} MPS blocking")

    # pipelined end-to-end (what bench_eikonal measures)
    t_pipe = pipelined(e2e, n=4)
    log(f"   end-to-end (pipelined):        {t_pipe*1e3:8.1f} ms "
        f"=> {B/t_pipe:.0f} MPS")


if __name__ == "__main__":
    main()
