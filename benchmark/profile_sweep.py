"""Stage-split of the fused point-sweep device program (round 4).

Timing discipline: through the axon tunnel, jax.block_until_ready can
return before execution completes (it acks the dispatch); every stage
here is timed as dispatch-N-then-fetch-a-scalar, which forces the FIFO
device queue to drain.  N large enough to amortize the fetch RTT.

Stages (all on the bench plan: 10 receivers x ned, floating_l1norm,
shiftrange +-1s, 4096-row strike sweep of the point bilateral):

  1. full fused sweep (tile+disc+synth+eval+g-reduction)  -- the program
  2. discretizer alone (vmapped bilateral point)
  3. shared-kinematics synthesis alone (syn_rc + spans)
  4. eval_batch alone (scan kernel + pre/post) on a precomputed syn
  5. scan_sums kernel alone at the plan's exact shapes
  6. synth+eval without the g-reduction

Run: python benchmark/profile_sweep.py [nrows]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import get_store, make_engine  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    def timeit(fn, *args, reps=25, trials=4):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf)  # warm + drain
        best = float("inf")
        for _ in range(trials):  # the tunnel stalls for seconds at random
            t0 = time.time()
            outs = [fn(*args) for _ in range(reps)]
            leaf = jax.tree_util.tree_leaves(outs[-1])[0]
            float(jnp.ravel(leaf)[0])  # drain the FIFO queue
            best = min(best, (time.time() - t0) / reps)
        return best

    store, _mk = get_store(log)
    eng = make_engine(store)
    base = np.array(
        [0, 0, 0, 5000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 0.0, 0.0, 0.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", base)
    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(-1.0, 1.0)
    eng.set_misfit_method("floating_l1norm")

    strikes = np.linspace(0.0, 360.0, n).astype(np.float32)

    # 1. the full fused sweep program
    g = eng.sweep_global_misfits(base, 5, strikes)
    np.asarray(g)
    t_full = timeit(lambda: eng.sweep_global_misfits(base, 5, strikes))
    log(f"1. fused sweep (full):        {t_full*1e3:8.3f} ms "
        f"=> {n/t_full:.0f} MPS")

    from kiwi_tpu.sources import get_source_model

    model = get_source_model(eng.source_type)
    plan = eng._plan
    shape = eng._batch_shape(model, np.tile(base, (2, 1)))
    edt = eng.effective_dt

    @jax.jit
    def disc_only(vals):
        pb = jnp.tile(jnp.asarray(base)[None, :], (n, 1))
        pb = pb.at[:, 5].set(vals)
        cb = jax.vmap(lambda p: model.discretize(p, edt, shape))(pb)
        return cb

    vj = jnp.asarray(strikes)
    t_disc = timeit(disc_only, vj)
    log(f"2. discretizer (vmapped):     {t_disc*1e3:8.3f} ms")

    cb = disc_only(vj)
    mts, rts = model.post_factors_batch(np.tile(base, (n, 1)))
    mts = jnp.asarray(mts, jnp.float32)
    rts = jnp.asarray(rts, jnp.float32)

    # big-output stages reduce to a scalar in-jit: holding reps x trials
    # full outputs OOMs HBM, and the [B, RC, nt] readbacks would dominate
    @jax.jit
    def synth_scalar(cb):
        syn_rc, lo_rc, hi_rc = plan["shared_synth_raw"](cb)
        return syn_rc.sum() + lo_rc.sum() + hi_rc.sum()

    t_syn = timeit(synth_scalar, cb)
    log(f"3. shared synthesis:          {t_syn*1e3:8.3f} ms")

    syn_rc, lo_rc, hi_rc = jax.jit(plan["shared_synth_raw"])(cb)
    syn_rc = jax.block_until_ready(syn_rc)

    @jax.jit
    def eval_scalar(syn_rc, lo_rc, hi_rc, mts, rts):
        m, nn, fs = plan["eval_batch_raw"](syn_rc, lo_rc, hi_rc, mts, rts)
        return m.sum() + nn.sum()

    t_eval = timeit(eval_scalar, syn_rc, lo_rc, hi_rc, mts, rts)
    log(f"4. eval_batch (scan+pre/post):{t_eval*1e3:8.3f} ms")

    # 5. the bare scan kernel at the plan's exact shapes
    from kiwi_tpu import misfit as mf
    from kiwi_tpu.ops.float_scan import scan_sums

    st = plan["st"]
    sdt = eng.store.dt
    s1 = int(round(eng.floating_shiftrange_s[0] / sdt))
    s2 = int(round(eng.floating_shiftrange_s[1] / sdt))
    S, RC, PL = s2 - s1 + 1, syn_rc.shape[1], st.pl
    W = min(-(-PL // 128) * 128, PL)
    ref_sl = jnp.asarray(
        np.random.default_rng(0).normal(size=(S * RC, W)).astype(np.float32))
    syn_sl = jnp.asarray(
        np.random.default_rng(1).normal(size=(RC, n, W)).astype(np.float32))
    t_scan = timeit(scan_sums, ref_sl, syn_sl)
    log(f"5. scan_sums kernel [S={S},RC={RC},W={W}]: {t_scan*1e3:8.3f} ms")

    # 6. synthesis + eval, no reduction
    @jax.jit
    def no_g(cb, mts, rts):
        syn_rc, lo_rc, hi_rc = plan["shared_synth_raw"](cb)
        m, nn, fs = plan["eval_batch_raw"](syn_rc, lo_rc, hi_rc, mts, rts)
        return m.sum() + nn.sum()

    t_ng = timeit(no_g, cb, mts, rts)
    log(f"6. synth+eval (no reduction): {t_ng*1e3:8.3f} ms")

    # 7. the fused front half alone (tile + disc + shared synthesis):
    # same fusion context as the full program, so (full - this) is the
    # trustworthy in-program eval+reduction cost
    @jax.jit
    def front(vals):
        pb = jnp.tile(jnp.asarray(base)[None, :], (n, 1))
        pb = pb.at[:, 5].set(vals)
        cb = jax.vmap(lambda p: model.discretize(p, edt, shape))(pb)
        syn_rc, lo_rc, hi_rc = plan["shared_synth_raw"](cb)
        return syn_rc.sum() + lo_rc.sum() + hi_rc.sum()

    t_front = timeit(front, vj)
    log(f"7. fused disc+synth front:    {t_front*1e3:8.3f} ms "
        f"(=> in-program eval ~ {(t_full-t_front)*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
