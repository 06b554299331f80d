"""Stage-split profile of the point-sweep regime (bench_point).

The point sweep runs the shared-kinematics fused path: ONE jit containing
discretizer + forward_shared_raw per 4096-row dispatch.  Splits:

  1. host issue cost of misfits_for_source_batch (batch build + engine
     bookkeeping before the dispatch returns async)
  2. discretizer alone (XLA jit)
  3. fused forward (disc + forward_shared_raw, the bench's device program)
  4. g-reduction (sqrt-sum-square over rc rows) added, as bench dispatches
  5. end-to-end pipelined at 1/4/8/16 replicas in flight (tunnel
     sensitivity: the device program is ~5 ms against a ~25 ms round trip)

Run: python benchmark/profile_point.py [nrows]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import get_store, make_engine  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pipelined(fn, n=8):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    nrows = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

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

    strikes = np.linspace(0.0, 360.0, nrows).astype(np.float32)
    batch = np.tile(base, (nrows, 1))
    batch[:, 5] = strikes

    from kiwi_tpu.sources import get_source_model

    model = get_source_model(eng.source_type)
    shape = eng._batch_shape(model, batch)
    stats = eng._param_stats(model, batch)
    moments, risetimes = eng._post_factors(model, batch)
    plan = eng._ensure_plan(None, float(risetimes.max()), shape,
                            stats=stats, gsize=int(shape[-1]))
    shared = model.shared_kin_check is not None and model.shared_kin_check(batch)
    log(f"nrows={nrows} shape={shape} shared_kin={shared}")

    # 1. host issue cost (dispatch async, do not block)
    def issue():
        m, n, fs = eng.misfits_for_source_batch(batch)
        return m

    m0 = issue()
    jax.block_until_ready(m0)
    t0 = time.time()
    m1 = issue()
    t_issue = time.time() - t0
    jax.block_until_ready(m1)
    log(f"1. host issue (async return):     {t_issue*1e3:8.2f} ms")

    # 2. discretizer alone
    pbj = jnp.asarray(batch)
    disc = eng._disc_fn(model, shape)
    t_disc = pipelined(lambda: disc(pbj))
    log(f"2. discretizer (XLA):             {t_disc*1e3:8.2f} ms")

    # 3. fused forward (the engine's cached program)
    fkey = (eng.source_type, shape, eng.effective_dt)
    fwd = plan["fused_shared" if shared else "fused"].get(fkey)
    assert fwd is not None, "engine did not cache the fused program"
    mts, rts = jnp.asarray(moments), jnp.asarray(risetimes)
    t_fwd = pipelined(lambda: fwd(pbj, mts, rts))
    log(f"3. fused disc+forward:            {t_fwd*1e3:8.2f} ms "
        f"=> {nrows/t_fwd:.0f} MPS device-side")

    # 4. with the g-reduction bench_point adds
    def with_g():
        m, n, fs = fwd(pbj, mts, rts)
        return jnp.sqrt((m.astype(jnp.float32) ** 2).sum(axis=1))

    t_g = pipelined(with_g)
    log(f"4. + g-reduction:                 {t_g*1e3:8.2f} ms")

    # 5. end-to-end at several replica depths
    def e2e():
        m, n, fs = eng.misfits_for_source_batch(batch)
        return jnp.sqrt((m.astype(jnp.float32) ** 2).sum(axis=1))

    for depth in (1, 4, 8, 16):
        t = pipelined(e2e, n=depth)
        log(f"5. e2e depth {depth:2d}:                {t*1e3:8.2f} ms "
            f"=> {nrows/t:.0f} MPS")

    # 6. floating-shift scan cost: same program under plain l2norm
    # (S=1, no shift scan) vs the floating norm (S = 2*shift/dt + 1
    # re-reads of every synthetic).  The difference is the scan's cost.
    eng.set_misfit_method("l2norm")
    eng.set_floating_shiftrange(0.0, 0.0)
    eng._invalidate()
    t0 = time.time()
    jax.block_until_ready(e2e())
    log(f"6. l2norm compile+first:          {(time.time()-t0)*1e3:8.0f} ms")
    t = pipelined(e2e, n=8)
    log(f"6. e2e l2norm (no shift scan):    {t*1e3:8.2f} ms "
        f"=> {nrows/t:.0f} MPS")


if __name__ == "__main__":
    main()
