"""Stage-split profile of the finite bilateral regime (bench_finite).

Splits one kernel-path chunk into its pipeline stages, each timed
pipelined (multiple async dispatches, one block -- tunnel latency
overlaps):

  1. discretizer (XLA jit)                       [device]
  2. kinematics (vmap _centroid_kinematics)      [device]
  3. pack_kinematics (operand materialization)   [device]
  4. window kernel alone                         [device]
  5. spans + components + misfits (the rest)     [derived: full - 2..4]
  6. full forward_batch chunk                    [device]
  7. end-to-end misfits_for_source_batch         [engine]

Run: python benchmark/profile_finite.py [B]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    store, _mk = get_store(log)
    eng = make_engine(store)
    base = np.array(
        [0, 0, 0, 5000.0, 1e12, 91.0, 87.0, 164.0, 0.0, 900.0, 700.0, 1000.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", base)
    eng.set_synthetic_reference()
    eng.set_floating_shiftrange(-1.0, 1.0)
    eng.set_misfit_method("floating_l1norm")

    batch = np.tile(base, (B, 1))
    batch[:, 5] = np.linspace(0.0, 359.0, B).astype(np.float32)

    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    cfg = plan["cfg"]
    if not plan.get("max_chunk"):
        log("plan is NOT on the window kernel; nothing to profile")
        return
    chunk = min(B, plan["max_chunk"])
    chunk = -(-B // (-(-B // chunk)))
    nchunks = -(-B // chunk)
    log(f"B={B} C={np.prod(shape)} G={gsize} chunk={chunk} x {nchunks}")

    from kiwi_tpu import synth as ksynth
    from kiwi_tpu.ops import synth_window as sw
    from kiwi_tpu.sources import get_source_model

    model = get_source_model(eng.source_type)
    mts, rts = jnp.asarray(moments), jnp.asarray(risetimes)
    ix0 = np.arange(chunk)
    pb0 = jnp.asarray(batch[ix0])

    # 1. discretizer
    disc = eng._disc_fn(model, shape)
    t_disc = pipelined(lambda: disc(pb0))
    log(f"1. discretizer (XLA):             {t_disc*1e3:8.2f} ms per {chunk}-chunk")

    cb0 = {k: v[jnp.asarray(ix0)] for k, v in cbatch.items()}
    geom_recs = eng._geometry().device()

    # 2. kinematics alone
    @jax.jit
    def kin_fn(cb):
        def kin_one(cent):
            return jax.vmap(
                lambda rec: ksynth._centroid_kinematics(cfg, rec, cent)
            )(geom_recs)
        return jax.vmap(kin_one)(cb)

    kin = kin_fn(cb0)
    t_kin = pipelined(lambda: kin_fn(cb0))
    log(f"2. kinematics (XLA):              {t_kin*1e3:8.2f} ms")

    # 3. pack alone (from materialized kinematics)
    S = sw.choose_s(cfg, int(geom_recs["bazi"].shape[0]))

    @jax.jit
    def pack_fn(k):
        return sw.pack_kinematics(cfg, k, gsize, S=S)

    t_pack = pipelined(lambda: pack_fn(kin))
    log(f"3. pack_kinematics (XLA):         {t_pack*1e3:8.2f} ms")

    # operand sizes
    ops = pack_fn(kin)
    nbytes = sum(int(np.prod(o.shape)) * 4 for o in ops)
    log(f"   packed operand bytes: {nbytes/1e6:.1f} MB "
        f"(wmeta {int(np.prod(ops[4].shape))*4/1e6:.1f} MB)")

    # 4. kernel alone
    ext = ksynth.materialize_window(*ksynth.window_arrays(eng.store, cfg), cfg)
    ext_flat = jax.jit(sw.pack_ext, static_argnums=1)(ext, cfg)
    _t, ngp = sw.ext_layout(cfg)
    t_kern = pipelined(lambda: sw.window_forward(
        ext_flat, *ops, G=sw.packed_g(gsize), ng=cfg.ng, ngp=ngp,
        nshift=cfg.s_len, S=S))
    log(f"4. window kernel alone:           {t_kern*1e3:8.2f} ms (S={S})")

    # 6. full forward chunk
    def fwd():
        return plan["forward_batch"](cb0, mts[ix0], rts[ix0])

    t_fwd = pipelined(fwd)
    log(f"5. rest (spans/components/misfit):{(t_fwd-t_kin-t_pack-t_kern)*1e3:8.2f} ms (derived)")
    log(f"6. full forward chunk:            {t_fwd*1e3:8.2f} ms "
        f"=> x{nchunks} chunks = {t_fwd*nchunks*1e3:.1f} ms")

    # 7. end-to-end
    def e2e():
        m, n, fs = eng.misfits_for_source_batch(batch)
        return jnp.sqrt((m.astype(jnp.float32) ** 2).sum(axis=1))

    t_e2e = pipelined(e2e, n=4)
    log(f"7. end-to-end:                    {t_e2e*1e3:8.2f} ms "
        f"=> {B/t_e2e:.0f} MPS")


if __name__ == "__main__":
    main()
