"""Split the eikonal-regime synthesis prologue: where do the 33 ms/chunk go?

Stages per 96-source chunk (B=96, R=10, C=338, G=2):
  a. _centroid_kinematics alone (geodesy + weights, per row)
  b. pack_kinematics alone (layout + lane-broadcast wmeta)
  c. kin+pack fused (the window path's real prologue)
  d. kin with per-CELL spatial reuse (hypothetical ceiling: time-only
     quantities per row)

Run: KIWI_BENCH_MAKEDB=0 python benchmark/micro_eik_prologue.py [B]
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

    from kiwi_tpu import synth as ksynth
    from kiwi_tpu.ops import synth_window as sw

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
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    cfg = plan["cfg"]
    recs = eng._geometry().device()
    C = int(cbatch["north"].shape[1])
    log(f"B={B} R={len(eng.receivers)} C={C} G={gsize} "
        f"nxw={cfg.nxw} nzw={cfg.nzw}")

    cb = {k: v[:B] for k, v in cbatch.items()}

    def timeit(fn, *args, reps=10, trials=4):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.ravel(leaf)[0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(*args) for _ in range(reps)]
            leaf = jax.tree_util.tree_leaves(outs[-1])[0]
            float(jnp.ravel(leaf)[0])
            best = min(best, (time.time() - t0) / reps)
        return best

    @jax.jit
    def kin_only(cb):
        def kin_one(cent):
            return jax.vmap(
                lambda rec: ksynth._centroid_kinematics(cfg, rec, cent)
            )(recs)
        return jax.vmap(kin_one)(cb)

    t_kin = timeit(kin_only, cb)
    log(f"a. kinematics alone:        {t_kin*1e3:8.2f} ms")

    kin = jax.block_until_ready(kin_only(cb))

    pack = jax.jit(lambda k: sw.pack_kinematics(cfg, k, gsize))
    t_pack = timeit(pack, kin)
    log(f"b. pack alone:              {t_pack*1e3:8.2f} ms")

    @jax.jit
    def kin_pack(cb):
        return sw.pack_kinematics(cfg, kin_only(cb), gsize)

    t_kp = timeit(kin_pack, cb)
    log(f"c. kin+pack fused:          {t_kp*1e3:8.2f} ms")

    # d. spatial kinematics once per CELL (rows [::G] share position),
    # time-only per row: the reuse ceiling
    @jax.jit
    def kin_cell(cb):
        cbs = {k: (v[:, ::gsize] if v.ndim >= 2 and v.shape[1] == C else v)
               for k, v in cb.items()}

        def kin_one(cent):
            return jax.vmap(
                lambda rec: ksynth._centroid_kinematics(cfg, rec, cent)
            )(recs)
        return jax.vmap(kin_one)(cbs)

    t_cell = timeit(kin_cell, cb)
    log(f"d. kinematics per cell:     {t_cell*1e3:8.2f} ms (C/{gsize})")

    # e. the window kernel itself on the packed operands
    ext = ksynth.materialize_window(*ksynth.window_arrays(store, cfg), cfg)
    ext_flat = jax.block_until_ready(sw.pack_ext(ext, cfg))
    ops = jax.block_until_ready(pack(kin))
    _t, ngp = sw.ext_layout(cfg)
    contig = (cfg.zunder if cfg.interpolate else 1) == 1

    @jax.jit
    def kernel_only(ops):
        return sw.window_forward(
            ext_flat, *ops, G=sw.packed_g(gsize), ng=cfg.ng, ngp=ngp,
            nshift=cfg.s_len, contig=contig)

    try:
        t_k = timeit(kernel_only, ops)
        log(f"e. window kernel alone:     {t_k*1e3:8.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"e. window kernel alone: FAILED {type(e).__name__}: {e}")

    # f. full window forward (kin+pack+kernel) like the engine path
    @jax.jit
    def full(cb):
        return sw.synthesize_ard_batch(ext_flat, cfg, kin_only(cb), gsize)

    t_f = timeit(full, cb)
    log(f"f. kin+pack+kernel:         {t_f*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
