"""Microbenchmark: transposed fused synthesis+scan kernel (round 5).

The round-4 stage split (docs/performance.md) left the fused point sweep
at 3.19 ms / 4096 sources: ~1.6 ms shared-kinematics synthesis (XLA) +
~1.6 ms floating scan (ops/float_scan.py v0 kernel) with the [B, RC, W]
synthetic block round-tripping HBM between them.  v0's floor is its lane
reduction: 28 of 36 vreg-ops per (shift, rc, 32 models) are the per-vreg
log2(128) lane tree, which cannot amortize across models because each
model owns its own vreg rows.

This benchmark measures the TRANSPOSED fusion:

* layout [W on sublanes, B on lanes]: the reduce over W becomes 15
  full-vreg adds + a 3-step sublane tree SHARED by 128 models
  (~18 ops/128 models vs v0's 112);
* the ref rows reach the kernel as XLA-PRE-BROADCAST HBM tiles
  [RC, S, W, 128] -- computed once per sweep (they are sweep-invariant),
  so the [W,1]->[W,128] lane-broadcast relayout that sank the round-4 v3
  attempt (42 ops per (s, rc)) never happens in-kernel;
* the synthesis contraction syn[w, b] = sum_t v[t, w] * wgt[b, t] fuses
  in-kernel, so the synthetic block lives and dies in VMEM:
  - v5a: VPU FMAs against pre-broadcast v tiles [RC, T, W, 128]
  - v5m: MXU dot (bf16x3 split: ~2^-16 residual) on natural-layout v
  - v5h: MXU dot (bf16x6: f32-exact to ~2^-24)

Run: python benchmark/micro_fused.py [S RC T B W]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    RC = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    W = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    BL = 128  # models per lane block

    rng = np.random.default_rng(0)
    ref = rng.normal(size=(S * RC, W)).astype(np.float32)
    v = rng.normal(size=(RC, T, W)).astype(np.float32)
    wgt = rng.normal(size=(RC, T, B)).astype(np.float32) / T

    refj = jnp.asarray(ref)
    vj = jnp.asarray(v)
    wgtj = jnp.asarray(wgt)

    # ---- baselines -------------------------------------------------------
    # v0 shipped scan kernel + XLA synthesis (the round-4 structure)
    from kiwi_tpu.ops.float_scan import scan_sums

    @jax.jit
    def synth_xla(wgt_rtb):
        # unrolled FMA chain per rc (the engine's f32-exact contraction)
        def per_rc(w_tb, v_tw):
            acc = w_tb[0][:, None] * v_tw[0][None, :]
            for t in range(1, T):
                acc = acc + w_tb[t][:, None] * v_tw[t][None, :]
            return acc  # [B, W]

        return jax.vmap(per_rc)(wgt_rtb, vj)  # [RC, B, W]

    @jax.jit
    def pipeline_v0(wgt_rtb):
        syn = synth_xla(wgt_rtb)
        return scan_sums(refj, syn, l2=False, bt=32)  # [S, B, RC]

    def timeit(fn, *args, n=20, trials=4):
        out = fn(*args)
        float(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(*args) for _ in range(n)]
            float(jnp.ravel(outs[-1])[0])
            best = min(best, (time.time() - t0) / n)
        return best, np.asarray(out)

    t_synth, syn0 = timeit(synth_xla, wgtj)
    t_v0, o0 = timeit(pipeline_v0, wgtj)
    print(f"XLA synthesis alone:          {t_synth*1e3:7.3f} ms", flush=True)
    print(f"v0 pipeline (synth+scan):     {t_v0*1e3:7.3f} ms", flush=True)

    # ---- transposed fused kernels ---------------------------------------
    # pre-broadcast tiles (sweep-invariant: computed once, cached on device)
    ref_tiles = jnp.broadcast_to(
        refj.reshape(S, RC, W).transpose(1, 0, 2)[..., None], (RC, S, W, BL)
    ).copy()  # [RC, S, W, BL]
    v_tiles = jnp.broadcast_to(vj[..., None], (RC, T, W, BL)).copy()

    def kernel_v5a(ref_ref, vt_ref, wgt_ref, out_ref):
        syn = vt_ref[0, 0] * wgt_ref[0, 0][None, :]
        for t in range(1, T):
            syn = syn + vt_ref[0, t] * wgt_ref[0, t][None, :]
        for s in range(S):
            d = jnp.abs(ref_ref[0, s] - syn)       # [W, BL]
            out_ref[0, s] = jnp.sum(d, axis=0)     # [BL]

    @jax.jit
    def run_v5a(wgt_rtb):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel_v5a,
                grid=(RC, B // BL),
                in_specs=[
                    pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                    pl.BlockSpec((1, T, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                    pl.BlockSpec((1, T, BL), lambda rc, b: (rc, 0, b)),
                ],
                out_specs=pl.BlockSpec((1, S, BL), lambda rc, b: (rc, 0, b)),
                out_shape=jax.ShapeDtypeStruct((RC, S, B), jnp.float32),
            )(ref_tiles, v_tiles, wgt_rtb)

    t_a, oa = timeit(run_v5a, wgtj)
    err_a = float(np.abs(oa.transpose(1, 2, 0) - o0).max() / np.abs(o0).max())
    print(f"v5a fused VPU-synth:          {t_a*1e3:7.3f} ms  "
          f"(vs v0 rel err {err_a:.2e})", flush=True)

    # scan-only transposed (synthetic block from HBM, [RC, W, B] layout):
    # isolates the reduce win from the fusion win
    def kernel_v4(ref_ref, syn_ref, out_ref):
        syn = syn_ref[0]
        for s in range(S):
            d = jnp.abs(ref_ref[0, s] - syn)
            out_ref[0, s] = jnp.sum(d, axis=0)

    @jax.jit
    def run_v4(syn_rwb):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel_v4,
                grid=(RC, B // BL),
                in_specs=[
                    pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                    pl.BlockSpec((1, W, BL), lambda rc, b: (rc, 0, b)),
                ],
                out_specs=pl.BlockSpec((1, S, BL), lambda rc, b: (rc, 0, b)),
                out_shape=jax.ShapeDtypeStruct((RC, S, B), jnp.float32),
            )(ref_tiles, syn_rwb)

    syn_t = jnp.asarray(syn0.transpose(0, 2, 1).copy())  # [RC, W, B]
    t_4, o4 = timeit(run_v4, syn_t)
    err_4 = float(np.abs(o4.transpose(1, 2, 0) - o0).max() / np.abs(o0).max())
    print(f"v4 transposed scan-only:      {t_4*1e3:7.3f} ms  "
          f"(vs v0 rel err {err_4:.2e})", flush=True)

    # MXU synthesis: v natural layout [T, W]; split operands in bf16
    def make_kernel_mxu(nsplit):
        def kernel(ref_ref, v_ref, wgt_ref, out_ref):
            vw = v_ref[0]          # [T, W] f32
            wb = wgt_ref[0]        # [T, BL] f32
            bf = jnp.bfloat16

            def split(x, n):
                parts = []
                r = x
                for _ in range(n - 1):
                    h = r.astype(bf)
                    parts.append(h)
                    r = r - h.astype(jnp.float32)
                parts.append(r.astype(bf))
                return parts

            vs = split(vw, nsplit)
            ws = split(wb, nsplit)
            syn = None
            for i in range(nsplit):
                for j in range(nsplit):
                    if i + j >= nsplit:
                        continue
                    p = jax.lax.dot_general(
                        vs[i], ws[j], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [W, BL]
                    syn = p if syn is None else syn + p
            for s in range(S):
                d = jnp.abs(ref_ref[0, s] - syn)
                out_ref[0, s] = jnp.sum(d, axis=0)

        return kernel

    def run_mxu(nsplit):
        @jax.jit
        def run(wgt_rtb):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    make_kernel_mxu(nsplit),
                    grid=(RC, B // BL),
                    in_specs=[
                        pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                        pl.BlockSpec((1, T, W), lambda rc, b: (rc, 0, 0)),
                        pl.BlockSpec((1, T, BL), lambda rc, b: (rc, 0, b)),
                    ],
                    out_specs=pl.BlockSpec((1, S, BL), lambda rc, b: (rc, 0, b)),
                    out_shape=jax.ShapeDtypeStruct((RC, S, B), jnp.float32),
                )(ref_tiles, vj, wgt_rtb)

        return run

    # v5a with the tiles broadcast INSIDE the jit (what the batch path
    # would pay without prep caching): adds 100 MB of HBM writes+reads
    @jax.jit
    def run_v5a_inprog(wgt_rtb):
        rt = jnp.broadcast_to(
            refj.reshape(S, RC, W).transpose(1, 0, 2)[..., None],
            (RC, S, W, BL))
        vt = jnp.broadcast_to(vj[..., None], (RC, T, W, BL))
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel_v5a,
                grid=(RC, B // BL),
                in_specs=[
                    pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                    pl.BlockSpec((1, T, W, BL), lambda rc, b: (rc, 0, 0, 0)),
                    pl.BlockSpec((1, T, BL), lambda rc, b: (rc, 0, b)),
                ],
                out_specs=pl.BlockSpec((1, S, BL), lambda rc, b: (rc, 0, b)),
                out_shape=jax.ShapeDtypeStruct((RC, S, B), jnp.float32),
            )(rt, vt, wgt_rtb)

    t_ib, oib = timeit(run_v5a_inprog, wgtj)
    err_ib = float(np.abs(oib.transpose(1, 2, 0) - o0).max() / np.abs(o0).max())
    print(f"v5a in-program broadcast:     {t_ib*1e3:7.3f} ms  "
          f"(vs v0 rel err {err_ib:.2e})", flush=True)

    for nsplit, name in ((2, "v5m fused MXU bf16x3"), (3, "v5h fused MXU bf16x6")):
        try:
            t_m, om = timeit(run_mxu(nsplit), wgtj)
            err_m = float(
                np.abs(om.transpose(1, 2, 0) - o0).max() / np.abs(o0).max())
            print(f"{name}:         {t_m*1e3:7.3f} ms  "
                  f"(vs v0 rel err {err_m:.2e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
