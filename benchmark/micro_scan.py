"""Microbenchmark of the floating-scan kernel at bench shapes.

Variants of the lane reduction (the per-(shift,rc) sum over W probe
lanes), measured on the real chip:

  v0: jnp.sum(axis=-1, keepdims=True)       (shipped round-3 kernel)
  v1: explicit halving-slice tree            u = u[:, :w] + u[:, w:]
  v2: halve to 16 lanes, concat 8 pairs, one shared within-group finish

Run: python benchmark/micro_scan.py [S RC B W bt]
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    RC = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    bt = int(sys.argv[5]) if len(sys.argv) > 5 else 32

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.normal(size=(S * RC, W)).astype(np.float32))
    syn = jnp.asarray(rng.normal(size=(RC, B, W)).astype(np.float32))

    def reduce_v0(u):
        return jnp.sum(u, axis=-1, keepdims=True)

    def reduce_v1(u):
        w = u.shape[-1]
        while w > 1:
            w //= 2
            u = u[:, :w] + u[:, w:]
        return u

    def kernel(ref_ref, syn_ref, out_ref, *, S, RC, reduce):
        def body(s, _):
            cols = []
            for rc in range(RC):
                synb = syn_ref[rc]
                ref_row = ref_ref[s * RC + rc]
                d = ref_row[None, :] - synb
                cols.append(reduce(jnp.abs(d)))
            out_ref[s] = jnp.concatenate(cols, axis=-1)
            return 0

        jax.lax.fori_loop(0, S, body, 0)

    def build(reduce):
        @jax.jit
        def run(ref_srw, syn_rbw):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    functools.partial(kernel, S=S, RC=RC, reduce=reduce),
                    grid=(B // bt,),
                    in_specs=[
                        pl.BlockSpec((S * RC, W), lambda i: (0, 0)),
                        pl.BlockSpec((RC, bt, W), lambda i: (0, i, 0)),
                    ],
                    out_specs=pl.BlockSpec((S, bt, RC), lambda i: (0, i, 0)),
                    out_shape=jax.ShapeDtypeStruct((S, B, RC), jnp.float32),
                )(ref_srw, syn_rbw)

        return run

    def timeit(fn, n=20, trials=4):
        # axon tunnel: block_until_ready can ack before execution; a value
        # fetch is the only trustworthy fence.  min over trials rides out
        # the tunnel's multi-second stalls.
        out = fn(ref, syn)
        float(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(ref, syn) for _ in range(n)]
            float(jnp.ravel(outs[-1])[0])
            best = min(best, (time.time() - t0) / n)
        return best, out

    t0, o0 = timeit(build(reduce_v0))
    print(f"v0 jnp.sum tree:      {t0*1e3:7.3f} ms", flush=True)
    t1, o1 = timeit(build(reduce_v1))
    err = float(jnp.abs(o1 - o0).max() / jnp.abs(o0).max())
    print(f"v1 halving slices:    {t1*1e3:7.3f} ms  (vs v0 rel err {err:.2e})",
          flush=True)

    # v3: W on sublanes, B on lanes.  The reduce over W becomes ~W/8
    # full-vreg adds shared across 128 b-lanes + one 3-step sublane tree,
    # ~50 ops per (s,rc) per 128 models vs v0's ~144: the per-vreg
    # log2(128)-step lane tree is v0's floor, and it cannot amortize
    # across models because each model owns its own vreg rows there.
    # ref laid out [S, W, RC]: the s axis rides the grid (per-s BlockSpec
    # slice -- dynamic lane indexing is not provable for Mosaic), rc is a
    # static Python-loop lane slice inside the block
    refT = jnp.asarray(
        np.asarray(ref).reshape(S, RC, W).transpose(0, 2, 1).copy())
    synT = jnp.asarray(np.asarray(syn).transpose(0, 2, 1).copy())  # [RC, W, B]
    btl = 128

    def kernel_t(ref_ref, syn_ref, out_ref, *, RC):
        for rc in range(RC):
            refc = ref_ref[0][:, rc:rc + 1]           # [W, 1] static slice
            d = jnp.abs(refc - syn_ref[rc])           # [W, btl]
            out_ref[0, rc] = jnp.sum(d, axis=0)       # [btl]

    @jax.jit
    def run_t(refT, synT):
        return pl.pallas_call(
            functools.partial(kernel_t, RC=RC),
            grid=(B // btl, S),
            in_specs=[
                pl.BlockSpec((1, W, RC), lambda i, s: (s, 0, 0)),
                pl.BlockSpec((RC, W, btl), lambda i, s: (0, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, RC, btl), lambda i, s: (s, 0, i)),
            out_shape=jax.ShapeDtypeStruct((S, RC, B), jnp.float32),
        )(refT, synT)

    def timeit_t(fn, n=20, trials=4):
        out = fn(refT, synT)
        float(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(refT, synT) for _ in range(n)]
            float(jnp.ravel(outs[-1])[0])
            best = min(best, (time.time() - t0) / n)
        return best, out

    t3, o3 = timeit_t(run_t)
    err3 = float(jnp.abs(o3.transpose(0, 2, 1) - o0).max() / jnp.abs(o0).max())
    print(f"v3 W-on-sublanes:     {t3*1e3:7.3f} ms  (vs v0 rel err {err3:.2e})",
          flush=True)

    # reference: the XLA vmapped formulation's traffic cost for context
    @jax.jit
    def xla(ref_srw, syn_rbw):
        r = ref_srw.reshape(S, RC, W)
        return jnp.abs(r[:, None] - syn_rbw.transpose(1, 0, 2)[None]).sum(-1)

    t2, _ = timeit(xla, n=5)
    print(f"xla vmapped:          {t2*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
