"""Microbenchmark: multi-SOURCE sublane packing of the window kernel
(VERDICT r3 item 4 -- distinct from the rejected multi-receiver S-packing).

The shipped kernel (ops/synth_window.py) stacks one group's G centroids
on the sublane axis; the bilateral G=3 grouping uses 3 of 8 sublanes, so
the group-math FMAs run 1 vreg-slot each at 3/8 occupancy.  Packing TWO
sources' groups into a [6, T] stack halves the group-math slot count --
IF the blend rows can be delivered per-sublane-group cheaply.  Sources in
a finite strike sweep do NOT share kinematics (strike rotates subfault
positions; engine.shared_kin_check), so each source keeps its own blend
and the stack needs per-channel (b1, b2) interleaved rows.

Layouts measured here (T=128, ng=10 contig, G=3, P=65 groups == the
bench 195-centroid bilateral, R=10, D=16 shift buckets):

  A: shipped structure -- one source per program, [3, T] group math;
  B: source pairs -- per-channel stack built as ONE static 2-row slice
     of an interleaved blend buffer + pltpu.repeat(.., 3) to [6, T],
     weights pre-packed (sublane j: source j%2, centroid j//2).

Both kernels compute identical math (B's operands are A's re-packed);
the value check pins them to f32-exact agreement.

Run: python benchmark/micro_window_b2.py [B R P D interleave]
"""

import functools
import sys
import time

import numpy as np

NW = 10
_F1, _F2, _F3, _F4, _F5, _F6, _CL, _SL, _FR0, _FR1 = range(10)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F32, I32 = jnp.float32, jnp.int32
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 65
    D = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    G, ng, T = 3, 10, 128
    INTERLEAVE = bool(int(sys.argv[5])) if len(sys.argv) > 5 else True
    N = 400  # window nodes (keeps ext VMEM-resident like the bench plan)
    s2 = 21  # second contig-pair stride (xu * nzw)

    rng = np.random.default_rng(0)
    ext = rng.normal(size=(N * ng, T)).astype(np.float32)
    nodes = rng.integers(0, N - s2 - 2, size=(B, R, P)).astype(np.int32)
    kks = rng.integers(0, D, size=(B, P, G)).astype(np.int32)
    wsp = rng.normal(size=(B, R, P, 4, 1)).astype(np.float32)
    wsp = np.broadcast_to(wsp, (B, R, P, 4, T)).copy()
    wm = rng.normal(size=(B, R, P, NW, G, 1)).astype(np.float32)
    wm = np.broadcast_to(wm, (B, R, P, NW, G, T)).copy()

    def group_math(w, blend, L):
        def b(r):
            return blend[r:r + 1]

        p1 = w[_F1] * b(0) + w[_F2] * b(1) + w[_F3] * b(2)
        p2 = w[_F4] * b(3) + w[_F5] * b(4)
        dd = w[_F1] * b(5) + w[_F2] * b(6) + w[_F3] * b(7)
        p1 = p1 + w[_F6] * b(8)
        dd = dd + w[_F6] * b(9)
        av = w[_CL] * p1 - w[_SL] * p2
        rv = w[_SL] * p1 + w[_CL] * p2
        ca = w[_FR0] * pltpu.roll(av, L - 1, 1) + w[_FR1] * av
        cr = w[_FR0] * pltpu.roll(rv, L - 1, 1) + w[_FR1] * rv
        cd = w[_FR0] * pltpu.roll(dd, L - 1, 1) + w[_FR1] * dd
        return ca, cr, cd

    def combine(acc, out_ref, si):
        a = jnp.zeros((1, T), F32)
        r_ = jnp.zeros((1, T), F32)
        d_ = jnp.zeros((1, T), F32)
        base = si * D * 3
        for d in range(D):
            amt = (T - d) % T
            a = a + pltpu.roll(acc[base + d * 3:base + d * 3 + 1, :], amt, 1)
            r_ = r_ + pltpu.roll(acc[base + d * 3 + 1:base + d * 3 + 2, :], amt, 1)
            d_ = d_ + pltpu.roll(acc[base + d * 3 + 2:base + d * 3 + 3, :], amt, 1)
        out_ref[0, 0, 3 * si + 0:3 * si + 1, :] = a
        out_ref[0, 0, 3 * si + 1:3 * si + 2, :] = r_
        out_ref[0, 0, 3 * si + 2:3 * si + 3, :] = d_

    # --- variant A: shipped structure (one source / program) --------------
    def kernel_a(node_ref, kk_ref, ext_ref, wsp_ref, w_ref, out_ref, acc):
        b = pl.program_id(0)
        r = pl.program_id(1)
        nbase = (b * jnp.int32(R) + r) * jnp.int32(P)
        kbase = b * jnp.int32(P)
        acc[...] = jnp.zeros((D * 3, T), F32)

        def group(p):
            nd = node_ref[nbase + p]
            ws = wsp_ref[0, 0, p]
            m1 = ext_ref[pl.ds(nd * jnp.int32(ng), 2 * ng), :]
            m2 = ext_ref[pl.ds((nd + jnp.int32(s2)) * jnp.int32(ng), 2 * ng), :]
            blend = (ws[0:1] * m1[0:ng] + ws[1:2] * m1[ng:2 * ng]
                     + ws[2:3] * m2[0:ng] + ws[3:4] * m2[ng:2 * ng])
            w = w_ref[0, 0, p]
            ca, cr, cd = group_math(w, blend, T)
            for g in range(G):
                kk = kk_ref[(kbase + p) * jnp.int32(G) + g]
                val = jnp.concatenate(
                    [ca[g:g + 1], cr[g:g + 1], cd[g:g + 1]], axis=0)
                acc[pl.ds(kk * jnp.int32(3), 3), :] += val

        K = 8

        def block(i, _):
            for j in range(K):
                group(i * K + jnp.int32(j))
            return 0

        jax.lax.fori_loop(0, P // K, block, 0)
        for j in range(P % K):
            group(jnp.int32((P // K) * K + j))
        combine(acc, out_ref, 0)

    # --- variant B: source pairs, [6, T] stacked group math ---------------
    # weights packed (sublane j: source j%2, centroid j//2); blends written
    # interleaved [2ng rows: (ch0 s1, ch0 s2, ch1 s1, ...)] so the stack for
    # channel ch is ONE static 2-row slice + a 3x sublane repeat.
    def kernel_b(node_ref, kk_ref, ext_ref, wsp_ref, w_ref, out_ref, acc):
        b = pl.program_id(0)
        r = pl.program_id(1)
        acc[...] = jnp.zeros((2 * D * 3, T), F32)

        def group(p):
            blends = []
            for si in range(2):
                nbase = ((b * jnp.int32(2) + si) * jnp.int32(R) + r) \
                    * jnp.int32(P)
                nd = node_ref[nbase + p]
                ws = wsp_ref[0, 0, p, si]
                m1 = ext_ref[pl.ds(nd * jnp.int32(ng), 2 * ng), :]
                m2 = ext_ref[
                    pl.ds((nd + jnp.int32(s2)) * jnp.int32(ng), 2 * ng), :]
                blends.append(
                    ws[0:1] * m1[0:ng] + ws[1:2] * m1[ng:2 * ng]
                    + ws[2:3] * m2[0:ng] + ws[3:4] * m2[ng:2 * ng])
            if INTERLEAVE:
                # interleave channels: rows (2ch + si)
                bi = jnp.stack(blends, axis=1).reshape(2 * ng, T)

                def b6(ch):
                    return pltpu.repeat(bi[2 * ch:2 * ch + 2], G, 0)  # [6, T]
            else:
                b1, b2 = blends

                def b6(ch):
                    return pltpu.repeat(
                        jnp.concatenate(
                            [b1[ch:ch + 1], b2[ch:ch + 1]], axis=0), G, 0)

            w = w_ref[0, 0, p]  # [NW, 6, T] packed
            p1 = w[_F1] * b6(0) + w[_F2] * b6(1) + w[_F3] * b6(2)
            p2 = w[_F4] * b6(3) + w[_F5] * b6(4)
            dd = w[_F1] * b6(5) + w[_F2] * b6(6) + w[_F3] * b6(7)
            p1 = p1 + w[_F6] * b6(8)
            dd = dd + w[_F6] * b6(9)
            av = w[_CL] * p1 - w[_SL] * p2
            rv = w[_SL] * p1 + w[_CL] * p2
            ca = w[_FR0] * pltpu.roll(av, T - 1, 1) + w[_FR1] * av
            cr = w[_FR0] * pltpu.roll(rv, T - 1, 1) + w[_FR1] * rv
            cd = w[_FR0] * pltpu.roll(dd, T - 1, 1) + w[_FR1] * dd
            for si in range(2):
                kbase = (b * jnp.int32(2) + si) * jnp.int32(P)
                for g in range(G):
                    j = 2 * g + si
                    kk = kk_ref[(kbase + p) * jnp.int32(G) + g]
                    val = jnp.concatenate(
                        [ca[j:j + 1], cr[j:j + 1], cd[j:j + 1]], axis=0)
                    acc[pl.ds(jnp.int32(si * D * 3) + kk * jnp.int32(3), 3),
                        :] += val

        K = 4

        def block(i, _):
            for j in range(K):
                group(i * K + jnp.int32(j))
            return 0

        jax.lax.fori_loop(0, P // K, block, 0)
        for j in range(P % K):
            group(jnp.int32((P // K) * K + j))
        combine(acc, out_ref, 0)
        combine(acc, out_ref, 1)

    with jax.enable_x64(False):
        @jax.jit
        def run_a(nodes, kks, ext, wsp, wm):
            return pl.pallas_call(
                kernel_a,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(B, R),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, P, 4, T),
                                     lambda b, r, *_: (b, r, 0, 0, 0)),
                        pl.BlockSpec((1, 1, P, NW, G, T),
                                     lambda b, r, *_: (b, r, 0, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 1, 8, T),
                                           lambda b, r, *_: (b, r, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((D * 3, T), F32)],
                ),
                out_shape=jax.ShapeDtypeStruct((B, R, 8, T), F32),
            )(nodes.reshape(-1), kks.reshape(-1), ext, wsp, wm)

        # packed operands for B
        wm_b = wm.reshape(B // 2, 2, R, P, NW, G, T)
        wm_b = np.moveaxis(wm_b, 1, 5)  # [B/2, R, P, NW, G, 2, T]
        wm_b = wm_b.reshape(B // 2, R, P, NW, 2 * G, T)
        wsp_b = wsp.reshape(B // 2, 2, R, P, 4, T).transpose(0, 2, 3, 1, 4, 5)

        @jax.jit
        def run_b(nodes, kks, ext, wsp_b, wm_b):
            return pl.pallas_call(
                kernel_b,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(B // 2, R),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, P, 2, 4, T),
                                     lambda b, r, *_: (b, r, 0, 0, 0, 0)),
                        pl.BlockSpec((1, 1, P, NW, 2 * G, T),
                                     lambda b, r, *_: (b, r, 0, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 1, 8, T),
                                           lambda b, r, *_: (b, r, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((2 * D * 3, T), F32)],
                ),
                out_shape=jax.ShapeDtypeStruct((B // 2, R, 8, T), F32),
            )(nodes.reshape(-1), kks.reshape(-1), ext, wsp_b, wm_b)

    import jax.numpy as jnp  # noqa: F811
    args_a = (jnp.asarray(nodes), jnp.asarray(kks), jnp.asarray(ext),
              jnp.asarray(wsp), jnp.asarray(wm))
    args_b = (jnp.asarray(nodes), jnp.asarray(kks), jnp.asarray(ext),
              jnp.asarray(wsp_b), jnp.asarray(wm_b))

    def timeit(fn, args, n=10, trials=4):
        out = fn(*args)
        float(jnp.ravel(out)[0])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            outs = [fn(*args) for _ in range(n)]
            float(jnp.ravel(outs[-1])[0])
            best = min(best, (time.time() - t0) / n)
        return best, out

    ta, oa = timeit(run_a, args_a)
    tb, ob = timeit(run_b, args_b)
    # B's out rows: source pair (2b, 2b+1) -> channels [0:3] and [3:6]
    ob2 = np.asarray(ob).reshape(B // 2, R, 8, T)
    oa2 = np.asarray(oa)
    err = max(
        float(np.abs(ob2[:, :, 0:3] - oa2[0::2, :, 0:3]).max()),
        float(np.abs(ob2[:, :, 3:6] - oa2[1::2, :, 0:3]).max()),
    ) / max(float(np.abs(oa2[:, :, 0:3]).max()), 1e-30)
    print(f"A shipped [3,T] groups:   {ta*1e3:7.3f} ms  "
          f"({B*R*P/ta/1e6:.1f} M groups/s)", flush=True)
    print(f"B packed  [6,T] pairs:    {tb*1e3:7.3f} ms  "
          f"({B*R*P/tb/1e6:.1f} M groups/s, rel err {err:.2e})", flush=True)
    print(f"B/A speedup: {ta/tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()
