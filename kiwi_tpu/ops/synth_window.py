"""Pallas TPU kernel: VMEM-resident-window grouped synthesis (VPU-only).

The production finite-source forward (synth._grouped_accumulate under vmap)
is ~60x off the HBM roofline on TPU: XLA materializes the per-centroid
gathered rows, time slices and tap blends as HBM round trips (measured
86 ms for a 64-source x 10-receiver x 195-centroid bilateral batch whose
intrinsic traffic is ~1.3 ms; at 256 sources the slice buffer alone is
33 GB and OOMs).  This kernel keeps the WHOLE edge-extended GF window
resident in VMEM (finite-source search windows are a few MB) and runs the
entire per-group pipeline -- 4-row bilinear gather, fractional time shift,
moment-weight contraction, accumulation -- on-chip with zero HBM round
trips.

Lessons from the shelved (now removed) round-1 MXU kernel applied here:
  * no dot_general at all: Mosaic lowers f32 dots through one bf16 MXU pass
    (~2^-8 error) and dynamic-rotate outputs force relayouts in front of
    the MXU.  The moment contraction has only ~26 effective terms per
    centroid (seismogram.f90:171-251's weight table is sparse), so it runs
    on the VPU as scalar-broadcast row FMAs in full f32.
  * pltpu.roll feeding VPU math is fast (the round-1 ablation's rolls-only
    case); it was the roll->MXU layout conversion that cost 10x.
  * all index/scalar arithmetic is traced in 32-bit mode (the package
    enables jax x64 globally; i64 scalars won't lower).

Semantics identical to synth._grouped_accumulate (same window extension,
2-tap fractional shift, per-centroid backazimuth rotation folded into the
weights); float32 rounding differs in reduction order only.

Layout (v5e/v5p):
  * ext rows flat [N*ng, T] (T = nt_ext padded to k*128 lanes, k*128 <=
    T_MAX): a group's 4 bilinear neighbors are unaligned dynamic sublane
    slices (natively supported; lane offsets are not).  Long time axes are
    just wider vectors -- every per-centroid op scales linearly in T while
    weights stay [.., 128] and are lane-tiled in-kernel (_rep), so long
    windows keep the kernel's efficiency instead of falling back to the
    XLA gather/slice paths (sparse_trace.f90:597-707 handles arbitrary
    strip lengths; this is the TPU rendering of that).
  * the per-centroid integer time shift kk is NOT applied as a dynamic
    lane roll (scalar-amount rolls measured ~6.3 ms of an 11.3 ms kernel,
    regardless of roll width or count per centroid): contributions are
    accumulated into per-kk SHIFT BUCKETS via a dynamic-sublane-offset
    VMEM read-modify-write (near-free, like the slices), and the D =
    nt_ext - nt_out buckets are combined with D static rolls at program
    end.  The used output range never wraps because the plan bounds kk by
    nt_ext - nt_out - 1 and pack_ext zero-pads the time axis to 128.
  * per-centroid weights ride in a blocked VMEM operand as lane-broadcast
    rows (compact [NW, 1] operands with in-kernel broadcast measured 28%
    slower; scalar vmem->sreg reads stall the VPU); integer shift/node
    indices ride in SMEM via scalar prefetch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# wlane row indices (per centroid, lane-broadcast weight rows)
_F1, _F2, _F3, _F4, _F5, _F6, _CL, _SL, _FR0, _FR1 = range(10)
NW = 10  # weight rows per centroid


def _contract(w, c, ng):
    """Channel contraction + backazimuth rotation of pre-tap rows c
    [>=ng, 128] -> stacked [3, 128] (away, right, down).  ng is passed
    explicitly: the DMA variant's c carries pad rows up to the 8-aligned
    row pitch, so c.shape[0] is NOT the component count."""
    p1 = (w[_F1:_F1 + 1] * c[0:1] + w[_F2:_F2 + 1] * c[1:2]
          + w[_F3:_F3 + 1] * c[2:3])
    p2 = w[_F4:_F4 + 1] * c[3:4] + w[_F5:_F5 + 1] * c[4:5]
    dd = (w[_F1:_F1 + 1] * c[5:6] + w[_F2:_F2 + 1] * c[6:7]
          + w[_F3:_F3 + 1] * c[7:8])
    if ng == 10:
        p1 = p1 + w[_F6:_F6 + 1] * c[8:9]
        dd = dd + w[_F6:_F6 + 1] * c[9:10]
    av = w[_CL:_CL + 1] * p1 - w[_SL:_SL + 1] * p2
    rv = w[_SL:_SL + 1] * p1 + w[_CL:_CL + 1] * p2
    return jnp.concatenate([av, rv, dd], axis=0)


def _bucket_combine(acc, D, BP, T, out_ref):
    """acc [D*BP, T] shift buckets -> output rows via D static rolls.
    out[t] = sum_d acc[d][(t + d) mod T]; used lanes never wrap (the
    plan bounds kk by nt_ext - nt_out - 1 and pack_ext zero-pads)."""
    a_acc = jnp.zeros((1, T), F32)
    r_acc = jnp.zeros((1, T), F32)
    d_acc = jnp.zeros((1, T), F32)
    for d in range(D):
        amt = (T - d) % T
        a_acc = a_acc + pltpu.roll(acc[d * BP:d * BP + 1, :], amt, 1)
        r_acc = r_acc + pltpu.roll(acc[d * BP + 1:d * BP + 2, :], amt, 1)
        d_acc = d_acc + pltpu.roll(acc[d * BP + 2:d * BP + 3, :], amt, 1)
    out_ref[0, 0, 0:1, :] = a_acc
    out_ref[0, 0, 1:2, :] = r_acc
    out_ref[0, 0, 2:3, :] = d_acc
    out_ref[0, 0, 3:8, :] = jnp.zeros((5, T), F32)


def _rep(w, NT):
    """Lane-tile a [.., 128] weight operand to [.., NT*128].  Weight rows
    are lane-constant (broadcast from [.., 1]), so tile-vs-element repeat
    semantics are irrelevant; Mosaic lowers this to vreg copies."""
    return w if NT == 1 else pltpu.repeat(w, NT, w.ndim - 1)


def bucket_pitch(T):
    """Sublane rows per shift bucket in the acc scratch: 3 channel rows,
    padded to 8 on multi-tile-wide arrays so the dynamic-sublane RMW
    offset kk*pitch is provably 8-aligned (same Mosaic constraint as
    row_pitch)."""
    return 3 if T <= 128 else 8


def ext_layout(cfg):
    """(T, row_pitch) of the packed ext for a plan config.

    Multi-tile-wide arrays (T > 128) only admit dynamic sublane loads at
    provably 8-aligned offsets, and the DMA variant's memref slices need
    8-aligned slice SHAPES regardless of T (Mosaic: 'cannot statically
    prove that index in dimension 0 is a multiple of 8' / 'Slice shape
    along dimension 0 must be aligned to tiling (8)').  So nodes keep the
    compact ng pitch only when the window is single-tile AND VMEM-resident
    (unaligned dynamic loads are natively supported there); everything
    else pads nodes to an 8-multiple pitch and the kernel computes row
    offsets as node * pitch -- an affine expression Mosaic CAN prove
    aligned."""
    nt_ext = cfg.nt_out + cfg.s_len
    t = -(-nt_ext // 128) * 128
    n = cfg.nxw * cfg.nzw
    if t <= 128 and n * cfg.ng * t * 4 <= VMEM_RESIDENT_BYTES:
        return t, cfg.ng
    return t, -(-cfg.ng // 8) * 8


def _g_loop(G, p, centroid):
    """Per-centroid loop: fully unrolled up to 4 (fastest; measured 9.6 ms
    vs fori's 11.7 ms at G=4), block-unrolled by 4 inside a fori beyond
    that to bound kernel code size / register pressure."""
    if G <= 4:
        for g in range(G):
            centroid(p, jnp.int32(g))
        return
    full, rem = divmod(G, 4)

    def body(i, _):
        for j in range(4):
            centroid(p, i * 4 + jnp.int32(j))
        return 0

    jax.lax.fori_loop(0, full, body, 0)
    for j in range(rem):
        centroid(p, jnp.int32(full * 4 + j))


def _kernel(G, ng, ngp, Pb, Ptot, rr, NP, D, T,
            node_ref, kk_ref,  # scalar prefetch (SMEM)
            ext_ref, wsp_ref, w_ref,  # VMEM
            out_ref, acc):
    NT = T // 128
    BP = bucket_pitch(T)
    b = pl.program_id(0)
    r = pl.program_id(1)
    ip = pl.program_id(2)  # P-axis block (bounds the double-buffered VMEM
    # weight blocks; acc persists across ip steps of one (b, r))
    nb = pl.num_programs(0)
    brp = (b * jnp.int32(rr) + r) * jnp.int32(Ptot) + ip * jnp.int32(Pb)
    sbase = jnp.int32(nb) * jnp.int32(rr) * jnp.int32(Ptot)  # strides here
    s1 = node_ref[sbase + 0]
    s2 = node_ref[sbase + 1]
    s3 = node_ref[sbase + 2]

    @pl.when(ip == 0)
    def _zero():
        acc[...] = jnp.zeros((D * BP, T), F32)

    def group(p):
        nd = node_ref[brp + p]  # node index, pre-clamped
        ws = _rep(wsp_ref[0, 0, p], NT)  # [4, T] lane-broadcast weights
        # row offsets as (node + stride) * pitch: with ngp % 8 == 0 (the
        # T > 128 layout) Mosaic can prove the sublane alignment
        blend = (
            ws[0:1] * ext_ref[pl.ds(nd * jnp.int32(ngp), ng), :]
            + ws[1:2] * ext_ref[pl.ds((nd + s1) * jnp.int32(ngp), ng), :]
            + ws[2:3] * ext_ref[pl.ds((nd + s2) * jnp.int32(ngp), ng), :]
            + ws[3:4] * ext_ref[pl.ds((nd + s3) * jnp.int32(ngp), ng), :]
        )  # [ng, T]
        sb = pltpu.roll(blend, T - 1, 1)  # static: sb[t] = blend[t+1]

        def centroid(p, g):
            kk = kk_ref[(brp + p) * jnp.int32(G) + g]
            w = _rep(w_ref[0, 0, p, g], NT)  # [NW, T] weight rows
            # pre-shift taps: c[t] = (1-fr)*blend[t+1] + fr*blend[t], so the
            # per-centroid contribution is c[t + kk] -- accumulated into the
            # kk shift bucket instead of dynamically rolled (scalar-amount
            # lane rolls measured ~6.3 ms of the 11.3 ms kernel; the bucket
            # RMW at a dynamic SUBLANE offset is near-free)
            c = w[_FR0:_FR0 + 1] * sb + w[_FR1:_FR1 + 1] * blend
            acc[pl.ds(kk * jnp.int32(BP), 3), :] += _contract(w, c, ng)

        _g_loop(G, p, centroid)

    # block the group loop so each fori body carries several independent
    # groups: Mosaic interleaves them, hiding dependency stalls (measured
    # 8.5 -> 5.3 ms for the 64x10x195 batch going from 1 to 8 groups per
    # body at G=3); ~24 unrolled centroid blocks per body stays clear of
    # register-spill territory
    K = max(1, min(8, 24 // max(G, 1)))

    def block(i, _):
        for j in range(K):
            group(i * K + jnp.int32(j))
        return 0

    jax.lax.fori_loop(0, Pb // K, block, 0)
    for j in range(Pb % K):
        group(jnp.int32((Pb // K) * K + j))

    @pl.when(ip == jnp.int32(NP - 1))
    def _emit():
        _bucket_combine(acc, D, BP, T, out_ref)


def _kernel_dma(G, ng, ngp, Pb, Ptot, rr, NP, D, T,
                node_ref, kk_ref,  # scalar prefetch (SMEM)
                ext_ref, wsp_ref, w_ref,  # ext in HBM/ANY; rest VMEM
                out_ref, acc, rows, sems):
    """Variant for windows too large for VMEM residency: the 4 bilinear
    neighbor rows of each group are DMA'd HBM->VMEM double-buffered one
    group ahead (the per-group traffic is 4*ng*T*4 bytes, so the
    pipeline hides it behind the group's VPU math)."""
    NT = T // 128
    BP = bucket_pitch(T)
    b = pl.program_id(0)
    r = pl.program_id(1)
    ip = pl.program_id(2)
    nb = pl.num_programs(0)
    brp = (b * jnp.int32(rr) + r) * jnp.int32(Ptot) + ip * jnp.int32(Pb)
    sbase = jnp.int32(nb) * jnp.int32(rr) * jnp.int32(Ptot)
    offs = (jnp.int32(0), node_ref[sbase + 0], node_ref[sbase + 1],
            node_ref[sbase + 2])

    @pl.when(ip == 0)
    def _zero():
        acc[...] = jnp.zeros((D * BP, T), F32)

    def dma(p, slot, a):
        base = (node_ref[brp + p] + offs[a]) * jnp.int32(ngp)
        # copy the full row pitch: memref slice SHAPES must be 8-aligned
        # too; the pad rows are zeros and drop out of the contraction
        return pltpu.make_async_copy(
            ext_ref.at[pl.ds(base, ngp), :],
            rows.at[slot, a],
            sems.at[slot, a],
        )

    def start(p, slot):
        for a in range(4):
            dma(p, slot, a).start()

    start(0, jnp.int32(0))

    def group(p, _):
        slot = jax.lax.rem(p, jnp.int32(2))
        nslot = jax.lax.rem(p + jnp.int32(1), jnp.int32(2))

        @pl.when(p + 1 < jnp.int32(Pb))
        def _lookahead():
            start(p + 1, nslot)

        for a in range(4):
            dma(p, slot, a).wait()

        ws = _rep(wsp_ref[0, 0, p], NT)
        blend = (
            ws[0:1] * rows[slot, 0]
            + ws[1:2] * rows[slot, 1]
            + ws[2:3] * rows[slot, 2]
            + ws[3:4] * rows[slot, 3]
        )  # [ng, T]
        sb = pltpu.roll(blend, T - 1, 1)

        def centroid(p, g):
            kk = kk_ref[(brp + p) * jnp.int32(G) + g]
            w = _rep(w_ref[0, 0, p, g], NT)
            c = w[_FR0:_FR0 + 1] * sb + w[_FR1:_FR1 + 1] * blend
            acc[pl.ds(kk * jnp.int32(BP), 3), :] += _contract(w, c, ng)

        _g_loop(G, p, centroid)
        return 0

    jax.lax.fori_loop(0, Pb, group, 0)

    @pl.when(ip == jnp.int32(NP - 1))
    def _emit():
        _bucket_combine(acc, D, BP, T, out_ref)


# windows at or below this live whole in VMEM; larger ones stay in HBM with
# per-group double-buffered row DMA (v5e/v5p VMEM ~ 16 MB/core)
VMEM_RESIDENT_BYTES = 10 * 1024 * 1024
# total scoped-VMEM budget for the kernel: window + double-buffered weight
# blocks + scratch must fit.  The hard limit is 16 MB/core and Mosaic's
# stack frame adds ~3 MB on top of the operand accounting (measured: a
# predicted-13.3 MB configuration allocated 16.4 MB), so budget well under.
VMEM_BUDGET_BYTES = 11 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("G", "ng", "ngp", "nshift",
                                             "interpret"))
def window_forward(ext_flat, node_rows, strides3, kks, wsp, wmeta,
                   G, ng, nshift, ngp=None, interpret=False):
    """ard f32[B, R, 3, 128] from a GF window (VMEM-resident when it fits,
    HBM + double-buffered row DMA otherwise).

    ext_flat: f32[N*row_pitch(ng, T), T] edge-extended rows, time
    zero-padded to a multiple of 128 lanes (T <= T_MAX), node rows padded
    to row_pitch;
    node_rows: i32[B, R, P] bilinear-origin NODE index, pre-clamped so all
    four neighbor slices stay in range; strides3: i32[3] neighbor node
    strides (zu, xu*nzw, xu*nzw + zu); kks: i32[B, R, P, G] lane slice
    starts (in [0, nt_ext - nt_out - 1]); wsp: f32[B, R, P, 4, 128]
    lane-broadcast bilinear weights; wmeta: f32[B, R, P, G, NW, 128]
    lane-broadcast per-centroid weight rows (f1..f6, cos_l, sin_l, 1-frac,
    frac; invalid centroids carry zero f's).
    """
    bb, rr, P = node_rows.shape
    D = int(nshift)
    T = int(ext_flat.shape[1])  # lane width: nt_ext padded to k*128
    if ngp is None:  # standalone callers: infer the compact-vs-padded rule
        ngp = ng if T <= 128 else -(-ng // 8) * 8
    bp = bucket_pitch(T)
    ext_bytes = int(ext_flat.shape[0]) * T * 4
    resident = ext_bytes <= VMEM_RESIDENT_BYTES

    # split the P axis over a third grid dimension when the per-(b, r)
    # weight blocks would blow scoped VMEM: Mosaic double-buffers blocked
    # operands, so a P=380, G=4 plan would otherwise request ~28 MB
    # against the 16 MB limit.  acc persists across the ip steps of one
    # (b, r); the output is emitted on the last step.
    per_p = (G * NW + 4) * 128 * 4
    fixed = (ext_bytes if resident else 2 * 4 * ngp * T * 4) \
        + (D * bp + 8 + 3 * ngp) * T * 4
    budget = max(VMEM_BUDGET_BYTES - fixed, 2 * per_p)
    Pb = int(max(1, min(P, budget // (2 * per_p))))
    NP = -(-P // Pb)
    Pb = -(-P // NP)  # balance the blocks
    Ptot = NP * Pb
    if Ptot > P:  # pad: zero weights make padded groups no-ops
        padw = ((0, 0), (0, 0), (0, Ptot - P))
        node_rows = jnp.pad(node_rows, padw)
        kks = jnp.pad(kks, padw + ((0, 0),))
        wsp = jnp.pad(wsp, padw + ((0, 0), (0, 0)))
        wmeta = jnp.pad(wmeta, padw + ((0, 0), (0, 0), (0, 0)))

    with jax.enable_x64(False):
        nodes_flat = jnp.concatenate(
            [node_rows.reshape(-1).astype(I32), strides3.astype(I32)]
        )
        if resident:
            kernel = functools.partial(
                _kernel, G, ng, ngp, Pb, Ptot, rr, NP, D, T)
            ext_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((D * bp, T), F32)]
        else:
            kernel = functools.partial(
                _kernel_dma, G, ng, ngp, Pb, Ptot, rr, NP, D, T)
            ext_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.VMEM((D * bp, T), F32),
                pltpu.VMEM((2, 4, ngp, T), F32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ]
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bb, rr, NP),
                in_specs=[
                    ext_spec,
                    pl.BlockSpec((1, 1, Pb, 4, 128),
                                 lambda b, r, ip, *_: (b, r, ip, 0, 0)),
                    pl.BlockSpec((1, 1, Pb, G, NW, 128),
                                 lambda b, r, ip, *_: (b, r, ip, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, 8, T),
                                       lambda b, r, ip, *_: (b, r, 0, 0)),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((bb, rr, 8, T), F32),
            interpret=interpret,
        )(nodes_flat, kks.reshape(-1).astype(I32), ext_flat,
          wsp.astype(F32), wmeta.astype(F32))
    return out[:, :, :3, :]


# ---------------------------------------------------------------------------
# engine-facing wrapper
# ---------------------------------------------------------------------------


# longest time axis the kernel takes (k*128 lanes).  The VPU work per
# centroid scales linearly with T, so long windows run at the same
# efficiency as the 128-lane case (vs the XLA fallback's ~60x-off-roofline
# gather/slice formulation); the cap bounds the shift-bucket scratch
# (D*3*T*4 bytes) and the blend transients against scoped VMEM.
T_MAX = 2048


def usable(cfg):
    """Window-kernel applicability: time axis within T_MAX lanes and a
    standard GF component count.  Window size is unconstrained -- windows
    beyond VMEM_RESIDENT_BYTES take the HBM + per-group-DMA kernel
    variant.  Long shift ranges must leave the bucket scratch + blend
    transients inside the scoped-VMEM budget."""
    nt_ext = cfg.nt_out + cfg.s_len
    t = -(-nt_ext // 128) * 128
    scratch = (cfg.s_len * bucket_pitch(t) + 8 + 3 * cfg.ng) * t * 4
    return (nt_ext <= T_MAX and cfg.ng in (8, 10)
            and scratch <= VMEM_BUDGET_BYTES // 2)


def pack_ext(ext, cfg):
    """materialize_window output [nxw, nzw, ng, nt_ext] -> flat
    [N*row_pitch, T]: time zero-padded to a multiple of 128 lanes, node
    rows padded to the layout's row pitch (see ext_layout)."""
    n = cfg.nxw * cfg.nzw
    nt_ext = ext.shape[-1]
    t, ngp = ext_layout(cfg)
    e3 = ext.reshape(n, cfg.ng, nt_ext)
    pad_rows = ngp - cfg.ng
    if pad_rows or nt_ext < t:
        e3 = jnp.pad(e3, ((0, 0), (0, pad_rows), (0, t - nt_ext)))
    return e3.reshape(n * ngp, t)


def pack_kinematics(cfg, kin, G):
    """Batched kinematics dict ([B, R, C, ...] arrays) -> kernel operands.

    kin must carry f [.., C, 6], cos_l, sin_l (from _centroid_kinematics),
    wsp, ixs, izs, ish, frac, valid.
    """
    ng = cfg.ng
    bb, rr, C = kin["ish"].shape
    P = C // G
    ixs = kin["ixs"][:, :, ::G]  # [B, R, P, 2]
    izs = kin["izs"][:, :, ::G]
    zu = cfg.zunder if cfg.interpolate else 1
    xu = cfg.xunder if cfg.interpolate else 1
    node = ixs[..., 0] * cfg.nzw + izs[..., 0]
    # clamp so node + max stride stays in range (invalid centroids have
    # zero weights; their rows just need to be in bounds); the kernel
    # multiplies by the row pitch itself (alignment provability, row_pitch)
    max_stride = xu * cfg.nzw + zu
    node = jnp.clip(node, 0, cfg.nxw * cfg.nzw - 1 - max_stride)
    node_rows = node.astype(I32)
    strides3 = jnp.array([zu, xu * cfg.nzw, xu * cfg.nzw + zu], I32)

    start_base = cfg.s_base + cfg.s_len - 1  # == out_it0 - e0 - 1
    kk = start_base - kin["ish"].reshape(bb, rr, P, G)
    kk = jnp.clip(kk, 0, (cfg.nt_out + cfg.s_len) - cfg.nt_out - 1).astype(I32)

    vmask = jnp.where(kin["valid"], 1.0, 0.0).reshape(bb, rr, P, G)
    f = kin["f"].reshape(bb, rr, P, G, 6) * vmask[..., None]
    cl = kin["cos_l"].reshape(bb, rr, P, G)
    sl = kin["sin_l"].reshape(bb, rr, P, G)
    fr = kin["frac"].reshape(bb, rr, P, G)
    # lane-broadcast weight rows [B, R, P, G, NW, 128]: the kernel's inner
    # loop is then pure vector FMAs (scalar vmem->sreg reads stall the VPU
    # pipeline; measured 38 ms -> target ~6 ms for the 64x10x195 batch)
    wrows = jnp.stack(
        [f[..., 0], f[..., 1], f[..., 2], f[..., 3], f[..., 4], f[..., 5],
         cl, sl, 1.0 - fr, fr],
        axis=-1,
    ).astype(F32)  # [B, R, P, G, NW]
    wmeta = jnp.broadcast_to(wrows[..., None], wrows.shape + (128,))
    wsp4 = kin["wsp"][:, :, ::G].astype(F32)  # [B, R, P, 4]
    wsp = jnp.broadcast_to(wsp4[..., None], wsp4.shape + (128,))
    return node_rows, strides3, kk, wsp, wmeta


def synthesize_ard_batch(ext_flat, cfg, kin, G, interpret=False):
    """ard f32[B, R, 3, nt_out] for a (source, receiver) batch."""
    node_rows, strides3, kk, wsp, wmeta = pack_kinematics(cfg, kin, G)
    # kk is clipped to [0, nt_ext - nt_out - 1] => s_len shift buckets
    _t, ngp = ext_layout(cfg)
    out = window_forward(ext_flat, node_rows, strides3, kk, wsp, wmeta,
                         G=G, ng=cfg.ng, ngp=ngp, nshift=cfg.s_len,
                         interpret=interpret)
    return out[..., : cfg.nt_out]
