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
  * the moment contraction runs STACKED over a group's G centroids on the
    sublane axis: weight rows are packed [NW, G, 128] so each channel
    partial is a [G, T] FMA against a sublane-broadcast blend row, and the
    2-tap fractional shift is applied AFTER the contraction (both linear
    and time-invariant, so the order swap is exact up to f32
    reassociation).  This replaces ~G*14 single-sublane row FMAs per group
    (each burning a full vreg issue slot for 1/8 of its lanes) with ~16
    [G, T] FMAs shared by the whole group.  Groups with G > 8 are split
    into ceil(G/8) sub-groups at pack time (sub-groups re-fetch the same
    node rows; sublane stacks cap at the 8-row vreg height).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# wlane row indices (per centroid, lane-broadcast weight rows)
_F1, _F2, _F3, _F4, _F5, _F6, _CL, _SL, _FR0, _FR1 = range(10)
NW = 10  # weight rows per centroid


def _group_math(w, blend, ng, L):
    """Group-stacked synthesis math.

    w: [NW, G, L] lane-tiled weight rows for the group's G centroids;
    blend: [>=ng, L] bilinear-blended GF rows shared by the group (pad
    rows beyond ng are never touched -- rows are sliced explicitly).
    Returns (ca, cr, cd) [G, L]: per-centroid away/right/down rows,
    channel-contracted, backazimuth-rotated and 2-tap fractionally
    shifted.  The tap blend commutes with the (linear, time-pointwise)
    contraction, so applying it on the 3 channel rows instead of the ng
    GF rows is exact up to f32 reassociation and saves ~2x the FMAs.
    Implements seismogram.f90:171-251's weight mapping (see
    synth._group_weights) stacked over the sublane axis.

    When L packs S receiver windows of T lanes each (S > 1), the tap roll
    wraps window s+1's first lane into window s's last lane: lane T-1 of
    each window is therefore unspecified.  That lane is never part of the
    valid output (T >= nt_out + s_len and the plan bounds kk by s_len-1,
    so valid lanes stop at nt_out - 1 + kk < T - 1); callers slice
    [..., :nt_out]."""
    def b(r):
        return blend[r:r + 1]

    p1 = w[_F1] * b(0) + w[_F2] * b(1) + w[_F3] * b(2)
    p2 = w[_F4] * b(3) + w[_F5] * b(4)
    dd = w[_F1] * b(5) + w[_F2] * b(6) + w[_F3] * b(7)
    if ng == 10:
        p1 = p1 + w[_F6] * b(8)
        dd = dd + w[_F6] * b(9)
    av = w[_CL] * p1 - w[_SL] * p2
    rv = w[_SL] * p1 + w[_CL] * p2
    # c[t] = (1-frac)*x[t+1] + frac*x[t]  (sparse_trace.f90's 2-tap shift)
    ca = w[_FR0] * pltpu.roll(av, L - 1, 1) + w[_FR1] * av
    cr = w[_FR0] * pltpu.roll(rv, L - 1, 1) + w[_FR1] * rv
    cd = w[_FR0] * pltpu.roll(dd, L - 1, 1) + w[_FR1] * dd
    return ca, cr, cd


def _scatter_group(G, BP, acc, kk_ref, kbase, ca, cr, cd):
    """Accumulate each centroid's [3, T] channel rows into its kk shift
    bucket (dynamic-sublane-offset RMW; see module docstring).  Probed on
    v5e: forcing kk static changes nothing (7.2 vs 7.1 ms on the 64x10x195
    batch), so the dynamic-offset RMW chain is NOT a bottleneck."""
    for g in range(G):
        kk = kk_ref[kbase + g]
        val = jnp.concatenate([ca[g:g + 1], cr[g:g + 1], cd[g:g + 1]], axis=0)
        acc[pl.ds(kk * jnp.int32(BP), 3), :] += val


def _bucket_combine(acc, D, BP, L, out_ref):
    """acc [D*BP, L] shift buckets -> output rows via D static rolls.
    out[t] = sum_d acc[d][(t + d) mod L]; used lanes never wrap (the
    plan bounds kk by nt_ext - nt_out - 1 and pack_ext zero-pads).  When
    L packs S receiver windows, the roll drags window s+1's head into
    window s's last d lanes -- all beyond nt_out (see _group_math), so
    per-window rolls are unnecessary."""
    a_acc = jnp.zeros((1, L), F32)
    r_acc = jnp.zeros((1, L), F32)
    d_acc = jnp.zeros((1, L), F32)
    for d in range(D):
        amt = (L - d) % L
        a_acc = a_acc + pltpu.roll(acc[d * BP:d * BP + 1, :], amt, 1)
        r_acc = r_acc + pltpu.roll(acc[d * BP + 1:d * BP + 2, :], amt, 1)
        d_acc = d_acc + pltpu.roll(acc[d * BP + 2:d * BP + 3, :], amt, 1)
    out_ref[0, 0, 0:1, :] = a_acc
    out_ref[0, 0, 1:2, :] = r_acc
    out_ref[0, 0, 2:3, :] = d_acc
    out_ref[0, 0, 3:8, :] = jnp.zeros((5, L), F32)


class _WRows:
    """Adapter presenting a [NW*G, L] stacked weight array as the [NW]-
    indexable w operand _group_math expects (w[i] -> [G, L])."""

    def __init__(self, arr, G):
        self.arr, self.G = arr, G

    def __getitem__(self, i):
        return self.arr[i * self.G:(i + 1) * self.G]


def _wextract(blk, lp, L, strategy):
    """Extract lane lp of a compact weight block [WR, 128] and broadcast
    it across L lanes -> [WR, L].  Exact: the reduce path sums a one-hot
    mask (single nonzero term); the roll path moves the lane to 0.

    This is the compact-wmeta layout's on-chip half: the host-side
    lane-broadcast wmeta ([B, R, P, NW, G, 128]) pays an 8/G-fold sublane
    pad on HBM (G=1 eikonal plans: 6.6 GB physical per 96-source chunk,
    the whole kernel runtime) while the real information is P*(NW*G+4)
    scalars; shipping it compact cuts the kernel's HBM traffic ~400x at
    the cost of ~20 VPU ops per group."""
    if strategy == "roll":
        rolled = pltpu.roll(blk, (jnp.int32(128) - lp) % jnp.int32(128), 1)
        col = rolled[:, 0:1]
    else:  # reduce
        lane = jax.lax.broadcasted_iota(I32, blk.shape, 1)
        col = jnp.sum(jnp.where(lane == lp, blk, 0.0), axis=1, keepdims=True)
    return jnp.broadcast_to(col, (blk.shape[0], L))


def _rep(w, NT):
    """Lane-tile a [.., 128] weight operand to [.., NT*128].  Weight rows
    are lane-constant (broadcast from [.., 1]), so tile-vs-element repeat
    semantics are irrelevant; Mosaic lowers this to vreg copies."""
    return w if NT == 1 else pltpu.repeat(w, NT, w.ndim - 1)


def _widen(w, S, NT):
    """Widen a per-receiver-tile weight operand [.., S*128] to the full
    lane width [.., S*NT*128]: receiver window s's values live in source
    tile s and must tile that window's NT lane-tiles."""
    if NT == 1:
        return w
    if S == 1:
        return _rep(w, NT)
    parts = [_rep(w[..., s * 128:(s + 1) * 128], NT) for s in range(S)]
    return jnp.concatenate(parts, axis=-1)


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


def _k_blocking(G, NT):
    """Groups unrolled per fori body: enough independent groups to let
    Mosaic interleave them (hiding the acc RMW dependency chain; measured
    8.5 -> 5.3 ms for the 64x10x195 batch going from 1 to 8 bodies at
    G=3), scaled down for wide time axes so the live [G, NT*128] vreg set
    stays clear of register-spill territory."""
    return max(1, min(8, 24 // max(G, 1)) // max(NT, 1))


def _kernel(G, ng, ngp, Pb, Ptot, rr, NP, D, T, S, contig,
            node_ref, kk_ref,  # scalar prefetch (SMEM)
            ext_ref, wsp_ref, w_ref,  # VMEM
            out_ref, acc):
    """rr is the receiver-BLOCK count (padded receivers / S); each program
    synthesizes S receivers side by side in the lane axis (their shift
    buckets are shared: kk derives from the centroid time only,
    receiver-independent), so the group math, taps and scatter RMWs
    amortize S-fold; only the 4-neighbor gathers stay per-receiver."""
    NT = T // 128
    L = S * T
    BP = bucket_pitch(L)
    b = pl.program_id(0)
    r = pl.program_id(1)  # receiver block
    ip = pl.program_id(2)  # P-axis block (bounds the double-buffered VMEM
    # weight blocks; acc persists across ip steps of one (b, r))
    nb = pl.num_programs(0)
    brp = (b * jnp.int32(rr) + r) * jnp.int32(Ptot) + ip * jnp.int32(Pb)
    # kks is stored ONCE per source [B, 1, Ptot, G]: the integer shift
    # derives from the centroid time only (receiver-independent)
    kkp = b * jnp.int32(Ptot) + ip * jnp.int32(Pb)
    # node_rows is laid out per RECEIVER [B, rr*S, Ptot]; strides follow
    sbase = jnp.int32(nb) * jnp.int32(rr * S) * jnp.int32(Ptot)
    s1 = node_ref[sbase + 0]
    s2 = node_ref[sbase + 1]
    s3 = node_ref[sbase + 2]
    nbase = [
        ((b * jnp.int32(rr) + r) * jnp.int32(S) + s) * jnp.int32(Ptot)
        + ip * jnp.int32(Pb)
        for s in range(S)
    ]

    @pl.when(ip == 0)
    def _zero():
        acc[...] = jnp.zeros((D * BP, L), F32)

    def group(p):
        wsp_all = wsp_ref[0, 0, p]  # [4, S*128]
        blends = []
        for s in range(S):
            nd = node_ref[nbase[s] + p]  # node index, pre-clamped
            ws = _rep(wsp_all[:, s * 128:(s + 1) * 128], NT)  # [4, T]
            # row offsets as (node + stride) * pitch: with ngp % 8 == 0
            # (the T > 128 layout) Mosaic can prove the sublane alignment
            if contig:
                # zu == 1: neighbor pairs (nd, nd+1) and (nd+s2, nd+s2+1)
                # are adjacent node rows -- fetch each pair in ONE dynamic
                # slice (halves the address->load dependency chains) and
                # split with static sub-slices
                m1 = ext_ref[pl.ds(nd * jnp.int32(ngp), 2 * ngp), :]
                m2 = ext_ref[pl.ds((nd + s2) * jnp.int32(ngp), 2 * ngp), :]
                blends.append(
                    ws[0:1] * m1[0:ng] + ws[1:2] * m1[ngp:ngp + ng]
                    + ws[2:3] * m2[0:ng] + ws[3:4] * m2[ngp:ngp + ng]
                )  # [ng, T]
            else:
                blends.append(
                    ws[0:1] * ext_ref[pl.ds(nd * jnp.int32(ngp), ng), :]
                    + ws[1:2]
                    * ext_ref[pl.ds((nd + s1) * jnp.int32(ngp), ng), :]
                    + ws[2:3]
                    * ext_ref[pl.ds((nd + s2) * jnp.int32(ngp), ng), :]
                    + ws[3:4]
                    * ext_ref[pl.ds((nd + s3) * jnp.int32(ngp), ng), :]
                )  # [ng, T]
        blend = blends[0] if S == 1 else jnp.concatenate(blends, axis=1)
        w = _widen(w_ref[0, 0, p], S, NT)  # [NW, G, L] weight rows
        ca, cr, cd = _group_math(w, blend, ng, L)
        _scatter_group(G, BP, acc, kk_ref, (kkp + p) * jnp.int32(G),
                       ca, cr, cd)

    K = _k_blocking(G, NT * S)

    def block(i, _):
        for j in range(K):
            group(i * K + jnp.int32(j))
        return 0

    jax.lax.fori_loop(0, Pb // K, block, 0)
    for j in range(Pb % K):
        group(jnp.int32((Pb // K) * K + j))

    @pl.when(ip == jnp.int32(NP - 1))
    def _emit():
        _bucket_combine(acc, D, BP, L, out_ref)


def _kernel_compact(G, ng, ngp, P, D, T, contig, strategy,
                    node_ref, kk_ref,  # scalar prefetch (SMEM)
                    ext_ref, w_ref,  # VMEM: ext + compact weights
                    out_ref, acc):
    """Resident-window variant consuming COMPACT weights: w_ref is
    [1, 1, NPT, WR, 128] with group p's NW*G weight rows + 4 bilinear
    weights stacked on the WR axis at tile p // 128, lane p % 128
    (see pack_kinematics(compact=True)).  Each group extracts its lane
    and broadcasts on-chip (_wextract) instead of streaming the
    lane-broadcast wmeta from HBM.  S is fixed at 1 (compact packing is
    for the large-P, small-G regimes where S packing never applies)."""
    BP = bucket_pitch(T)
    b = pl.program_id(0)
    r = pl.program_id(1)
    nb = pl.num_programs(0)
    kkp = b * jnp.int32(P)
    sbase = jnp.int32(nb) * pl.num_programs(1) * jnp.int32(P)
    s1 = node_ref[sbase + 0]
    s2 = node_ref[sbase + 1]
    s3 = node_ref[sbase + 2]
    nbase = (b * pl.num_programs(1) + r) * jnp.int32(P)
    acc[...] = jnp.zeros((D * BP, T), F32)
    nwg = NW * G

    def group(p):
        tile = p // jnp.int32(128)
        lp = p - tile * jnp.int32(128)
        wfull = _wextract(w_ref[0, 0, tile], lp, T, strategy)  # [WR, T]
        ws = wfull[nwg:nwg + 4]
        nd = node_ref[nbase + p]
        if contig:
            m1 = ext_ref[pl.ds(nd * jnp.int32(ngp), 2 * ngp), :]
            m2 = ext_ref[pl.ds((nd + s2) * jnp.int32(ngp), 2 * ngp), :]
            blend = (
                ws[0:1] * m1[0:ng] + ws[1:2] * m1[ngp:ngp + ng]
                + ws[2:3] * m2[0:ng] + ws[3:4] * m2[ngp:ngp + ng]
            )  # [ng, T]
        else:
            blend = (
                ws[0:1] * ext_ref[pl.ds(nd * jnp.int32(ngp), ng), :]
                + ws[1:2] * ext_ref[pl.ds((nd + s1) * jnp.int32(ngp), ng), :]
                + ws[2:3] * ext_ref[pl.ds((nd + s2) * jnp.int32(ngp), ng), :]
                + ws[3:4] * ext_ref[pl.ds((nd + s3) * jnp.int32(ngp), ng), :]
            )
        ca, cr, cd = _group_math(_WRows(wfull, G), blend, ng, T)
        _scatter_group(G, BP, acc, kk_ref, (kkp + p) * jnp.int32(G),
                       ca, cr, cd)

    K = _k_blocking(G, T // 128)

    def block(i, _):
        for j in range(K):
            group(i * K + jnp.int32(j))
        return 0

    jax.lax.fori_loop(0, P // K, block, 0)
    for j in range(P % K):
        group(jnp.int32((P // K) * K + j))

    _bucket_combine(acc, D, BP, T, out_ref)


def _kernel_dma(G, ng, ngp, Pb, Ptot, rr, NP, D, T, contig,
                node_ref, kk_ref,  # scalar prefetch (SMEM)
                ext_ref, wsp_ref, w_ref,  # ext in HBM/ANY; rest VMEM
                out_ref, acc, rows, sems):
    """Variant for windows too large for VMEM residency: the bilinear
    neighbor rows of each group are DMA'd HBM->VMEM double-buffered one
    group ahead (the per-group traffic is 4*ng*T*4 bytes, so the
    pipeline hides it behind the group's VPU math).  With contig
    (zu == 1 plans), the two neighbor pairs are adjacent node rows and
    ride in TWO [2*ngp, T] copies instead of four [ngp, T] ones (same
    bytes, half the DMA issues)."""
    NT = T // 128
    BP = bucket_pitch(T)
    b = pl.program_id(0)
    r = pl.program_id(1)
    ip = pl.program_id(2)
    nb = pl.num_programs(0)
    brp = (b * jnp.int32(rr) + r) * jnp.int32(Ptot) + ip * jnp.int32(Pb)
    kkp = b * jnp.int32(Ptot) + ip * jnp.int32(Pb)  # kks: [B, 1, Ptot, G]
    sbase = jnp.int32(nb) * jnp.int32(rr) * jnp.int32(Ptot)
    if contig:
        offs = (jnp.int32(0), node_ref[sbase + 1])  # pair bases: nd, nd+s2
        ncopy = 2
    else:
        offs = (jnp.int32(0), node_ref[sbase + 0], node_ref[sbase + 1],
                node_ref[sbase + 2])
        ncopy = 4

    @pl.when(ip == 0)
    def _zero():
        acc[...] = jnp.zeros((D * BP, T), F32)

    def dma(p, slot, a):
        base = (node_ref[brp + p] + offs[a]) * jnp.int32(ngp)
        # copy the full row pitch: memref slice SHAPES must be 8-aligned
        # too; the pad rows are zeros and drop out of the contraction
        return pltpu.make_async_copy(
            ext_ref.at[pl.ds(base, (2 * ngp) if contig else ngp), :],
            rows.at[slot, a],
            sems.at[slot, a],
        )

    def start(p, slot):
        for a in range(ncopy):
            dma(p, slot, a).start()

    start(0, jnp.int32(0))

    def group(p, _):
        slot = jax.lax.rem(p, jnp.int32(2))
        nslot = jax.lax.rem(p + jnp.int32(1), jnp.int32(2))

        @pl.when(p + 1 < jnp.int32(Pb))
        def _lookahead():
            start(p + 1, nslot)

        for a in range(ncopy):
            dma(p, slot, a).wait()

        ws = _rep(wsp_ref[0, 0, p], NT)
        if contig:
            m1, m2 = rows[slot, 0], rows[slot, 1]
            blend = (
                ws[0:1] * m1[0:ng] + ws[1:2] * m1[ngp:ngp + ng]
                + ws[2:3] * m2[0:ng] + ws[3:4] * m2[ngp:ngp + ng]
            )  # [ng, T]
        else:
            blend = (
                ws[0:1] * rows[slot, 0]
                + ws[1:2] * rows[slot, 1]
                + ws[2:3] * rows[slot, 2]
                + ws[3:4] * rows[slot, 3]
            )  # [ngp, T]; pad rows beyond ng are never sliced
        w = _rep(w_ref[0, 0, p], NT)  # [NW, G, T]
        ca, cr, cd = _group_math(w, blend, ng, T)
        _scatter_group(G, BP, acc, kk_ref, (kkp + p) * jnp.int32(G),
                       ca, cr, cd)
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
                                             "S", "contig", "compact",
                                             "interpret"))
def window_forward(ext_flat, node_rows, strides3, kks, wsp, wmeta,
                   G, ng, nshift, ngp=None, S=1, contig=False,
                   compact=False, interpret=False):
    """ard f32[B, Rp, 3, T] from a GF window (VMEM-resident when it fits,
    HBM + double-buffered row DMA otherwise).

    ext_flat: f32[N*row_pitch(ng, T), T] edge-extended rows, time
    zero-padded to a multiple of 128 lanes (T <= T_MAX), node rows padded
    to row_pitch;
    node_rows: i32[B, Rp, P] bilinear-origin NODE index, pre-clamped so
    all four neighbor slices stay in range (Rp = RS*S padded receivers);
    strides3: i32[3] neighbor node strides (zu, xu*nzw, xu*nzw + zu);
    kks: i32[B, 1, P, G] lane slice starts (in [0, nt_ext - nt_out - 1]),
    stored once per source (the integer shift derives from the centroid
    time only, receiver-independent -- this keeps the SMEM scalar-prefetch
    footprint, and hence the max chunk, independent of the receiver
    count); wsp: f32[B, RS, P, 4, S*128]
    lane-broadcast bilinear weights (tile s = receiver rs*S + s); wmeta:
    f32[B, RS, P, NW, G, S*128] lane-broadcast per-centroid weight rows
    (f1..f6, cos_l, sin_l, 1-frac, frac; invalid centroids carry zero
    f's), group-major so each weight row slices to a [G, S*128] sublane
    stack.  G must be <= 8 (the sublane stack height); pack_kinematics
    splits larger groups.  S > 1 packs S receivers into the lane axis of
    one program (resident variant only): math, taps and scatter RMWs
    amortize S-fold and the per-program fixed cost (measured ~30% at
    S=1, T=128) drops S-fold; lanes >= nt_out of each window are
    unspecified (see _group_math).
    """
    bb, rp, P = node_rows.shape
    if compact:
        # compact weights: wmeta is [B, RP, NPT, WR, 128] (wsp folded in,
        # wsp arg ignored); whole-P single block, no ip grid axis
        if S != 1:
            raise ValueError("window_forward: compact weights require S=1")
        T = int(ext_flat.shape[1])
        if int(ext_flat.shape[0]) * T * 4 > VMEM_RESIDENT_BYTES:
            raise ValueError("window_forward: compact weights require a "
                             "VMEM-resident window")
        if ngp is None:
            ngp = ng if T <= 128 else -(-ng // 8) * 8
        D = int(nshift)
        bp = bucket_pitch(T)
        npt, wr = int(wmeta.shape[2]), int(wmeta.shape[3])
        strategy = os.environ.get("KIWI_WEXTRACT", "reduce")
        with jax.enable_x64(False):
            nodes_flat = jnp.concatenate(
                [node_rows.reshape(-1).astype(I32), strides3.astype(I32)]
            )
            kernel = functools.partial(
                _kernel_compact, G, ng, ngp, P, D, T, contig, strategy)
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(bb, rp),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1, npt, wr, 128),
                                     lambda b, r, *_: (b, r, 0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 1, 8, T),
                                           lambda b, r, *_: (b, r, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((D * bp, T), F32)],
                ),
                out_shape=jax.ShapeDtypeStruct((bb, rp, 8, T), F32),
                interpret=interpret,
            )(nodes_flat, kks.reshape(-1).astype(I32), ext_flat,
              wmeta.astype(F32))
        return out[:, :, :3, :]
    if G > 8:
        raise ValueError(
            f"window_forward: G={G} exceeds the 8-sublane stack; split "
            "groups at pack time (pack_kinematics / packed_g)")
    if rp % S:
        raise ValueError(f"window_forward: padded receivers {rp} not a "
                         f"multiple of S={S}")
    rr = rp // S  # receiver blocks
    if kks.shape[1] != 1:
        raise ValueError("window_forward: kks must be [B, 1, P, G] "
                         "(one row per source; receiver-independent)")
    D = int(nshift)
    T = int(ext_flat.shape[1])  # lane width: nt_ext padded to k*128
    L = S * T
    if ngp is None:  # standalone callers: infer the compact-vs-padded rule
        ngp = ng if T <= 128 else -(-ng // 8) * 8
    bp = bucket_pitch(L)
    ext_bytes = int(ext_flat.shape[0]) * T * 4
    resident = ext_bytes <= VMEM_RESIDENT_BYTES
    if S > 1 and not resident:
        raise ValueError("window_forward: S > 1 requires a VMEM-resident "
                         "window (choose_s gates this)")

    # split the P axis over a third grid dimension when the per-(b, r)
    # weight blocks would blow scoped VMEM: Mosaic double-buffers blocked
    # operands, so a P=380, G=4 plan would otherwise request ~28 MB
    # against the 16 MB limit.  acc persists across the ip steps of one
    # (b, r); the output is emitted on the last step.
    per_p = (G * NW + 4) * S * 128 * 4
    fixed = (ext_bytes if resident else 2 * 4 * ngp * T * 4) \
        + (D * bp + 8 + 3 * ngp) * L * 4
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
                _kernel, G, ng, ngp, Pb, Ptot, rr, NP, D, T, S, contig)
            ext_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
            scratch = [pltpu.VMEM((D * bp, L), F32)]
        else:
            kernel = functools.partial(
                _kernel_dma, G, ng, ngp, Pb, Ptot, rr, NP, D, T, contig)
            ext_spec = pl.BlockSpec(memory_space=pl.ANY)
            ncopy, crows = (2, 2 * ngp) if contig else (4, ngp)
            scratch = [
                pltpu.VMEM((D * bp, T), F32),
                pltpu.VMEM((2, ncopy, crows, T), F32),
                pltpu.SemaphoreType.DMA((2, ncopy)),
            ]
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bb, rr, NP),
                in_specs=[
                    ext_spec,
                    pl.BlockSpec((1, 1, Pb, 4, S * 128),
                                 lambda b, r, ip, *_: (b, r, ip, 0, 0)),
                    pl.BlockSpec((1, 1, Pb, NW, G, S * 128),
                                 lambda b, r, ip, *_: (b, r, ip, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, 8, L),
                                       lambda b, r, ip, *_: (b, r, 0, 0)),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((bb, rr, 8, L), F32),
            interpret=interpret,
        )(nodes_flat, kks.reshape(-1).astype(I32), ext_flat,
          wsp.astype(F32), wmeta.astype(F32))
    if S == 1:
        return out[:, :, :3, :]
    # unpack the S receiver windows from the lane axis
    out = out.reshape(bb, rr, 8, S, T)
    return jnp.swapaxes(out, 2, 3).reshape(bb, rp, 8, T)[:, :, :3, :]


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


def packed_g(G):
    """Effective per-group centroid count after the pack-time split:
    groups taller than the 8-row sublane stack are split into ceil(G/8)
    sub-groups of 8 (zero-weight padded)."""
    return 8 if G > 8 else G


def choose_s(cfg, nrec):
    """Receivers packed per kernel program (the S lane windows).

    Larger S amortizes the per-program fixed cost and the group math /
    scatter RMWs (the integer shift is receiver-independent), at the cost
    of zero-weight pad receivers when S does not divide nrec.  Gated to
    the VMEM-resident kernel variant; score = effective receiver lanes
    per unit of kernel work."""
    t, ngp = ext_layout(cfg)
    n = cfg.nxw * cfg.nzw
    if n * ngp * t * 4 > VMEM_RESIDENT_BYTES:
        return 1  # HBM + row-DMA variant runs one receiver per program
    env = os.environ.get("KIWI_WINDOW_S")
    if env:
        return max(1, min(8, int(env)))
    # MEASURED AND REJECTED as a default (v5e, 64x10x195 bilateral,
    # 8.1 MB resident window): kernel 5.4 / 8.0 / 9.3 / 12.5 ms at
    # S = 1 / 2 / 4 / 8.  The hoped-for amortization of the group math
    # and shared-kk scatter across receiver lane windows is outweighed by
    # the per-receiver blend concats and the S-fold wider VMEM transient
    # traffic.  The mechanism stays for ablation via KIWI_WINDOW_S.
    return 1


def pack_kinematics(cfg, kin, G, S=1, compact=False):
    """Batched kinematics dict ([B, R, C, ...] arrays) -> kernel operands.

    kin must carry f [.., C, 6], cos_l, sin_l (from _centroid_kinematics),
    wsp, ixs, izs, ish, frac, valid.  Groups with G > 8 are split into
    ceil(G/8) sub-groups (the kernel stacks a group's centroids on the
    8-row sublane axis); pass packed_g(G) as window_forward's G.  With
    S > 1, receivers are padded to a multiple of S and packed S per lane
    axis (choose_s picks S); kk is taken from each block's first receiver
    (it derives from the centroid time only -- receiver-independent by
    construction of _centroid_kinematics).
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
    # lane-broadcast weight rows: the kernel's inner loop is then pure
    # vector FMAs (scalar vmem->sreg reads stall the VPU pipeline;
    # measured 38 ms -> target ~6 ms for the 64x10x195 batch)
    wrows = jnp.stack(
        [f[..., 0], f[..., 1], f[..., 2], f[..., 3], f[..., 4], f[..., 5],
         cl, sl, 1.0 - fr, fr],
        axis=-1,
    ).astype(F32)  # [B, R, P, G, NW]
    wsp4 = kin["wsp"][:, :, ::G].astype(F32)  # [B, R, P, 4]

    if G > 8:
        # split tall groups into ceil(G/8) sub-groups of 8: sub-groups
        # re-fetch the same node rows; zero-weight pad rows are no-ops
        s = -(-G // 8)
        pad = ((0, 0), (0, 0), (0, 0), (0, s * 8 - G))
        kk = jnp.pad(kk, pad).reshape(bb, rr, P * s, 8)
        wrows = jnp.pad(wrows, pad + ((0, 0),)).reshape(bb, rr, P * s, 8, NW)
        node_rows = jnp.repeat(node_rows, s, axis=2)
        wsp4 = jnp.repeat(wsp4, s, axis=2)
        P = P * s

    # group-major weight rows: each weight row slices to a [Gp, lanes]
    # sublane stack in the kernel
    wrows = jnp.swapaxes(wrows, -1, -2)  # [B, R, P, NW, Gp]
    if compact:
        # compact layout [B, R, NPT, WR, 128]: group p's NW*Gp weight rows
        # + 4 bilinear weights stacked on the WR (sublane) axis at tile
        # p // 128, lane p % 128.  ~400x less HBM footprint than the
        # lane-broadcast wmeta at G=1 shapes; the kernel broadcasts
        # on-chip (_wextract)
        if S != 1:
            raise ValueError("pack_kinematics: compact requires S=1")
        gp = wrows.shape[-1]
        wr = NW * gp + 4
        wrp = -(-wr // 8) * 8
        npt = -(-P // 128)
        rows = jnp.concatenate(
            [wrows.reshape(bb, rr, P, NW * gp), wsp4], axis=-1)
        rows = jnp.pad(
            rows, ((0, 0), (0, 0), (0, npt * 128 - P), (0, wrp - wr)))
        wpack = jnp.swapaxes(
            rows.reshape(bb, rr, npt, 128, wrp), -1, -2).astype(F32)
        return node_rows, strides3, kk[:, :1], None, wpack
    if S == 1:
        wmeta = jnp.broadcast_to(wrows[..., None], wrows.shape + (128,))
        wsp = jnp.broadcast_to(wsp4[..., None], wsp4.shape + (128,))
        # kk once per source: receiver-independent by construction
        return node_rows, strides3, kk[:, :1], wsp, wmeta

    # S receivers per lane axis: pad receivers to a multiple of S (zero
    # weights -> no-op lanes), then pack each block's weights into S
    # 128-lane tiles
    rp = -(-rr // S) * S
    if rp > rr:
        padr = ((0, 0), (0, rp - rr), (0, 0))
        node_rows = jnp.pad(node_rows, padr)
        kk = jnp.pad(kk, padr + ((0, 0),))
        wrows = jnp.pad(wrows, padr + ((0, 0), (0, 0)))
        wsp4 = jnp.pad(wsp4, padr + ((0, 0),))
    rs = rp // S
    kk = kk[:, :1]  # [B, 1, P, G]: receiver-independent by construction
    gp = wrows.shape[-1]
    # [B, RS, S, P, NW, Gp] -> [B, RS, P, NW, Gp, S, 128] -> [.., S*128]
    wb = wrows.reshape(bb, rs, S, P, NW, gp).transpose(0, 1, 3, 4, 5, 2)
    wmeta = jnp.broadcast_to(
        wb[..., None], wb.shape + (128,)
    ).reshape(bb, rs, P, NW, gp, S * 128)
    sb = wsp4.reshape(bb, rs, S, P, 4).transpose(0, 1, 3, 4, 2)
    wsp = jnp.broadcast_to(
        sb[..., None], sb.shape + (128,)
    ).reshape(bb, rs, P, 4, S * 128)
    return node_rows, strides3, kk, wsp, wmeta


def choose_compact(cfg, bb, nrec, C, G):
    """Compact-vs-broadcast weight packing.  The lane-broadcast wmeta
    pays an (8/Gp)-fold sublane pad on top of its 128x lane redundancy;
    at small-G large-P shapes (the eikonal regime: G=1, P=169, 96-source
    chunks) that is ~6.6 GB of HBM traffic per chunk -- the entire kernel
    runtime.  Compact packing ships the P*(NW*G+4) real scalars and
    broadcasts on-chip for ~20 extra VPU ops per group.  Auto rule:
    compact once the broadcast wmeta's PHYSICAL bytes cross the threshold
    where streaming time exceeds the extraction overhead (measured on
    v5e; override with KIWI_WMETA=compact|bcast)."""
    env = os.environ.get("KIWI_WMETA", "auto")
    if env in ("compact", "bcast"):
        return env == "compact"
    t, ngp = ext_layout(cfg)
    if cfg.nxw * cfg.nzw * ngp * t * 4 > VMEM_RESIDENT_BYTES:
        return False  # DMA-variant windows keep the broadcast layout
    gw = packed_g(G)
    p = (C // G) * (-(-G // 8))
    phys = bb * nrec * p * NW * (-(-gw // 8) * 8) * 128 * 4
    return phys > 256 * 1024 * 1024


def synthesize_ard_batch(ext_flat, cfg, kin, G, interpret=False):
    """ard f32[B, R, 3, nt_out] for a (source, receiver) batch."""
    bb, nrec, C = kin["ish"].shape
    S = choose_s(cfg, nrec)
    compact = S == 1 and choose_compact(cfg, bb, nrec, C, G)
    node_rows, strides3, kk, wsp, wmeta = pack_kinematics(
        cfg, kin, G, S=S, compact=compact)
    # compact pack returns wsp=None, wmeta=the combined compact array
    # kk is clipped to [0, nt_ext - nt_out - 1] => s_len shift buckets
    _t, ngp = ext_layout(cfg)
    contig = (cfg.zunder if cfg.interpolate else 1) == 1
    out = window_forward(ext_flat, node_rows, strides3, kk, wsp, wmeta,
                         G=packed_g(G), ng=cfg.ng, ngp=ngp,
                         nshift=cfg.s_len, S=S, contig=contig,
                         compact=compact, interpret=interpret)
    return out[:, :nrec, :, : cfg.nt_out]
