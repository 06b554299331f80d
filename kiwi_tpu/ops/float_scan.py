"""Pallas TPU kernel: batched floating-shift misfit scan (VPU-only).

The floating norms (floating_l2norm / floating_l1norm) evaluate the
misfit integral at every trial reference shift s in the scan range and
keep the per-receiver minimum (probes_... scan, comparator.f90:627-697 +
minimizer_engine's floating-shift selection).  The XLA formulation
(misfit.evaluate_misfits under vmap) re-reads every synthetic S =
2*nshift+1 times from HBM -- for the benchmark point sweep that is ~21x
the synthesis traffic and the dominant cost of the whole fused forward
(profile_point.py stage 6: the same program under plain l2norm runs ~3x
faster than under floating_l1norm).

This kernel keeps the processed reference stack [S*RC, W] resident in
VMEM (a few hundred KB: the probe is 128-256 lanes), streams each
synthetic block through once, and emits the full scan sum table
[S, B, RC] in a single pass.

Mask-free by construction
-------------------------
The probe extension conventions make the *unmasked* full-window sum
exactly decomposable (misfit.evaluate_misfits integrates |ref_s -
fb*syn| over the span union [lo, hi] = [min(ref_lo_s, syn_lo),
max(ref_hi_s, syn_hi)]):

* left of lo BOTH arrays are zero (zero-left extension;
  misfit.place_on_probe / misfit.shift_probe), so [0, lo) contributes 0;
* right of hi BOTH arrays are their repeated edge constants (repeat-right
  extension, sparse_trace.f90 end-value semantics), so (hi, W-1]
  contributes (W-1 - hi) * |ref_edge - fb*syn_edge| -- a closed form the
  XLA caller subtracts (`tail correction`).

Tapered rows are zero outside the taper span, so the full sum already
equals the taper-span integral and the correction vanishes through its
zero edge values (the caller passes hi = slice end for tapered rows).
Rows with spectral FILTERS break tail constancy (irfft ringing), so the
engine gates this path on no-filter plans.

The kernel therefore needs no masks, no bounds, no i32 operands: for
each (shift, rc) it does `sum |ref_row - syn|` over the lane axis.
No dot_general (Mosaic lowers f32 dots through one bf16 MXU pass,
~2^-8 error -- the scan values ARE the reported misfits and must hold
1e-5 parity with the XLA path); the lane reduction is a VPU tree sum.

Layout: B on sublanes (BT-row blocks), probe lanes W on lanes; syn block
[RC, BT, W]; ref resident [S*RC, W]; out [S, B, RC] with the shift loop
a fori (ref row reads are dynamic sublane slices, near-free; the per-s
output plane store is a dynamic leading-dim store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

F32 = jnp.float32


def _scan_kernel(ref_ref, syn_ref, out_ref, *, S, RC, BT, l2):
    def body(s, _):
        # per-rc scan sums for this shift: [BT, RC] plane (keepdims sums
        # + lane concatenation -- 2-D shapes throughout for Mosaic)
        cols = []
        for rc in range(RC):
            syn = syn_ref[rc]                    # [BT, W]
            ref_row = ref_ref[s * RC + rc]       # [W] (dynamic sublane read)
            d = ref_row[None, :] - syn
            u = d * d if l2 else jnp.abs(d)
            cols.append(jnp.sum(u, axis=-1, keepdims=True))  # [BT, 1]
        out_ref[s] = jnp.concatenate(cols, axis=-1)          # [BT, RC]
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def _scan_kernel_blocked(ref_ref, syn_ref, out_ref, *, S, RC, BT, l2):
    """W-blocked variant: the W grid axis (minor) revisits the same output
    block per B block; accumulate across its consecutive steps."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(s, _):
        cols = []
        for rc in range(RC):
            syn = syn_ref[rc]                    # [BT, WB]
            ref_row = ref_ref[s * RC + rc]
            d = ref_row[None, :] - syn
            u = d * d if l2 else jnp.abs(d)
            cols.append(jnp.sum(u, axis=-1, keepdims=True))
        out_ref[s] = out_ref[s] + jnp.concatenate(cols, axis=-1)
        return 0

    jax.lax.fori_loop(0, S, body, 0)


# resident ref stack + double-buffered syn blocks target (VMEM is ~16 MB
# less Mosaic overheads; synth kernels may co-reside in a fused program)
VMEM_TARGET_BYTES = 8 << 20


@functools.partial(jax.jit, static_argnames=("l2", "bt", "interpret"))
def scan_sums(ref_srw, syn_rbw, l2=False, bt=32, interpret=False):
    """Full-window scan sums.

    ref_srw: f32[S*RC, W] processed+shifted references (W a 128-multiple).
    syn_rbw: f32[RC, B, W] scaled synthetics (fb * moment folded in),
        B a multiple of bt.
    Returns f32[S, B, RC]: sum over all W lanes of |ref - syn| (or the
    square for l2) -- the caller applies the tail correction, dt, and
    masking/argmin.

    The reference stack stays VMEM-resident when it fits; otherwise both
    operands stream W-blocked (long teleseismic probes / wide scans),
    which still reads each synthetic once per (B/bt) ref re-streams --
    strictly less traffic than the vmapped XLA path's S re-reads.
    """
    SRC, W = ref_srw.shape
    RC, B, W2 = syn_rbw.shape
    assert W == W2 and SRC % RC == 0 and B % bt == 0
    S = SRC // RC

    resident_bytes = (SRC * W + 2 * RC * bt * W + 2 * S * bt * RC) * 4
    if resident_bytes <= VMEM_TARGET_BYTES:
        # trace under x64=False: the package enables x64 globally, which
        # makes in-kernel Python-int index arithmetic (s * RC) materialize
        # i64 constants that Mosaic's i32 index lowering rejects
        # ('arith.muli' i32/i64 mismatch on real TPU; interpret mode hides it)
        with jax.enable_x64(False):
            return pl.pallas_call(
                functools.partial(_scan_kernel, S=S, RC=RC, BT=bt, l2=l2),
                grid=(B // bt,),
                in_specs=[
                    pl.BlockSpec((SRC, W), lambda i: (0, 0)),  # resident
                    pl.BlockSpec((RC, bt, W), lambda i: (0, i, 0)),
                ],
                out_specs=pl.BlockSpec((S, bt, RC), lambda i: (0, i, 0)),
                out_shape=jax.ShapeDtypeStruct((S, B, RC), F32),
                interpret=interpret,
            )(ref_srw, syn_rbw)

    wb = 256 if W % 256 == 0 else 128
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_scan_kernel_blocked, S=S, RC=RC, BT=bt, l2=l2),
            grid=(B // bt, W // wb),
            in_specs=[
                pl.BlockSpec((SRC, wb), lambda i, j: (0, j)),
                pl.BlockSpec((RC, bt, wb), lambda i, j: (0, i, j)),
            ],
            out_specs=pl.BlockSpec((S, bt, RC), lambda i, j: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((S, B, RC), F32),
            interpret=interpret,
        )(ref_srw, syn_rbw)


# ---------------------------------------------------------------------------
# transposed fused synthesis+scan (round 5)
# ---------------------------------------------------------------------------
#
# For SHARED-KINEMATICS plans the synthetic is a weight contraction
# syn[b, rc] = sum_t wgt[rc, t, b] * v[rc, t] against a batch-invariant
# values matrix v (the batched only_moment_changed shortcut).  The round-4
# pipeline materialized syn [B, RC, W] in HBM (XLA synthesis ~1.6 ms at
# bench shapes) and re-read it with scan_sums above (~1.6 ms in-program),
# whose floor is the per-vreg log2(W) LANE tree: 28 of 36 vreg-ops per
# (shift, rc, 32 models) are reduction, and they cannot amortize across
# models because each model owns its own vreg rows.
#
# This kernel TRANSPOSES the layout -- W on sublanes, B on lanes -- so the
# reduce over W becomes ~W/8 full-vreg adds + a 3-step sublane tree shared
# by 128 models, and FUSES the synthesis contraction so the synthetic
# block lives and dies in VMEM.  The two operand subtleties (measured in
# benchmark/micro_fused.py; the round-4 v3 attempt died on the first):
#
# * ref rows and v rows enter as XLA-PRE-BROADCAST tiles [.., W, 128]:
#   materializing them costs nothing measurable (the broadcast fuses into
#   the operand stream), while broadcasting in-kernel is a ~42-op Mosaic
#   lane relayout per (s, rc) that erases the win;
# * the weights arrive [T, 128] with b on lanes: a [1, 128] row
#   sublane-broadcast against [W, 128] is free.
#
# Measured at bench shapes (S=21 RC=30 T=30 B=4096 W=128, real v5e):
# 3.29 ms (XLA synth + v0 scan) -> 1.65 ms fused, f32-exact (2.9e-7 =
# reduction order).  MXU variants (bf16x3/x6 dots) measured no faster.

BL = 128  # models per lane block


def _fused_kernel(ref_ref, vt_ref, wgt_ref, out_ref, *, S, T, l2):
    syn = vt_ref[0, 0] * wgt_ref[0, 0][None, :]
    for t in range(1, T):
        syn = syn + vt_ref[0, t] * wgt_ref[0, t][None, :]
    for s in range(S):
        d = ref_ref[0, s] - syn                # [W, BL]
        u = d * d if l2 else jnp.abs(d)
        out_ref[0, s] = jnp.sum(u, axis=0)     # [BL]


def _fused_kernel_masked(ref_ref, vt_ref, wgt_ref, msk_ref, out_ref, *,
                         S, T, l2):
    """Masked variant: per-(s, rc) span masks replace the closed-form tail
    correction.  Exact for SPECTRAL-FILTER rows, whose irfft ringing breaks
    the constant-tail assumption the unmasked kernel leans on; ~16 extra
    vreg-muls per (s, rc, 128 models)."""
    syn = vt_ref[0, 0] * wgt_ref[0, 0][None, :]
    for t in range(1, T):
        syn = syn + vt_ref[0, t] * wgt_ref[0, t][None, :]
    for s in range(S):
        d = ref_ref[0, s] - syn
        u = d * d if l2 else jnp.abs(d)
        out_ref[0, s] = jnp.sum(u * msk_ref[0, s], axis=0)


@functools.partial(jax.jit, static_argnames=("k_share", "l2", "interpret"))
def fused_scan_sums(ref_tiles, v_tiles, wgt, mask_tiles=None, k_share=1,
                    l2=False, interpret=False):
    """Fused synthesis + full-window scan sums, transposed layout.

    ref_tiles: f32[RC, S, W, BL] processed+shifted references, value
        lane-broadcast (jnp.broadcast_to(ref[..., None], (..., BL))).
    v_tiles:   f32[RV, T, W, BL] processed values rows, lane-broadcast;
        RV = RC // k_share (rows shared across each receiver's k_share
        channel rows -- taper-free plans) or RC.
    wgt:       f32[RC, T, B] weights (moment and syn_factor folded in),
        B a BL multiple.
    mask_tiles: optional f32[RC, S, W, BL] span masks, lane-broadcast like
        ref_tiles; when given the kernel sums u * mask (filtered plans,
        where ringing breaks the tail-correction decomposition).
    Returns f32[RC, S, B]: sum over all W window samples of
    |ref - sum_t wgt*v| (or its square for l2); the caller applies the
    tail correction (unmasked) or nothing (masked), dt, and the
    floating-shift selection.
    """
    RC, S, W, bl = ref_tiles.shape
    RV, T, W2, bl2 = v_tiles.shape
    RC3, T3, B = wgt.shape
    assert (W, bl, bl2, RC3, T3) == (W2, BL, BL, RC, T) and B % BL == 0
    assert RV * k_share == RC

    if k_share == 1:
        v_index = lambda rc, b: (rc, 0, 0, 0)  # noqa: E731
    else:
        v_index = lambda rc, b: (rc // k_share, 0, 0, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)),
        pl.BlockSpec((1, T, W, BL), v_index),
        pl.BlockSpec((1, T, BL), lambda rc, b: (rc, 0, b)),
    ]
    args = [ref_tiles, v_tiles, wgt]
    if mask_tiles is None:
        kern = functools.partial(_fused_kernel, S=S, T=T, l2=l2)
    else:
        assert mask_tiles.shape == (RC, S, W, BL)
        kern = functools.partial(_fused_kernel_masked, S=S, T=T, l2=l2)
        in_specs.append(pl.BlockSpec((1, S, W, BL), lambda rc, b: (rc, 0, 0, 0)))
        args.append(mask_tiles)

    # x64 guard: see scan_sums above
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid=(RC, B // BL),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, S, BL), lambda rc, b: (rc, 0, b)),
            out_shape=jax.ShapeDtypeStruct((RC, S, B), F32),
            interpret=interpret,
        )(*args)


def fused_vmem_ok(S, T, W, masked=False):
    """Whether the fused kernel's per-step VMEM residency (double-buffered
    ref + v [+ mask] tiles + small blocks) fits the budget; callers fall
    back to the two-stage scan_sums path otherwise (wide probes / huge
    scans)."""
    tiles = ((2 if masked else 1) * S + T) * W * BL * 4
    return 2 * tiles <= 12 << 20
