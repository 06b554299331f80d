"""Pallas TPU kernel for grouped-direct seismogram synthesis (SUPERSEDED).

STATUS: kept as the documented negative result that shaped the production
kernel.  The lessons below (dynamic-rotate -> MXU relayouts, single-pass
bf16 f32 dots) led to `ops/synth_window.py` -- a VPU-only, roll-free
shift-bucket kernel that IS wired into the engine and beats the XLA
grouped path ~8x (40 ms XLA vs ~5 ms kernel for comparable batches; see
docs/performance.md).  Original measurements on v5e (52 sources x 11
receivers x 65 groups x 3 centroids):

* XLA `_grouped_accumulate`: ~40 ms (the production path)
* this kernel: ~135 ms, and only ~1e-3 relative accuracy

Two Mosaic limitations block it (notes for a future revision):

* `tpu.dynamic_rotate` (the only dynamic-lane-shift primitive; vector loads
  require 128-aligned lane offsets) composes badly with the MXU: ablations
  show DMA-only ~13 ms, rolls-without-dot ~11 ms, dot-without-rolls ~14 ms,
  but rolls FEEDING the dot ~110 ms -- the rotate output layout forces
  relayout copies in front of the matmul.
* Mosaic lowers f32 `dot_general` through the bf16 MXU in a single pass and
  ignores `precision=HIGHEST`, giving ~2^-8 relative error; full f32 needs
  a manual 3-pass hi/lo split, tripling the (already dominant) MXU op count.

The XLA formulation of `synth._grouped_accumulate` materializes the gathered
GF rows, the per-centroid slices and the tap-combined values as separate
HBM-round-trip buffers (~10x the intrinsic traffic).  This kernel fuses the
whole per-group pipeline -- 4-row gather, bilinear blend, per-centroid
fractional time shift, moment-tensor contraction, accumulation -- into one
VMEM-resident pass per spatial group, with the next group's row DMAs
double-buffered behind the current group's compute.

Grid: (B sources, R receivers, P groups), P innermost (sequential on TPU,
accumulating into the (b, r) output block).  Data-dependent state is packed
to fit the 1 MB SMEM scalar-prefetch budget:

* the 4 bilinear neighbor rows are `node00 + {0, zu, xu*nzw, xu*nzw+zu}`
  (static strides; edge-clipped indices only occur for invalid centroids
  whose weights are zero, so clamping to N-1 is safe) -> one i32 per group;
* integer shifts `ish` -> one i32 per centroid;
* the fractional-shift taps are folded into the moment weights
  (w1 = (1-frac) w, w2 = frac w stacked along the NG axis), making the
  per-centroid update a single [8, 2NG] x [2NG, nt_out] matmul;
* the bilinear weights ride in a normal blocked VMEM operand.

Semantics identical to synth._grouped_accumulate (same trace extension,
2-tap fractional shift, weight application); float32 rounding may differ in
the reduction order only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32


def _kernel(G, nt_out, start_base, strides, nmax, rr, pp,
            node0_ref, starts_ref,  # scalar prefetch (SMEM, flattened 1-D)
            ext_ref, wsp_ref, wv_ref,  # tensor inputs
            out_ref,  # output
            rows, blend, acc, sems):  # scratch
    b = pl.program_id(0)
    r = pl.program_id(1)
    p = pl.program_id(2)
    np_ = pl.num_programs(2)
    two = jnp.int32(2)
    slot = jax.lax.rem(p.astype(I32), two)
    nslot = jax.lax.rem(p.astype(I32) + jnp.int32(1), two)
    # SMEM arrays are 1-D (multi-dim SMEM pads its trailing dims to the
    # full (8, 128) tile, blowing the 1 MB budget)
    brp_base = (b * jnp.int32(rr) + r) * jnp.int32(pp)

    def copy(a, buf, at_p):
        ai = jnp.int32(a)
        nd = jnp.minimum(node0_ref[brp_base + at_p] + jnp.int32(strides[a]),
                         jnp.int32(nmax - 1))
        return pltpu.make_async_copy(ext_ref.at[nd], rows.at[buf, ai],
                                     sems.at[buf, ai])

    @pl.when(p == 0)
    def _prologue():
        for a in range(4):
            copy(a, slot, p).start()

    @pl.when(p + 1 < np_)
    def _lookahead():
        for a in range(4):
            copy(a, nslot, p + 1).start()

    for a in range(4):
        copy(a, slot, p).wait()

    blend[...] = (
        wsp_ref[0, 0, p, 0] * rows[slot, 0]
        + wsp_ref[0, 0, p, 1] * rows[slot, 1]
        + wsp_ref[0, 0, p, 2] * rows[slot, 2]
        + wsp_ref[0, 0, p, 3] * rows[slot, 3]
    )

    @pl.when(p == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    bl = blend[...]
    t_len = jnp.int32(bl.shape[1])
    parts = []
    for g in range(G):
        st = jnp.int32(start_base) - starts_ref[
            (brp_base + p) * jnp.int32(G) + jnp.int32(g)
        ]
        # dynamic lane slice via rotate (Mosaic only vector-loads at
        # 128-aligned lane offsets): roll(x, s)[j] = x[(j - s) % T], so a
        # shift of T - st gives rot0[:, j] = bl[:, st + j]; the used range
        # never wraps because st + nt_out < T by construction
        rot1 = pltpu.roll(bl, t_len - st - jnp.int32(1), 1)  # bl[st+1+j]
        rot0 = pltpu.roll(bl, jax.lax.rem(t_len - st, t_len), 1)  # bl[st+j]
        parts.append(rot1[:, :nt_out])  # the (1-fr) tap
        parts.append(rot0[:, :nt_out])  # the fr tap
    # one [8, 2 G NG] x [2 G NG, nt_out] matmul for the whole group
    vcat = jnp.concatenate(parts, axis=0)
    w = wv_ref[0, 0, 0]  # [8, G * 2 NG], column order matches `parts`
    acc[...] += jax.lax.dot_general(
        w, vcat, (((1,), (0,)), ((), ())),
        preferred_element_type=F32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(p == np_ - 1)
    def _epilogue():
        out_ref[0, 0] = acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("G", "nt_out", "start_base", "strides", "interpret"),
)
def grouped_accumulate_batch(ext2, node0, starts, wsp, wv,
                             G, nt_out, start_base, strides, interpret=False):
    """Batched grouped synthesis.

    ext2: f32[N, NG, T] edge-extended GF rows (flattened window nodes);
    node0: i32[B, R, P] bilinear-origin row per group; strides: static
    (0, zu, xu*nzw, xu*nzw + zu); starts: i32[B, R, P, G] integer shifts;
    wsp: f32[B, R, P, 4] bilinear weights; wv: f32[B, R, P, 8, G*2*NG]
    tap-folded moment weights (rows 0..2 = ard channels, 3..7 zero).
    Returns ard f32[B, R, 3, nt_out].
    """
    # the kiwi_tpu package enables jax x64 globally; python int literals in
    # the kernel would trace as i64 constants which Mosaic refuses -- trace
    # in 32-bit mode (all operands are explicit 32-bit dtypes)
    with jax.enable_x64(False):
        out = _call(ext2, node0, starts, wsp, wv,
                    G, nt_out, start_base, strides, interpret)
    return out[:, :, :3]


def _call(ext2, node0, starts, wsp, wv, G, nt_out, start_base, strides,
          interpret):
    bb, rr, pp = node0.shape
    n, ng, t = ext2.shape
    # Mosaic's dynamic_rotate needs 128-aligned lane shapes; pad the time
    # axis (rotated-in lanes never reach the used [0, nt_out) range since
    # start + nt_out < t by construction)
    tp = -(-t // 128) * 128
    if tp != t:
        ext2 = jnp.pad(ext2, ((0, 0), (0, 0), (0, tp - t)))
        t = tp

    return pl.pallas_call(
        functools.partial(_kernel, G, nt_out, start_base, strides, n, rr, pp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bb, rr, pp),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # ext2
                # full (P, 4) per block: TPU blocks need the last two dims
                # tile-divisible or whole-array
                pl.BlockSpec((1, 1, pp, 4), lambda b, r, p, *_: (b, r, 0, 0)),
                pl.BlockSpec((1, 1, 1, 8, G * 2 * ng),
                             lambda b, r, p, *_: (b, r, p, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, nt_out),
                                   lambda b, r, p, *_: (b, r, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 4, ng, t), F32),  # double-buffered rows
                pltpu.VMEM((ng, t), F32),  # blended
                pltpu.VMEM((8, nt_out), F32),  # accumulator
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bb, rr, 8, nt_out), F32),
        interpret=interpret,
    )(node0.reshape(-1), starts.reshape(-1), ext2, wsp, wv)


def build_inputs(cfg, kin_batched, G):
    """Reshape batched kinematics ([B, R, C, ...] arrays from
    synth._centroid_kinematics under vmap) into the kernel's operands."""
    ixs = kin_batched["ixs"][:, :, ::G]  # [B, R, P, 2]
    izs = kin_batched["izs"][:, :, ::G]
    node0 = (ixs[..., 0] * cfg.nzw + izs[..., 0]).astype(I32)  # [B, R, P]
    xu = cfg.xunder if cfg.interpolate else 1
    zu = cfg.zunder if cfg.interpolate else 1
    strides = (0, zu, xu * cfg.nzw, xu * cfg.nzw + zu)
    wsp = kin_batched["wsp"][:, :, ::G].astype(F32)  # [B, R, P, 4]

    b, r, c = kin_batched["ish"].shape
    p = c // G
    starts = kin_batched["ish"].reshape(b, r, p, G).astype(I32)
    frac = kin_batched["frac"].reshape(b, r, p, G).astype(F32)
    wg = kin_batched["wg"].reshape(b, r, p, G, 3, cfg.ng)
    valid = kin_batched["valid"].reshape(b, r, p, G)
    wv3 = jnp.where(valid[..., None, None], 1.0, 0.0) * wg  # [B,R,P,G,3,NG]
    w8 = jnp.concatenate(
        [wv3, jnp.zeros(wv3.shape[:4] + (5, cfg.ng), F32)], axis=-2
    )  # [B,R,P,G,8,NG]
    fr = frac[..., None, None]
    wv = jnp.concatenate([(1.0 - fr) * w8, fr * w8], axis=-1)  # [..,G,8,2NG]
    # kernel consumes one [8, G*2NG] weight matrix per group, column order
    # (g, tap, n) matching the concatenated rolled rows
    wv = wv.transpose(0, 1, 2, 4, 3, 5).reshape(b, r, p, 8, -1)
    # clamp slice starts into the valid window (invalid centroids carry
    # zero weights; their slices just need to stay in-bounds)
    starts = jnp.clip(starts, cfg.s_base, cfg.s_base + cfg.s_len - 1)
    return node0, starts, wsp, wv, strides


def synthesize_ard_batch(ext2, cfg, kin_batched, G, interpret=False):
    """ard f32[B, R, 3, nt_out] for a whole (source, receiver) batch."""
    node0, starts, wsp, wv, strides = build_inputs(cfg, kin_batched, G)
    # kernel slice start = start_base - ish with start_base = out_it0-e0-1
    start_base = cfg.s_base + cfg.s_len - 1
    return grouped_accumulate_batch(
        ext2, node0, starts, wsp, wv,
        G=G, nt_out=cfg.nt_out, start_base=start_base, strides=strides,
        interpret=interpret,
    )
