"""Waveform misfit engine (probes, tapers, spectral filters, norms).

Replaces comparator.f90 + the misfit parts of receiver.f90.  A "probe" is a
power-of-two-length float32 array over a static absolute index span
[ps0, ps0+pl), with the reference's extension convention: zeros left of the
data span, last value repeated to the right (comparator.f90:59, :264-267).

Differences from the reference, by design:
* probe spans are unified across receivers/components per configuration (the
  reference grows each probe pair's pow2 span dynamically,
  comparator.f90:464-486; values of time-domain norms are unaffected because
  norms are restricted to data/taper spans; amplitude-spectrum norms
  reproduce the per-pair pow2 spans and df EXACTLY via masked extended-grid
  FFTs -- see ampspec_pair_misfits).
* per-source dynamic spans are those of a fresh engine session (the
  reference's spans can only grow within a session, making misfits weakly
  order-dependent across a sweep; we evaluate each source independently).

Norms (comparator.f90:33-42): l2, l1, ampspec_l2, ampspec_l1,
scalar_product, peak, floating_l2, floating_l1 -- the floating ones scan a
reference-shift range and pick the minimum summed misfit per receiver
(receiver.f90:439-510).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .plf import PLF

F32 = jnp.float32
I32 = jnp.int32

L2NORM = 1
L1NORM = 2
AMPSPEC_L2NORM = 3
AMPSPEC_L1NORM = 4
SCALAR_PRODUCT = 5
PEAK = 6
FLOATING_L2NORM = 7
FLOATING_L1NORM = 8

NORM_NAMES = {
    "l2norm": L2NORM,
    "l1norm": L1NORM,
    "ampspec_l2norm": AMPSPEC_L2NORM,
    "ampspec_l1norm": AMPSPEC_L1NORM,
    "scalar_product": SCALAR_PRODUCT,
    "peak": PEAK,
    "floating_l2norm": FLOATING_L2NORM,
    "floating_l1norm": FLOATING_L1NORM,
}


def next_pow2(n):
    return 1 << max(0, int(np.ceil(np.log2(max(1, n)))))


def allowed_span(span, minlength):
    """Pow2 padding of a span (comparator.f90:1092-1109)."""
    lo, hi = int(span[0]), int(span[1])
    length = hi - lo + 1
    lengthp = next_pow2(max(length, minlength))
    lo2 = lo - int(np.floor((lengthp - length) / 2.0))
    return lo2, lo2 + lengthp - 1


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ProbeStatic:
    """Static probe-grid parameters."""

    ps0: int  # absolute index of first probe sample
    pl: int  # probe length (power of two)
    dt: float

    @property
    def df(self):
        return 1.0 / (self.pl * self.dt)


class MisfitSetup:
    """Host-side builder of the device misfit context.

    nrc: number of (receiver, component) rows; receiver_ids maps each row to
    its receiver (for floating-shift grouping and enable/disable).
    """

    def __init__(self, static: ProbeStatic, receiver_ids):
        self.static = static
        self.receiver_ids = np.asarray(receiver_ids, dtype=np.int32)
        nrc = self.receiver_ids.shape[0]
        self.nrc = nrc
        pl = static.pl
        nf = pl // 2 + 1
        self.ref = np.zeros((nrc, pl), dtype=np.float32)
        self.ref_lo = np.full(nrc, static.ps0, dtype=np.int32)
        self.ref_hi = np.full(nrc, static.ps0, dtype=np.int32)
        self.has_ref = np.zeros(nrc, dtype=bool)
        self.taper_w = np.ones((nrc, pl), dtype=np.float32)
        self.taper_zero_one = np.ones((nrc, pl), dtype=np.float32)
        self.has_taper = np.zeros(nrc, dtype=bool)
        self.taper_lo = np.full(nrc, static.ps0, dtype=np.int32)
        self.taper_hi = np.full(nrc, static.ps0 + pl - 1, dtype=np.int32)
        self.filter_w = np.ones((nrc, nf), dtype=np.float32)
        self.has_filter = np.zeros(nrc, dtype=bool)
        self.taper_plfs = {}
        self.filter_plfs = {}
        self.syn_factor = np.ones(nrc, dtype=np.float32)
        self.enabled = np.ones(nrc, dtype=bool)
        # per-row floating shift ranges (samples); defaults allow the whole
        # plan-wide scan range (receiver.f90:94 floating_shiftrange)
        self.shift_lo = np.full(nrc, -(1 << 30), dtype=np.int32)
        self.shift_hi = np.full(nrc, 1 << 30, dtype=np.int32)

    # -- mutation (host) -----------------------------------------------------

    def set_ref(self, irc, values, itmin):
        """Place a reference trace (absolute start index itmin) on the probe
        span with probe extension semantics (probe_set_array,
        comparator.f90:222-271)."""
        ps0, pl = self.static.ps0, self.static.pl
        v = np.asarray(values, dtype=np.float32)
        arr = np.zeros(pl, dtype=np.float32)
        lo = itmin - ps0
        hi = lo + v.shape[0] - 1
        if lo < 0 or hi >= pl:
            raise ValueError(
                f"reference trace [{itmin}, {itmin + len(v) - 1}] exceeds probe span "
                f"[{ps0}, {ps0 + pl - 1}]"
            )
        arr[lo : hi + 1] = v
        arr[hi + 1 :] = v[-1]
        self.ref[irc] = arr
        self.ref_lo[irc] = itmin
        self.ref_hi[irc] = itmin + v.shape[0] - 1
        self.has_ref[irc] = True

    def set_taper(self, irc, taper: PLF):
        """receiver_set_taper -> probe taper (comparator.f90:1173-1184)."""
        ps0, pl, dt = self.static.ps0, self.static.pl, self.static.dt
        span = (ps0, ps0 + pl - 1)
        self.taper_w[irc] = taper.taper_weights(span, dt, ip="cos").astype(np.float32)
        self.taper_zero_one[irc] = taper.taper_weights(span, dt, ip="zero_one").astype(
            np.float32
        )
        dlo, dhi = taper.discrete_span(dt)
        self.taper_lo[irc] = max(dlo, span[0])
        self.taper_hi[irc] = min(dhi, span[1])
        self.has_taper[irc] = True
        self.taper_plfs[irc] = taper

    def set_filter(self, irc, filt: PLF):
        """Spectral filter on rfft bins, coordinate k*df
        (comparator.f90:1218-1231)."""
        nf = self.static.pl // 2 + 1
        self.filter_w[irc] = filt.taper_weights((0, nf - 1), self.static.df, ip="cos").astype(
            np.float32
        )
        self.has_filter[irc] = True
        self.filter_plfs[irc] = filt

    def device(self):
        # Amplitude normalization: every norm runs on ref/s0 and
        # syn_factor/s0 (so fb*syn is scaled identically), and the eval
        # exits multiply the 1-homogeneous outputs back by s0 (s0^2 for
        # scalar products).  Forward values change only at roundoff --
        # but WITHOUT it, squared accumulations underflow for small
        # amplitude scales: a moment-1.0 source makes samples ~1e-19,
        # squares ~1e-38, and both TPU and XLA:CPU flush the denormals
        # to zero (observed: a zero-misfit plateau over 6 degrees of
        # strike).  The reference computes in f64 and never sees this;
        # sminpack's enorm scales for exactly the same reason.
        s0 = float(np.abs(self.ref).max())
        if not np.isfinite(s0) or s0 == 0.0:
            s0 = 1.0
        # Extended-grid weights for the exact per-pair ampspec path (see
        # ampspec_pair_misfits / amp_grid): pair windows are centered pow2
        # spans that can stick out of the unified probe span (allowed_span
        # centers its pow2 padding, comparator.f90:1092-1109), so
        # amplitude-spectrum norms run on the 4*next_pow2(pl) grid which
        # provably contains every physical pair window; tapers and filters
        # are re-evaluated there.  ~[RC, 4*P] f32 extra -- negligible next
        # to GF windows.
        ps0, pl, dt = self.static.ps0, self.static.pl, self.static.dt
        aps0, apl, _ncap = amp_grid(ps0, pl)
        anf = apl // 2 + 1
        adf = 1.0 / (apl * dt)
        amp_taper_w = np.ones((self.nrc, apl), dtype=np.float32)
        for irc, plf in self.taper_plfs.items():
            amp_taper_w[irc] = plf.taper_weights((aps0, aps0 + apl - 1), dt, ip="cos")
        amp_filter_w = np.ones((self.nrc, anf), dtype=np.float32)
        for irc, plf in self.filter_plfs.items():
            amp_filter_w[irc] = plf.taper_weights((0, anf - 1), adf, ip="cos")
        return {
            "amp_scale": jnp.float32(s0),
            "ref": jnp.asarray(self.ref / np.float32(s0)),
            "ref_lo": jnp.asarray(self.ref_lo),
            "ref_hi": jnp.asarray(self.ref_hi),
            "taper_w": jnp.asarray(self.taper_w),
            "taper_zero_one": jnp.asarray(self.taper_zero_one),
            "has_taper": jnp.asarray(self.has_taper),
            "taper_lo": jnp.asarray(self.taper_lo),
            "taper_hi": jnp.asarray(self.taper_hi),
            "filter_w": jnp.asarray(self.filter_w),
            "has_filter": jnp.asarray(self.has_filter),
            "syn_factor": jnp.asarray(self.syn_factor / np.float32(s0)),
            "enabled": jnp.asarray(self.enabled),
            "receiver_ids": jnp.asarray(self.receiver_ids),
            "shift_lo": jnp.asarray(self.shift_lo),
            "shift_hi": jnp.asarray(self.shift_hi),
            "amp_taper_w": jnp.asarray(amp_taper_w),
            "amp_filter_w": jnp.asarray(amp_filter_w),
        }


# ---------------------------------------------------------------------------
# device-side probe processing
# ---------------------------------------------------------------------------


def place_on_probe(values, it0, st: ProbeStatic):
    """Put trace rows (f32[..., NT]) starting at absolute it0 onto the probe
    span with zero-left / repeat-right extension."""
    nt = values.shape[-1]
    j = st.ps0 + jnp.arange(st.pl)
    rel = j - it0
    out = jnp.take(values, jnp.clip(rel, 0, nt - 1), axis=-1)
    return jnp.where(rel < 0, 0.0, out)


def shift_probe(arr, lo, hi, s, st: ProbeStatic):
    """probe_shift: move the data span by s samples, re-extending
    (comparator.f90:273-288).  arr: f32[RC, PL]; lo/hi absolute dataspans;
    s: integer scalar shift applied to all rows."""
    j = jnp.arange(st.pl)
    rel = j[None, :] - s  # source sample (probe-relative) for each output j
    lo_rel = lo[:, None] - st.ps0
    hi_rel = hi[:, None] - st.ps0
    relc = jnp.clip(rel, lo_rel, hi_rel)  # clamp into the data span: edge ext
    v = jnp.take_along_axis(arr, jnp.broadcast_to(relc, arr.shape), axis=-1)
    return jnp.where(rel < lo_rel, 0.0, v)


def _taper_arrays(ctx, arr):
    """array_tapered per row (no-op rows keep the plain array)."""
    return jnp.where(ctx["has_taper"][..., None], arr * ctx["taper_w"], arr)


def processed_arrays(ctx, arr, st: ProbeStatic, use_fft=True):
    """(tapered, filtered, amp, amp_filtered) per row.

    Follows the probe dataflow (comparator.f90:1171-1263): taper with cosine
    interpolation, rfft, spectral PLF filter, irfft, zero where taper is
    zero.  With use_fft=False (no filters configured and no spectral norms)
    the FFT stage is skipped entirely and `filtered` aliases `tapered`.
    """
    tapered = _taper_arrays(ctx, arr)
    if not use_fft:
        return tapered, tapered, None, None
    spec = jnp.fft.rfft(tapered, axis=-1)
    amp = jnp.abs(spec).astype(F32)
    specf = spec * ctx["filter_w"]
    ampf = jnp.where(ctx["has_filter"][..., None], amp * ctx["filter_w"], amp)
    filtered = jnp.fft.irfft(specf, n=st.pl, axis=-1).astype(F32)
    filtered = jnp.where(ctx["has_taper"][..., None], filtered * ctx["taper_zero_one"], filtered)
    filtered = jnp.where(ctx["has_filter"][..., None], filtered, tapered)
    return tapered, filtered, amp, ampf


def _span_mask(lo, hi, st: ProbeStatic):
    j = st.ps0 + jnp.arange(st.pl)
    return ((j >= lo[..., None]) & (j <= hi[..., None])).astype(F32)


def norm_spans(ctx, syn_lo, syn_hi, st: ProbeStatic):
    """Span over which time-domain norms integrate
    (probes_norm_timedomain, comparator.f90:770-822): the taper span when
    tapers are set, else the union of data spans."""
    lo = jnp.where(ctx["has_taper"], ctx["taper_lo"], jnp.minimum(ctx["ref_lo"], syn_lo))
    hi = jnp.where(ctx["has_taper"], ctx["taper_hi"], jnp.maximum(ctx["ref_hi"], syn_hi))
    return lo, hi


# Accumulation dtype: the reference sums norms in double precision
# (comparator.f90:627-697) because Fortran accumulates serially; XLA reduces
# with trees, so float32 keeps ~1e-6 relative accuracy while avoiding TPU
# f64 emulation (an order of magnitude slower) in the hot loop.
ACCUM = F32


def _accum(x, mask):
    return jnp.sum((x * mask).astype(ACCUM), axis=-1)


def gsqrt(s):
    """sqrt with a finite reverse-mode gradient at 0 (forward-identical).

    Norm sqrts hit exact zeros in normal operation -- a synthetic that
    equals its reference on some rc row makes the misfit integrand 0 --
    and the raw sqrt's backward (inf at 0) would poison
    engine.global_misfits_and_grad for the whole batch.  The double-where
    yields the 0 subgradient at the kink instead."""
    is0 = s == 0.0
    return jnp.where(is0, 0.0, jnp.sqrt(jnp.where(is0, 1.0, s)))


def pair_norms(ctx, ref_arr, syn_arr, mask, method, st: ProbeStatic):
    """misfit = |ref - syn| and norm factor = |ref| under `method`.

    ref/syn are the *processed* arrays to compare (filtered > tapered >
    plain, chosen by the caller); fa=1 for references, fb = syn_factor
    (l2norm_func etc., comparator.f90:627-697; double accumulation as in
    the reference).
    """
    dt = ACCUM(st.dt)
    fb = ctx["syn_factor"][..., None]
    diff = ref_arr - fb * syn_arr
    if method == L2NORM:
        m = gsqrt(dt * _accum(diff * diff, mask))
        n = gsqrt(dt * _accum(ref_arr * ref_arr, mask))
    elif method == L1NORM:
        m = dt * _accum(jnp.abs(diff), mask)
        n = dt * _accum(jnp.abs(ref_arr), mask)
    elif method == SCALAR_PRODUCT:
        m = _accum(ref_arr * fb * syn_arr, mask)
        n = _accum(ref_arr * ref_arr, mask)
    elif method == PEAK:
        fb2 = ctx["syn_factor"][..., None]
        m = jnp.max(gsqrt((ref_arr**2 + (fb2 * syn_arr) ** 2).astype(ACCUM)) * mask, axis=-1)
        n = jnp.max(jnp.abs(ref_arr).astype(ACCUM) * mask, axis=-1)
    else:
        raise ValueError(f"unsupported time-domain method {method}")
    return m.astype(F32), n.astype(F32)


def _next_pow2_i32(x):
    """Trace-safe next power of two for positive int32 (bit smear)."""
    y = jnp.maximum(x, 1) - 1
    y = y | (y >> 1)
    y = y | (y >> 2)
    y = y | (y >> 4)
    y = y | (y >> 8)
    y = y | (y >> 16)
    return y + 1


def uniform_rec_major(rids, nrec):
    """k if the rc rows are rec-major with k rows per receiver
    (rids == repeat(arange(nrec), k)), else None.  The single definition
    of 'uniform layout' shared by the synthesis rotation fold
    (engine.py) and the float-scan per-receiver epilogue below."""
    rids = np.asarray(rids)
    if nrec <= 0 or rids.shape[0] % nrec:
        return None
    k = rids.shape[0] // nrec
    return k if (rids == np.repeat(np.arange(nrec), k)).all() else None


def amp_grid(ps0, pl):
    """Extended-grid geometry (aps0, apl, ntrans_cap) for the exact
    per-pair ampspec path.

    With P = next_pow2(pl): apl = 4P, so every pow2 pair length up to the
    cap 2P divides apl (pair bins coincide with grid bins at stride
    apl // ntrans), and the margins ((4P - pl) // 2 >= 1.5P per side)
    contain the worst centered window: data spans live within the probe
    +- fold widening (<= P/2 in any physical plan, since the probe is
    sized to 2x the longest content), so ntrans <= next_pow2(pl + 4*fold)
    <= 2P and the centered window overhangs the union span by at most P
    per side.  A 2x grid (the first implementation) did NOT contain
    pairs longer than pl/2 placed off-center -- their repeat-right
    content was silently truncated (measured 2.7e-2 norm error on a
    right-aligned fold-widened span)."""
    p2 = 1 << (int(pl) - 1).bit_length()
    apl = 4 * p2
    return ps0 - (apl - pl) // 2, apl, 2 * p2


def ampspec_pair_misfits(ctx, syn, syn_lo, syn_hi, method, st: ProbeStatic):
    """Exact per-pair amplitude-spectrum misfits and reference norm factors.

    The reference evaluates ampspec norms after growing each (ref, syn)
    probe pair onto its own pow2 span (probes_adjust_spans,
    comparator.f90:464-486: ntrans = next_pow2(max(len(union(dataspans)),
    2*max(len_ref, len_syn))), centered on the union), FFTs the tapered
    (else raw zero-left/repeat-right) content over that span
    (update_spectrum, comparator.f90:1186-1215), and integrates with
    df = 1/(ntrans*dt).  The engine's probes live on ONE unified span, so
    this reconstructs the per-pair semantics exactly on the extended grid
    of amp_grid (4*next_pow2(pl) samples -- wide enough for every
    physical pair window; see amp_grid's bound):

    * amplitude spectra are invariant to circular time shifts, and a
      signal supported on one contiguous ntrans-length window folds into
      period ntrans as a pure circular shift -- so |FFT_apl(x * pairmask)|
      subsampled at stride m = apl // ntrans equals the pair's own
      |FFT_ntrans| exactly;
    * pair bin k' sits at frequency k'/(ntrans*dt) = (k'*m)*adf, i.e. pair
      bins coincide with extended-grid bins, so the PLF filter weights
      evaluated on the extended grid (ctx['amp_filter_w']) agree with the
      reference's per-pair evaluation (plf_taper_array is a pure function
      of the bin coordinate within each segment).

    syn: probe-placed synthetic content [..., RC, PL] (moment applied,
    untapered); syn_lo/syn_hi: [..., RC] absolute data spans.  Handles
    leading batch dims by broadcasting.  Returns (misfit, norm) shaped
    like syn_lo.

    End-repeat caveat: right of syn_hi the engine's windows hold the raw
    accumulation (usually zero), where the reference would repeat the
    strip's trailing sample; this is the same order-independent
    end-repeat regularization already recorded for the time-domain path
    (see tests/test_golden_oracle.py).  Tapered rows are unaffected.
    """
    ps0, pl, dt = st.ps0, st.pl, st.dt
    aps0, apl, ncap = amp_grid(ps0, pl)
    ref = ctx["ref"]
    ref_lo, ref_hi = ctx["ref_lo"], ctx["ref_hi"]

    # per-pair span (probes_adjust_spans + allowed_span)
    u_lo = jnp.minimum(ref_lo, syn_lo)
    u_hi = jnp.maximum(ref_hi, syn_hi)
    ulen = u_hi - u_lo + 1
    minlen = 2 * jnp.maximum(ref_hi - ref_lo + 1, syn_hi - syn_lo + 1)
    ntrans = jnp.minimum(_next_pow2_i32(jnp.maximum(ulen, minlen)), ncap)
    pair_lo = u_lo - (ntrans - ulen) // 2

    j = aps0 + jnp.arange(apl)  # absolute extended-grid indices

    def extend(arr):
        # place probe content on the extended grid: zeros left of the probe
        # span, the probe content, its (repeat-right) last value beyond
        rel = jnp.clip(j - ps0, 0, pl - 1)
        out = jnp.take(arr, rel, axis=-1)
        return jnp.where(j - ps0 < 0, 0.0, out)

    def tapered_ext(arr):
        ext = extend(arr)
        return jnp.where(ctx["has_taper"][..., None], ext * ctx["amp_taper_w"], ext)

    pmask = (j >= pair_lo[..., None]) & (j <= (pair_lo + ntrans - 1)[..., None])
    amp_r = jnp.abs(jnp.fft.rfft(tapered_ext(ref) * pmask, axis=-1)).astype(F32)
    amp_s = jnp.abs(jnp.fft.rfft(tapered_ext(syn) * pmask, axis=-1)).astype(F32)
    use_f = ctx["has_filter"][..., None]
    amp_r = jnp.where(use_f, amp_r * ctx["amp_filter_w"], amp_r)
    amp_s = jnp.where(use_f, amp_s * ctx["amp_filter_w"], amp_s)

    # pair bins = extended bins at stride m; df of the pair span
    k = jnp.arange(apl // 2 + 1)
    stride = apl // ntrans
    binmask = (k % stride[..., None]) == 0
    df = 1.0 / (ntrans.astype(ACCUM) * ACCUM(dt))
    fb = ctx["syn_factor"][..., None]
    diff = amp_r - fb * amp_s
    if method == AMPSPEC_L2NORM:
        m = gsqrt(df * jnp.sum((diff * diff).astype(ACCUM) * binmask, axis=-1))
        n = jnp.sqrt(df * jnp.sum((amp_r * amp_r).astype(ACCUM) * binmask, axis=-1))
    elif method == AMPSPEC_L1NORM:
        m = df * jnp.sum(jnp.abs(diff).astype(ACCUM) * binmask, axis=-1)
        n = df * jnp.sum(jnp.abs(amp_r).astype(ACCUM) * binmask, axis=-1)
    else:
        raise ValueError(f"unsupported frequency-domain method {method}")
    return m.astype(F32), n.astype(F32)


# ---------------------------------------------------------------------------
# top-level misfit evaluation
# ---------------------------------------------------------------------------


def fold_stf_weights(risetime, dt, nshift_max):
    """Boxcar-fold weights for post-synthesis rise time
    (receiver_scaled_seismograms_to_probes, receiver.f90:866-886).

    Returns (weights f32[2*nshift_max+1], integer shifts implied as
    k - nshift_max).  Weights are zero beyond the live range; risetime==0
    gives the identity kernel.
    """
    k = jnp.arange(2 * nshift_max + 1, dtype=F32) - nshift_max
    ts = k * dt
    lo = jnp.maximum(-risetime / 2.0, ts - dt / 2.0)
    hi = jnp.minimum(risetime / 2.0, ts + dt / 2.0)
    w = jnp.maximum(0.0, hi - lo)
    # live count per the reference: nshifts = 1 + 2*nint(0.5*risetime/dt)
    from .gf.trace import jnint

    nlive = 1 + 2 * jnint(0.5 * risetime / dt)
    half = (nlive - 1) // 2
    w = jnp.where(jnp.abs(k) <= half.astype(F32), w, 0.0)
    total = jnp.sum(w)
    w = jnp.where(total > 0, w / jnp.where(total > 0, total, 1.0), jnp.where(k == 0, 1.0, 0.0))
    return w


def apply_fold(vals, w):
    """Fold rows [..., NT] with integer-shift kernel w[K] (K = 2*h+1),
    using edge extension like strip_fold + trace_multiply_add.

    out[j] = sum_k w[k] * x_ext(j - (k - h)).
    """
    k = w.shape[-1]
    h = (k - 1) // 2
    nt = vals.shape[-1]
    idx = jnp.arange(nt)[None, :] - (jnp.arange(k)[:, None] - h)  # [K, NT]
    gathered = jnp.take(vals, jnp.clip(idx, 0, nt - 1), axis=-1)  # [..., K, NT]
    gathered = jnp.where(idx < 0, 0.0, gathered)
    return jnp.einsum("k,...kt->...t", w, gathered,
                      precision=jax.lax.Precision.HIGHEST)


def ref_norm_spans(ctx, st: ProbeStatic):
    """Span for the reference-only norm factor (probe_norm_timedomain,
    comparator.f90:824-859): taper span if defined, else the ref data span."""
    lo = jnp.where(ctx["has_taper"], ctx["taper_lo"], ctx["ref_lo"])
    hi = jnp.where(ctx["has_taper"], ctx["taper_hi"], ctx["ref_hi"])
    return lo, hi


def _ref_norm(ref_proc, mask, method, st: ProbeStatic):
    dt = ACCUM(st.dt)
    if method == L2NORM:
        return jnp.sqrt(dt * _accum(ref_proc * ref_proc, mask)).astype(F32)
    if method == L1NORM:
        return (dt * _accum(jnp.abs(ref_proc), mask)).astype(F32)
    if method == SCALAR_PRODUCT:
        return _accum(ref_proc * ref_proc, mask).astype(F32)
    if method == PEAK:
        return jnp.max(jnp.abs(ref_proc).astype(ACCUM) * mask, axis=-1).astype(F32)
    raise ValueError(f"unsupported method {method}")


def precompute_ref_context(ctx, method, st: ProbeStatic, shiftrange=(0, 0),
                           any_taper=True, any_filter=True):
    """Source-independent misfit quantities, computed once per plan:
    processed reference arrays (per shift for floating norms) and the
    reference norm factors.  Replaces the per-source reference probe updates
    of the reference implementation.

    The whole computation runs under ONE jit: eagerly, the per-shift loop
    dispatched hundreds of tiny device ops and cost ~6 s of plan-build time
    over the axon tunnel."""
    out = dict(_prc_jit(
        ctx, method, int(shiftrange[0]), int(shiftrange[1]),
        bool(any_filter), st.ps0, st.pl, float(st.dt),
    ))
    out["method"] = method
    if method in (FLOATING_L2NORM, FLOATING_L1NORM):
        out["base"] = L2NORM if method == FLOATING_L2NORM else L1NORM
    return out


@functools.partial(
    jax.jit, static_argnames=("method", "s1", "s2", "use_fft", "ps0", "pl", "dt")
)
def _prc_jit(ctx, method, s1, s2, use_fft, ps0, pl, dt):
    st = ProbeStatic(ps0=ps0, pl=pl, dt=dt)
    if method in (FLOATING_L2NORM, FLOATING_L1NORM):
        base = L2NORM if method == FLOATING_L2NORM else L1NORM
        shifts = np.arange(s1, s2 + 1)

        refs = []
        norms = []
        for s in shifts:
            sj = jnp.int32(int(s))
            ref_s = shift_probe(ctx["ref"], ctx["ref_lo"], ctx["ref_hi"], sj, st)
            tap_r, filt_r, _, _ = processed_arrays(ctx, ref_s, st, use_fft=use_fft)
            ref_proc = jnp.where(ctx["has_filter"][..., None], filt_r, tap_r)
            nlo, nhi = ref_norm_spans(
                ctx | {"ref_lo": ctx["ref_lo"] + int(s), "ref_hi": ctx["ref_hi"] + int(s)}, st
            )
            norms.append(_ref_norm(ref_proc, _span_mask(nlo, nhi, st), base, st))
            refs.append(ref_proc)
        ref_proc = jnp.stack(refs)  # [S, RC, PL]
        shifts_j = jnp.asarray(shifts, I32)
        in_range = (shifts_j[:, None] >= ctx["shift_lo"][None, :]) & (
            shifts_j[:, None] <= ctx["shift_hi"][None, :]
        )
        nstack = jnp.stack(norms)
        cnt = jnp.maximum(jnp.sum(in_range, axis=0), 1)
        norm = jnp.sum(jnp.where(in_range, nstack, 0.0), axis=0) / cnt
        return {
            "shifts": jnp.asarray(shifts, I32),
            "ref_proc": ref_proc,
            "ref_lo_s": ctx["ref_lo"][None, :] + jnp.asarray(shifts, I32)[:, None],
            "ref_hi_s": ctx["ref_hi"][None, :] + jnp.asarray(shifts, I32)[:, None],
            "norm": jnp.where(ctx["enabled"], norm, 0.0),
        }

    if method in (AMPSPEC_L2NORM, AMPSPEC_L1NORM):
        # ampspec norms are computed per-pair at eval time on the exact
        # extended grid (ampspec_pair_misfits); no unified-span reference
        # context exists for them
        return {}

    tap_r, filt_r, _amp_r, _ampf_r = processed_arrays(
        ctx, ctx["ref"], st, use_fft=use_fft)
    ref_proc = jnp.where(ctx["has_filter"][..., None], filt_r, tap_r)
    nlo, nhi = ref_norm_spans(ctx, st)
    norm = _ref_norm(ref_proc, _span_mask(nlo, nhi, st), method, st)
    return {
        "ref_proc": ref_proc,
        "norm": jnp.where(ctx["enabled"], norm, 0.0),
    }


def evaluate_misfits(
    ctx,
    syn_traces,
    syn_it0,
    syn_lo,
    syn_hi,
    method,
    st: ProbeStatic,
    nrec,
    moment=1.0,
    risetime=None,
    fold_nshift_max=0,
    shiftrange=(0, 0),
    rctx=None,
    any_taper=True,
    any_filter=True,
    eval_win=None,
):
    """Per-(receiver,component) misfits and norm factors for one source.

    syn_traces: f32[RC, NT_out] raw synthesis output; syn_it0: its absolute
    start index (static); syn_lo/syn_hi: i32[RC] physical data spans;
    moment: scalar factor applied like probe_set_array's factor_
    (receiver.f90:894-896); risetime: optional post-synthesis STF fold;
    rctx: precomputed reference context (precompute_ref_context) -- built on
    the fly if not supplied; eval_win: optional STATIC absolute sample
    bounds (w0, w1) known to contain every possible norm span (data spans
    under all shifts, tapers, fold margins) -- the time-domain sums then
    run on the [w0, w1] slice instead of the full probe (the probe length
    is FFT-padded to ~2x the data span, so this halves the eval's HBM
    traffic; the masks are identical on the slice by construction).

    Returns (misfit[RC], norm[RC], floating_shift[R]).
    """
    if rctx is None:
        rctx = precompute_ref_context(ctx, method, st, shiftrange, any_taper, any_filter)

    # undo the ctx amplitude normalization on the way out (see
    # MisfitSetup.device): misfit/norm are 1-homogeneous in (ref, fb*syn),
    # the scalar product is 2-homogeneous.  Apply s0 as CHAINED multiplies
    # ((x*s0)*s0), never as a standalone s0*s0: at the tiny scales this
    # normalization exists for (s0 ~ 1e-19) the bare square itself flushes
    # to zero in f32
    s0 = ctx.get("amp_scale", jnp.float32(1.0))

    def _unscale(x):
        x = x * s0
        return x * s0 if method == SCALAR_PRODUCT else x

    if risetime is not None and fold_nshift_max > 0:
        w = fold_stf_weights(risetime, jnp.float32(st.dt), fold_nshift_max)
        syn_traces = apply_fold(syn_traces, w)
        syn_lo = syn_lo - fold_nshift_max
        syn_hi = syn_hi + fold_nshift_max

    syn = place_on_probe(syn_traces, syn_it0, st) * jnp.float32(moment)

    if method in (AMPSPEC_L2NORM, AMPSPEC_L1NORM):
        m, n = ampspec_pair_misfits(ctx, syn, syn_lo, syn_hi, method, st)
        m = jnp.where(ctx["enabled"], m, 0.0)
        n = jnp.where(ctx["enabled"], n, 0.0)
        return _unscale(m), _unscale(n), jnp.zeros((nrec,), dtype=I32)

    use_fft = any_filter
    tap_s, filt_s, amp_s, ampf_s = processed_arrays(ctx, syn, st, use_fft=use_fft)

    # static slice bounds within the probe for the time-domain sums
    if eval_win is not None:
        i0 = max(int(eval_win[0]) - st.ps0, 0)
        i1 = min(int(eval_win[1]) - st.ps0 + 1, st.pl)
    else:
        i0, i1 = 0, st.pl

    if method in (FLOATING_L2NORM, FLOATING_L1NORM):
        base = L2NORM if method == FLOATING_L2NORM else L1NORM
        syn_proc = jnp.where(ctx["has_filter"][..., None], filt_s, tap_s)

        # misfit spans per shift: taper span (static) or union of data spans
        lo = jnp.where(
            ctx["has_taper"][None, :],
            ctx["taper_lo"][None, :],
            jnp.minimum(rctx["ref_lo_s"], syn_lo[None, :]),
        )
        hi = jnp.where(
            ctx["has_taper"][None, :],
            ctx["taper_hi"][None, :],
            jnp.maximum(rctx["ref_hi_s"], syn_hi[None, :]),
        )
        j = st.ps0 + i0 + jnp.arange(i1 - i0)
        mask = ((j >= lo[..., None]) & (j <= hi[..., None])).astype(F32)  # [S, RC, W]
        fb = ctx["syn_factor"][None, :, None]
        diff = (rctx["ref_proc"][..., i0:i1]
                - fb * syn_proc[None, :, i0:i1])
        dt = ACCUM(st.dt)
        if base == L2NORM:
            ms = gsqrt(dt * jnp.sum((diff * diff * mask).astype(ACCUM), axis=-1))
        else:
            ms = dt * jnp.sum((jnp.abs(diff) * mask).astype(ACCUM), axis=-1)
        ms = jnp.where(ctx["enabled"][None, :], ms.astype(F32), 0.0)

        per_rec = jax.vmap(
            lambda row: jax.ops.segment_sum(row, ctx["receiver_ids"], num_segments=nrec)
        )(ms**2 if base == L2NORM else ms)
        # per-receiver allowed shift window (rows of one receiver share it)
        rlo = jax.ops.segment_min(ctx["shift_lo"], ctx["receiver_ids"], num_segments=nrec)
        rhi = jax.ops.segment_max(ctx["shift_hi"], ctx["receiver_ids"], num_segments=nrec)
        allowed = (rctx["shifts"][:, None] >= rlo[None, :]) & (
            rctx["shifts"][:, None] <= rhi[None, :]
        )
        per_rec = jnp.where(allowed, per_rec, jnp.inf)
        iloc = jnp.argmin(per_rec, axis=0)  # [R]
        shift_sel = rctx["shifts"][iloc]
        m = jnp.take_along_axis(ms, iloc[ctx["receiver_ids"]][None, :], axis=0)[0]
        return _unscale(m), _unscale(rctx["norm"]), shift_sel

    zero_shift = jnp.zeros((nrec,), dtype=I32)
    syn_proc = jnp.where(ctx["has_filter"][..., None], filt_s, tap_s)
    lo, hi = norm_spans(ctx, syn_lo, syn_hi, st)
    j = st.ps0 + i0 + jnp.arange(i1 - i0)
    mask = ((j >= lo[..., None]) & (j <= hi[..., None])).astype(F32)
    m, _ = pair_norms(ctx, rctx["ref_proc"][..., i0:i1],
                      syn_proc[..., i0:i1], mask, method, st)
    m = jnp.where(ctx["enabled"], m, 0.0)
    return _unscale(m), _unscale(rctx["norm"]), zero_shift


def evaluate_misfits_floating_batch(
    ctx,
    syn_traces_b,
    syn_it0,
    syn_lo_b,
    syn_hi_b,
    method,
    st: ProbeStatic,
    nrec,
    moments,
    risetimes=None,
    fold_nshift_max=0,
    rctx=None,
    shiftrange=(0, 0),
    any_taper=True,
    eval_win=None,
    interpret=False,
    bt=32,
):
    """Batched floating-norm evaluation through the Pallas scan kernel
    (ops/float_scan.py) -- one pass over every synthetic instead of the
    vmapped path's S re-reads.

    Mathematically identical to jax.vmap(evaluate_misfits) over the batch
    for floating norms on NO-FILTER plans (the kernel's mask-free
    decomposition needs constant span tails; see ops/float_scan.py).
    f32 rounding differs in reduction order only.

    syn_traces_b: f32[B, RC, NT]; syn_lo_b/syn_hi_b: i32[B, RC] or [RC]
    (batch-shared); moments f32[B]; risetimes f32[B] or None.
    Returns (m [B, RC], norm [B, RC], floating_shift [B, R]).
    """
    from .ops.float_scan import scan_sums

    assert method in (FLOATING_L2NORM, FLOATING_L1NORM)
    base = L2NORM if method == FLOATING_L2NORM else L1NORM
    if rctx is None:
        rctx = precompute_ref_context(ctx, method, st, shiftrange, any_taper, False)

    B, RC, _nt = syn_traces_b.shape
    syn_lo_b = jnp.broadcast_to(jnp.atleast_2d(syn_lo_b), (B, RC))
    syn_hi_b = jnp.broadcast_to(jnp.atleast_2d(syn_hi_b), (B, RC))

    if risetimes is not None and fold_nshift_max > 0:
        wf = jax.vmap(
            lambda r: fold_stf_weights(r, jnp.float32(st.dt), fold_nshift_max)
        )(risetimes)
        syn_traces_b = jax.vmap(apply_fold)(syn_traces_b, wf)
        syn_lo_b = syn_lo_b - fold_nshift_max
        syn_hi_b = syn_hi_b + fold_nshift_max

    syn = place_on_probe(syn_traces_b, syn_it0, st) * moments.astype(F32)[:, None, None]
    syn_proc = _taper_arrays(ctx, syn)  # [B, RC, PL]; no-filter plans only
    syn_s = syn_proc * ctx["syn_factor"][None, :, None]

    # static window slice, padded to whole lane tiles (the kernel sums all
    # lanes; the tail correction handles everything right of each span)
    if eval_win is not None:
        i0 = max(int(eval_win[0]) - st.ps0, 0)
        i1 = min(int(eval_win[1]) - st.ps0 + 1, st.pl)
    else:
        i0, i1 = 0, st.pl
    wk = min(-(-(i1 - i0) // 128) * 128, st.pl)
    i0 = max(min(i0, st.pl - wk), 0)

    ref_sl = rctx["ref_proc"][..., i0:i0 + wk]  # [S, RC, W]
    syn_sl = syn_s[..., i0:i0 + wk]             # [B, RC, W]
    S = ref_sl.shape[0]

    bp = -(-B // bt) * bt
    syn_k = jnp.concatenate(
        [syn_sl, jnp.broadcast_to(syn_sl[-1:], (bp - B, RC, wk))]
    ) if bp != B else syn_sl
    out = scan_sums(
        ref_sl.reshape(S * RC, wk), syn_k.transpose(1, 0, 2),
        l2=(base == L2NORM), bt=bt, interpret=interpret,
    )[:, :B]  # [S, B, RC]

    # exact tail correction: right of hi = max(ref span, syn span) both
    # arrays repeat their edge values (zero for tapered rows)
    basei = st.ps0 + i0
    hi = jnp.maximum(rctx["ref_hi_s"][:, None, :], syn_hi_b[None, :, :])
    hi_loc = jnp.clip(hi - basei, 0, wk - 1)
    hi_loc = jnp.where(ctx["has_taper"][None, None, :], wk - 1, hi_loc)
    count = (wk - 1 - hi_loc).astype(F32)
    dlast = ref_sl[..., -1][:, None, :] - syn_sl[..., -1][None, :, :]
    tail = count * (dlast * dlast if base == L2NORM else jnp.abs(dlast))

    dtc = ACCUM(st.dt)
    # f32 rounding can leave out - tail a hair negative when the masked
    # span contributes ~nothing; clamp before the L2 sqrt
    sums = jnp.maximum((out - tail).astype(ACCUM), 0.0)
    ms = gsqrt(dtc * sums) if base == L2NORM else dtc * sums
    ms = jnp.where(ctx["enabled"][None, None, :], ms.astype(F32), 0.0)

    # per-receiver shift selection, exactly as evaluate_misfits
    rlo = jax.ops.segment_min(ctx["shift_lo"], ctx["receiver_ids"], num_segments=nrec)
    rhi = jax.ops.segment_max(ctx["shift_hi"], ctx["receiver_ids"], num_segments=nrec)
    allowed = (rctx["shifts"][:, None] >= rlo[None, :]) & (
        rctx["shifts"][:, None] <= rhi[None, :]
    )

    # ctx arrays are setup-time constants here (the whole eval is traced
    # with ctx closed over), so host-side layout decisions are free
    rids = np.asarray(ctx["receiver_ids"])
    msq = ms**2 if base == L2NORM else ms  # [S, B, RC]
    ku = uniform_rec_major(rids, nrec)
    uniform = ku is not None
    if uniform:
        per_rec = msq.reshape(S, B, nrec, ku).sum(axis=-1)
    else:
        per_rec = jnp.zeros((S, B, nrec), ACCUM).at[:, :, rids].add(msq)
    per_rec = jnp.where(allowed[:, None, :], per_rec, jnp.inf)
    iloc = jnp.argmin(per_rec, axis=0)  # [B, R]
    # one-hot select + sum instead of take_along_axis: the per-element
    # gather measured 1.25 ms on a [21, 4096, 30] table (39% of the fused
    # point program device time); the select fuses into the ms epilogue
    sel_r = jnp.arange(S, dtype=iloc.dtype)[:, None, None] == iloc[None]  # [S,B,R]
    shift_sel = jnp.sum(
        jnp.where(sel_r, rctx["shifts"][:, None, None], 0), axis=0
    ).astype(rctx["shifts"].dtype)
    if uniform:
        sel_rc = jnp.repeat(sel_r, ku, axis=2, total_repeat_length=RC)
    else:
        sel_rc = sel_r[:, :, rids]
    m = jnp.sum(jnp.where(sel_rc, ms, 0.0), axis=0)  # [B, RC]
    n = jnp.broadcast_to(rctx["norm"][None, :], (B, RC))
    # undo the ctx amplitude normalization (MisfitSetup.device); the
    # floating bases (l1/l2) are 1-homogeneous in (ref, fb*syn)
    s0 = ctx.get("amp_scale", jnp.float32(1.0))
    return m * s0, n * s0, shift_sel


def evaluate_misfits_floating_fused(
    ctx,
    v_rtw,
    wgt_rtb,
    syn_it0,
    syn_lo,
    syn_hi,
    method,
    st: ProbeStatic,
    nrec,
    moments,
    risetime0,
    fold_nshift_max=0,
    rctx=None,
    shiftrange=(0, 0),
    any_taper=True,
    any_filter=False,
    eval_win=None,
    k_share=1,
    interpret=False,
):
    """Shared-kinematics floating-norm evaluation with the synthesis
    contraction FUSED into the transposed scan kernel
    (ops/float_scan.fused_scan_sums): the synthetic block
    syn[b, rc] = sum_t wgt[rc, t, b] * v[rc, t] is never materialized in
    HBM.  Mathematically identical to evaluate_misfits_floating_batch on
    the synthetics that contraction would produce -- every processing
    step (fold, place_on_probe, taper, rfft -> PLF filter -> irfft,
    syn_factor, moment) is LINEAR, so it commutes with the weight
    contraction and is applied to the T values rows once instead of to B
    synthetics.  This is what gives FILTERED plans (the configuration
    real inversions run: band-pass + floating norms,
    tunguska/inversion.py set_misfit_filter in every standard Step) the
    same kernel fast path: the reference stack is masked per (shift, rc)
    span in-kernel instead of tail-corrected, since irfft ringing breaks
    the constant-tail decomposition.

    v_rtw: f32[RV, T, NT] raw values rows (receiver GF blend rows) with
        RV = RC // k_share (k_share > 1 = rows shared across each
        receiver's channel rows; requires a taper/filter-free plan) or RC.
    wgt_rtb: f32[RC, T, B] per-source weights (channel rotation + signs
        folded; moment/syn_factor applied here).
    moments: f32[B]; risetime0: traced scalar, the batch-UNIFORM risetime
        (callers gate on host-side uniformity).
    syn_lo/syn_hi: i32[RC] batch-shared physical spans.
    Returns (m [B, RC], norm [B, RC], floating_shift [B, R]).
    """
    from .ops.float_scan import BL, fused_scan_sums

    assert method in (FLOATING_L2NORM, FLOATING_L1NORM)
    base = L2NORM if method == FLOATING_L2NORM else L1NORM
    if rctx is None:
        rctx = precompute_ref_context(
            ctx, method, st, shiftrange, any_taper, any_filter)

    RC = wgt_rtb.shape[0]
    B = wgt_rtb.shape[2]
    S = rctx["ref_proc"].shape[0]

    if fold_nshift_max > 0:
        wf = fold_stf_weights(risetime0, jnp.float32(st.dt), fold_nshift_max)
        v_rtw = apply_fold(v_rtw, wf)
        syn_lo = syn_lo - fold_nshift_max
        syn_hi = syn_hi + fold_nshift_max

    v_p = place_on_probe(v_rtw, syn_it0, st)  # [RV, T, PL]
    if any_taper or any_filter:
        assert k_share == 1, "taper/filter rows need per-rc values rows"
        v_p = jnp.where(
            ctx["has_taper"][:, None, None], v_p * ctx["taper_w"][:, None, :], v_p
        )
    if any_filter:
        # probe processing chain on the values rows (processed_arrays
        # semantics, comparator.f90:1171-1263): T*RC small FFTs once per
        # batch instead of B*RC per batch
        spec = jnp.fft.rfft(v_p, axis=-1)
        filt = jnp.fft.irfft(spec * ctx["filter_w"][:, None, :], n=st.pl,
                             axis=-1).astype(F32)
        filt = jnp.where(
            ctx["has_taper"][:, None, None],
            filt * ctx["taper_zero_one"][:, None, :], filt)
        v_p = jnp.where(ctx["has_filter"][:, None, None], filt, v_p)
    # per-rc syn_factor and per-source moment fold into the weights
    wgt = (wgt_rtb * ctx["syn_factor"][:, None, None]
           * moments.astype(F32)[None, None, :])

    # static eval-window slice; W rides SUBLANES in the fused kernel, so
    # it pads to 8 (not 128 like scan_sums) -- less work on narrow spans
    if eval_win is not None:
        i0 = max(int(eval_win[0]) - st.ps0, 0)
        i1 = min(int(eval_win[1]) - st.ps0 + 1, st.pl)
    else:
        i0, i1 = 0, st.pl
    wk = min(-(-(i1 - i0) // 8) * 8, st.pl)
    i0 = max(min(i0, st.pl - wk), 0)

    ref_sl = rctx["ref_proc"][..., i0:i0 + wk]  # [S, RC, W]
    v_sl = v_p[..., i0:i0 + wk]                 # [RV, T, W]

    bp = -(-B // BL) * BL
    wgt_k = jnp.pad(wgt, ((0, 0), (0, 0), (0, bp - B))) if bp != B else wgt
    ref_tiles = jnp.broadcast_to(
        ref_sl.transpose(1, 0, 2)[..., None], (RC, S, wk, BL))
    v_tiles = jnp.broadcast_to(v_sl[..., None], v_sl.shape + (BL,))

    basei = st.ps0 + i0
    if any_filter:
        # exact per-(shift, rc) span masks in-kernel: filtered rows ring to
        # the probe edges, so the misfit integrates over the taper span or
        # the union of data spans (evaluate_misfits floating branch), not
        # full-window-minus-tail
        lo = jnp.where(
            ctx["has_taper"][None, :], ctx["taper_lo"][None, :],
            jnp.minimum(rctx["ref_lo_s"], syn_lo[None, :]))  # [S, RC]
        hi = jnp.where(
            ctx["has_taper"][None, :], ctx["taper_hi"][None, :],
            jnp.maximum(rctx["ref_hi_s"], syn_hi[None, :]))
        j = basei + jnp.arange(wk)
        mask = ((j[None, None, :] >= lo[..., None])
                & (j[None, None, :] <= hi[..., None])).astype(F32)  # [S,RC,W]
        mask_tiles = jnp.broadcast_to(
            mask.transpose(1, 0, 2)[..., None], (RC, S, wk, BL))
        out = fused_scan_sums(
            ref_tiles, v_tiles, wgt_k, mask_tiles=mask_tiles,
            k_share=k_share, l2=(base == L2NORM), interpret=interpret,
        )[..., :B]  # [RC, S, B]
        sums = jnp.maximum(out.transpose(1, 0, 2).astype(ACCUM), 0.0)
    else:
        out = fused_scan_sums(
            ref_tiles, v_tiles, wgt_k, k_share=k_share, l2=(base == L2NORM),
            interpret=interpret,
        )[..., :B]  # [RC, S, B]

        # exact tail correction (see evaluate_misfits_floating_batch): right
        # of hi both arrays repeat their edge values (zero for tapered rows)
        hi = jnp.maximum(rctx["ref_hi_s"], syn_hi[None, :])  # [S, RC]
        hi_loc = jnp.clip(hi - basei, 0, wk - 1)
        hi_loc = jnp.where(ctx["has_taper"][None, :], wk - 1, hi_loc)
        count = (wk - 1 - hi_loc).astype(F32)  # [S, RC]
        v_edge = v_sl[..., -1]  # [RV, T]
        if k_share > 1:
            v_edge = jnp.repeat(v_edge, k_share, axis=0, total_repeat_length=RC)
        syn_edge = jnp.einsum(
            "rtb,rt->rb", wgt, v_edge, precision=jax.lax.Precision.HIGHEST
        )  # [RC, B]
        dlast = ref_sl[..., -1][:, :, None] - syn_edge[None, :, :]  # [S, RC, B]
        tail = count[..., None] * (
            dlast * dlast if base == L2NORM else jnp.abs(dlast))
        sums = jnp.maximum((out.transpose(1, 0, 2) - tail).astype(ACCUM), 0.0)

    dtc = ACCUM(st.dt)
    ms = gsqrt(dtc * sums) if base == L2NORM else dtc * sums  # [S, RC, B]
    ms = jnp.where(ctx["enabled"][None, :, None], ms.astype(F32), 0.0)

    # per-receiver shift selection, exactly as evaluate_misfits_floating_batch
    # but in [S, RC, B] layout (saves the 10 MB transpose)
    rlo = jax.ops.segment_min(ctx["shift_lo"], ctx["receiver_ids"], num_segments=nrec)
    rhi = jax.ops.segment_max(ctx["shift_hi"], ctx["receiver_ids"], num_segments=nrec)
    allowed = (rctx["shifts"][:, None] >= rlo[None, :]) & (
        rctx["shifts"][:, None] <= rhi[None, :]
    )  # [S, R]

    rids = np.asarray(ctx["receiver_ids"])
    msq = ms**2 if base == L2NORM else ms  # [S, RC, B]
    ku = uniform_rec_major(rids, nrec)
    if ku is not None:
        per_rec = msq.reshape(S, nrec, ku, B).sum(axis=2)  # [S, R, B]
    else:
        per_rec = jnp.zeros((S, nrec, B), ACCUM).at[:, rids].add(msq)
    per_rec = jnp.where(allowed[..., None], per_rec, jnp.inf)
    iloc = jnp.argmin(per_rec, axis=0)  # [R, B]
    sel_r = jnp.arange(S, dtype=iloc.dtype)[:, None, None] == iloc[None]  # [S,R,B]
    shift_sel = jnp.sum(
        jnp.where(sel_r, rctx["shifts"][:, None, None], 0), axis=0
    ).astype(rctx["shifts"].dtype).T  # [B, R]
    if ku is not None:
        sel_rc = jnp.repeat(sel_r, ku, axis=1, total_repeat_length=RC)
    else:
        sel_rc = sel_r[:, rids]
    m = jnp.sum(jnp.where(sel_rc, ms, 0.0), axis=0).T  # [B, RC]
    n = jnp.broadcast_to(rctx["norm"][None, :], (B, RC))
    s0 = ctx.get("amp_scale", jnp.float32(1.0))
    return m * s0, n * s0, shift_sel


def global_misfit(misfits, norms):
    """sqrt(sum m^2)/sqrt(sum n^2) (minimizer_engine.f90:935-942).

    Accumulates in ACCUM (f32 tree reductions, ~1e-7 relative over <=
    hundreds of rc rows) like every other norm here: device f64 is
    emulated on TPU and an order of magnitude slower, and this runs
    per-source over whole grid-search batches.  Max-scaled (sminpack
    enorm style) with ONE shared scale so the ratio is unchanged but
    tiny amplitude scales (moment-1.0 sessions: m ~ 1e-19) don't flush
    their squares to zero."""
    m = misfits.astype(ACCUM)
    n = norms.astype(ACCUM)
    a = jnp.maximum(jnp.max(jnp.abs(m)), jnp.max(jnp.abs(n)))
    a_s = jnp.where(a == 0.0, 1.0, a)
    m = m / a_s
    n = n / a_s
    return jnp.sqrt(jnp.sum(m * m)) / jnp.sqrt(jnp.sum(n * n))


def cross_correlation(ctx, syn, shiftrange, st: ProbeStatic):
    """Windowed cross correlation: scalar products of syn against ref
    shifted through its window (probes_windowed_cross_corr,
    comparator.f90:1061-1090).  Returns [S, RC]."""
    s1, s2 = shiftrange

    def one_shift(s):
        ref_shifted = shift_probe(ctx["ref"], ctx["ref_lo"], ctx["ref_hi"], s, st)
        tap_r, filt_r, _, _ = processed_arrays(ctx, ref_shifted, st)
        ref_proc = jnp.where(ctx["has_filter"][..., None], filt_r, tap_r)
        tap_s, filt_s, _, _ = processed_arrays(ctx, syn, st)
        syn_proc = jnp.where(ctx["has_filter"][..., None], filt_s, tap_s)
        lo, hi = norm_spans(
            ctx | {"ref_lo": ctx["ref_lo"] + s, "ref_hi": ctx["ref_hi"] + s},
            ctx["ref_lo"] * 0 + st.ps0,
            ctx["ref_hi"] * 0 + st.ps0 + st.pl - 1,
            st,
        )
        mask = _span_mask(lo, hi, st)
        m, _ = pair_norms(ctx, syn_proc, ref_proc, mask, SCALAR_PRODUCT, st)
        # ctx holds ref/s0 and syn_factor/s0 (amplitude normalization,
        # MisfitSetup.device); the scalar product is 2-homogeneous --
        # chained multiplies, a bare s0*s0 flushes to zero at s0 ~ 1e-19
        s0 = ctx.get("amp_scale", jnp.float32(1.0))
        return m * s0 * s0

    return jax.lax.map(lambda s: one_shift(jnp.full((), s)), jnp.arange(s1, s2 + 1))


def peak_amplitude(ctx, syn_rows, mask, differentiate, st: ProbeStatic):
    """max |d^k u/dt^k| vector norm over grouped components
    (max_vecnorm_d1/d2, comparator.f90:519-589).  syn_rows: f32[G, PL] --
    already grouped; mask applies to the first finite-difference sample."""
    dt = jnp.float64(st.dt)
    if differentiate == 1:
        d = (syn_rows[..., :-1] - syn_rows[..., 1:]).astype(jnp.float64)
        dmask = mask[..., :-1]
    else:
        d = (
            syn_rows[..., :-2] - 2.0 * syn_rows[..., 1:-1] + syn_rows[..., 2:]
        ).astype(jnp.float64)
        dmask = mask[..., :-2]
    # max-scale before squaring: without f64 (emulated on TPU) the squares
    # of ~1e-19-scale samples flush to zero
    a = jnp.max(jnp.abs(d))
    a_s = jnp.where(a == 0.0, 1.0, a)
    power = jnp.sum((d / a_s) ** 2, axis=0)
    root = a * gsqrt(jnp.max(power * dmask))
    return root / (dt if differentiate == 1 else dt**2)


def arias_intensity(syn_rows, mask, st: ProbeStatic):
    """pi/(2g) * dt * sum of squared second differences / dt^2
    (arias_intensity_*, comparator.f90:591-625)."""
    dt = jnp.float64(st.dt)
    d = (syn_rows[..., :-2] - 2.0 * syn_rows[..., 1:-1] + syn_rows[..., 2:]).astype(jnp.float64)
    a = jnp.max(jnp.abs(d))
    a_s = jnp.where(a == 0.0, 1.0, a)
    total = (a * a) * jnp.sum(jnp.sum((d / a_s) ** 2, axis=0) * mask[..., :-2])
    return jnp.pi / (2.0 * 9.81) * dt * total / dt**2
