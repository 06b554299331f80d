"""Misfit engine tests (counterpart of test_comparator.f90)."""

import numpy as np
import jax.numpy as jnp

from kiwi_tpu import misfit as mf
from kiwi_tpu.plf import PLF


def make_setup(nrc=2, ps0=-8, pl=64, dt=0.5, receiver_ids=None):
    st = mf.ProbeStatic(ps0=ps0, pl=pl, dt=dt)
    if receiver_ids is None:
        receiver_ids = list(range(nrc))
    return mf.MisfitSetup(st, receiver_ids), st


def test_place_on_probe_extension():
    st = mf.ProbeStatic(ps0=-4, pl=16, dt=0.1)
    vals = jnp.asarray(np.array([[1.0, 2.0, 3.0]], dtype=np.float32))
    out = np.asarray(mf.place_on_probe(vals, 2, st))[0]
    # ps0=-4: indices -4..11; trace at 2,3,4; edge extension after
    expected = [0, 0, 0, 0, 0, 0, 1, 2, 3, 3, 3, 3, 3, 3, 3, 3]
    np.testing.assert_allclose(out, expected)


def test_shift_probe():
    st = mf.ProbeStatic(ps0=0, pl=8, dt=0.1)
    arr = jnp.asarray(np.array([[0, 0, 5.0, 6, 7, 7, 7, 7]], dtype=np.float32))
    lo = jnp.asarray([2])
    hi = jnp.asarray([4])
    out = np.asarray(mf.shift_probe(arr, lo, hi, jnp.int32(2), st))[0]
    np.testing.assert_allclose(out, [0, 0, 0, 0, 5, 6, 7, 7])
    out = np.asarray(mf.shift_probe(arr, lo, hi, jnp.int32(-2), st))[0]
    np.testing.assert_allclose(out, [5, 6, 7, 7, 7, 7, 7, 7])


def _eval(setup, st, syn, it0, lo, hi, method, nrec=None, **kw):
    ctx = setup.device()
    nrec = nrec if nrec is not None else int(setup.receiver_ids.max()) + 1
    return mf.evaluate_misfits(
        ctx,
        jnp.asarray(syn, jnp.float32),
        it0,
        jnp.asarray(lo, jnp.int32),
        jnp.asarray(hi, jnp.int32),
        method,
        st,
        nrec,
        **kw,
    )


def test_l2_l1_norms_no_taper():
    setup, st = make_setup(nrc=1, ps0=0, pl=32, dt=0.5)
    ref = np.array([1.0, 2.0, -1.0, 0.5], dtype=np.float32)
    setup.set_ref(0, ref, 4)
    syn = np.zeros((1, 10), dtype=np.float32)
    syn[0, 2:6] = [0.5, 1.5, -0.5, 0.25]  # placed at it0=2 -> abs 4..7
    m, n, _ = _eval(setup, st, syn, 2, [4], [7], mf.L2NORM)
    # union of dataspans = [4, 7]; diff = [0.5, 0.5, -0.5, 0.25]
    exp_m = np.sqrt(0.5 * (0.25 + 0.25 + 0.25 + 0.0625))
    exp_n = np.sqrt(0.5 * (1 + 4 + 1 + 0.25))
    assert abs(float(m[0]) - exp_m) < 1e-6
    assert abs(float(n[0]) - exp_n) < 1e-6

    m, n, _ = _eval(setup, st, syn, 2, [4], [7], mf.L1NORM)
    assert abs(float(m[0]) - 0.5 * 1.75) < 1e-6
    assert abs(float(n[0]) - 0.5 * 4.5) < 1e-6


def test_extension_contributes_outside_physical_span():
    # ref has static offset; syn zero: the repeated end value must enter the
    # norm across the union span
    setup, st = make_setup(nrc=1, ps0=0, pl=32, dt=1.0)
    setup.set_ref(0, np.array([2.0, 2.0], dtype=np.float32), 4)
    syn = np.zeros((1, 8), dtype=np.float32)
    # syn dataspan [2, 9]: union span [2, 9]; ref extended = 2 at 4..9, 0 at 2..3
    m, n, _ = _eval(setup, st, syn, 2, [2], [9], mf.L1NORM)
    assert abs(float(m[0]) - 2.0 * 6) < 1e-6
    # the norm factor integrates over the REFERENCE's own data span only
    # (probe_norm, comparator.f90:824-859): dt * (2 + 2) = 4
    assert abs(float(n[0]) - 4.0) < 1e-6


def test_taper_restricts_span_and_weights():
    setup, st = make_setup(nrc=1, ps0=0, pl=64, dt=1.0)
    ref = np.ones(20, dtype=np.float32)
    setup.set_ref(0, ref, 0)
    taper = PLF([2.0, 6.0, 10.0, 14.0], [0.0, 1.0, 1.0, 0.0])
    setup.set_taper(0, taper)
    syn = np.zeros((1, 20), dtype=np.float32)
    m, n, _ = _eval(setup, st, syn, 0, [0], [19], mf.L1NORM)
    w = taper.taper_weights((2, 14), 1.0)  # taper span [2, 14]
    # misfit = dt * sum |taper*ref - 0| over the taper span
    assert abs(float(m[0]) - w.sum()) < 1e-5
    assert abs(float(n[0]) - w.sum()) < 1e-5


def test_filter_roundtrip_identity():
    # an all-pass filter (flat plf over the full band) must reproduce the
    # tapered trace up to fft roundoff
    setup, st = make_setup(nrc=1, ps0=0, pl=64, dt=0.25)
    rng = np.random.default_rng(3)
    ref = rng.normal(size=30).astype(np.float32)
    ref[-1] = 0.0  # avoid edge extension differences beyond the trace
    setup.set_ref(0, ref, 5)
    nyq = 1.0 / (2 * 0.25)
    setup.set_filter(0, PLF([-0.1, -0.05, nyq * 2.0, nyq * 2.1], [0.0, 1.0, 1.0, 0.0]))
    syn = np.zeros((1, 40), dtype=np.float32)
    syn[0, :35] = np.concatenate([np.zeros(5), ref])
    m_f, n_f, _ = _eval(setup, st, syn, 0, [0], [39], mf.L2NORM)
    assert float(m_f[0]) < 1e-5 * float(n_f[0]) + 1e-6


def test_lowpass_filter_kills_nyquist():
    setup, st = make_setup(nrc=1, ps0=0, pl=64, dt=1.0)
    # pure alternating signal = energy at nyquist 0.5 Hz
    ref = (np.cos(np.pi * np.arange(41)) * np.hanning(41)).astype(np.float32)
    ref[-1] = 0.0
    setup.set_ref(0, ref, 0)
    setup.set_filter(0, PLF([0.0, 0.0, 0.05, 0.1], [0.0, 1.0, 1.0, 0.0]))
    syn = np.zeros((1, 41), dtype=np.float32)
    m, n, _ = _eval(setup, st, syn, 0, [0], [40], mf.L2NORM)
    # filtered ref ~ 0 -> misfit ~ 0 relative to unfiltered energy
    raw = np.sqrt(1.0 * (ref**2).sum())
    assert float(m[0]) < 0.02 * raw


def test_ampspec_shift_invariance():
    # amplitude spectra ignore time shifts (of circularly-contained signals)
    setup, st = make_setup(nrc=1, ps0=0, pl=128, dt=0.5)
    sig = (np.exp(-0.5 * ((np.arange(30) - 15) / 4.0) ** 2) * np.hanning(30)).astype(np.float32)
    sig[0] = sig[-1] = 0.0  # no edge extension: pure shift invariance
    setup.set_ref(0, sig, 10)
    syn = np.zeros((1, 60), dtype=np.float32)
    syn[0, 20:50] = sig
    m, n, _ = _eval(setup, st, syn, 0, [20], [49], mf.AMPSPEC_L2NORM)
    assert float(m[0]) < 2e-5 * float(n[0])


def test_floating_norm_recovers_shift():
    setup, st = make_setup(nrc=2, ps0=-16, pl=128, dt=0.5, receiver_ids=[0, 0])
    sig = np.sin(np.arange(24) / 3.0).astype(np.float32) * np.hanning(24).astype(np.float32)
    # reference = signal at 10; synthetic = same signal at 13 (shift +3)
    setup.set_ref(0, sig, 10)
    setup.set_ref(1, 0.5 * sig, 10)
    syn = np.zeros((2, 40), dtype=np.float32)
    syn[0, 13:37] = sig
    syn[1, 13:37] = 0.5 * sig
    m, n, fshift = _eval(
        setup, st, syn, 0, [13, 13], [36, 36], mf.FLOATING_L1NORM, nrec=1,
        shiftrange=(-6, 6),
    )
    assert int(fshift[0]) == 3
    assert float(m[0]) < 1e-6
    assert float(m[1]) < 1e-6
    assert float(n[0]) > 0


def test_global_misfit():
    m = jnp.asarray([3.0, 4.0])
    n = jnp.asarray([5.0, 0.0])
    assert abs(float(mf.global_misfit(m, n)) - 1.0) < 1e-12


def test_fold_stf_weights():
    w = np.asarray(mf.fold_stf_weights(jnp.float32(4.0), jnp.float32(1.0), 4))
    # risetime=4dt: nshifts=5, overlaps [.5,1,1,1,.5]/4 -> normalized /4
    expected = np.array([0, 0, 0.5, 1, 1, 1, 0.5, 0, 0]) / 4.0
    np.testing.assert_allclose(w, expected, atol=1e-7)
    # zero risetime: identity kernel
    w0 = np.asarray(mf.fold_stf_weights(jnp.float32(0.0), jnp.float32(1.0), 4))
    np.testing.assert_allclose(w0, [0, 0, 0, 0, 1, 0, 0, 0, 0], atol=1e-7)


def test_apply_fold_edge_extension():
    vals = jnp.asarray(np.array([[0, 0, 1.0, 1, 1, 1, 1, 1]], dtype=np.float32))
    w = jnp.asarray(np.array([0.25, 0.5, 0.25], dtype=np.float32))
    out = np.asarray(mf.apply_fold(vals, w))[0]
    # step smoothed; tail stays 1 (edge extension)
    np.testing.assert_allclose(out[-1], 1.0)
    np.testing.assert_allclose(out[2], 0.75)  # 0.25*x(3)+0.5*x(2)+0.25*x(1)


def test_scalar_product_and_peak_norms():
    """scalar_product = sum(ref*syn) with norm sum(ref^2); peak = max
    sqrt(ref^2 + syn^2) with norm max|ref| (scalar_product_2 / maxabs_func,
    comparator.f90:627-697)."""
    setup, st = make_setup(nrc=1, ps0=0, pl=32, dt=0.5)
    ref = np.array([1.0, -2.0, 3.0, 0.5], dtype=np.float32)
    setup.set_ref(0, ref, 4)
    syn = np.zeros((1, 10), dtype=np.float32)
    synvals = np.array([0.5, 1.5, -0.5, 0.25], np.float32)
    syn[0, 2:6] = synvals

    m, n, _ = _eval(setup, st, syn, 2, [4], [7], mf.SCALAR_PRODUCT)
    assert abs(float(m[0]) - float((ref * synvals).sum())) < 1e-6
    assert abs(float(n[0]) - float((ref * ref).sum())) < 1e-6

    m, n, _ = _eval(setup, st, syn, 2, [4], [7], mf.PEAK)
    exp_m = float(np.sqrt(ref.astype(np.float64) ** 2
                          + synvals.astype(np.float64) ** 2).max())
    assert abs(float(m[0]) - exp_m) < 1e-6
    assert abs(float(n[0]) - 3.0) < 1e-6


def test_peak_amplitude_and_arias_kernels():
    """d1/d2 finite-difference vecnorm peaks and Arias intensity vs direct
    numpy (max_vecnorm_d1/d2 + arias_intensity, comparator.f90:519-625)."""
    st = mf.ProbeStatic(ps0=0, pl=64, dt=0.5)
    rng = np.random.default_rng(5)
    rows = rng.normal(size=(3, 64)).astype(np.float32)  # 3 grouped components
    mask = np.ones(64, np.float32)

    d1 = (rows[:, :-1].astype(np.float64) - rows[:, 1:])
    exp_pv = np.sqrt((d1**2).sum(axis=0).max()) / 0.5
    got = float(mf.peak_amplitude({}, jnp.asarray(rows), jnp.asarray(mask), 1, st))
    assert abs(got - exp_pv) / exp_pv < 1e-6

    d2 = (rows[:, :-2].astype(np.float64) - 2 * rows[:, 1:-1] + rows[:, 2:])
    exp_pa = np.sqrt((d2**2).sum(axis=0).max()) / 0.25
    got2 = float(mf.peak_amplitude({}, jnp.asarray(rows), jnp.asarray(mask), 2, st))
    assert abs(got2 - exp_pa) / exp_pa < 1e-6

    exp_ai = np.pi / (2 * 9.81) * 0.5 * (d2**2).sum() / 0.25
    got3 = float(mf.arias_intensity(jnp.asarray(rows), jnp.asarray(mask), st))
    assert abs(got3 - exp_ai) / exp_ai < 1e-6


def test_cross_correlation_vs_numpy():
    """Windowed cross correlation = scalar products of syn against the
    shifted ref (probes_windowed_cross_corr, comparator.f90:1061-1090)."""
    setup, st = make_setup(nrc=1, ps0=0, pl=64, dt=0.5)
    rng = np.random.default_rng(8)
    ref = rng.normal(size=12).astype(np.float32)
    ref[-1] = 0.0
    setup.set_ref(0, ref, 10)
    syn_row = np.zeros((1, st.pl), np.float32)
    svals = rng.normal(size=12).astype(np.float32)
    syn_row[0, 12:24] = svals  # probe-relative; abs 12..23
    ctx = setup.device()
    cc = np.asarray(mf.cross_correlation(ctx, jnp.asarray(syn_row), (-3, 3), st))
    assert cc.shape == (7, 1)
    # hand-compute shift s = +2: ref moved to abs 12..23, aligned with syn
    ref_probe = np.zeros(st.pl, np.float32)
    ref_probe[10:22] = ref
    ref_probe[22:] = ref[-1]
    for k, s in enumerate(range(-3, 4)):
        shifted = np.zeros(st.pl, np.float32)
        lo, hi = 10 + s, 21 + s
        shifted[lo:hi + 1] = ref
        shifted[hi + 1:] = ref[-1]  # repeat-last extension
        # union of dataspans [lo, hi] u [probe span] -> full probe here
        exp = float((shifted * syn_row[0]).sum())
        assert abs(float(cc[k, 0]) - exp) < 2e-5 * max(1.0, abs(exp)), (s, cc[k, 0], exp)


def test_floating_batch_matches_vmapped_eval():
    """evaluate_misfits_floating_batch (the Pallas scan kernel path, in
    interpret mode) must match jax.vmap(evaluate_misfits) for both floating
    norms, with tapers on some rows, per-source spans, moments and STF
    folds -- pins the kernel's mask-free tail-correction decomposition."""
    import jax

    rng = np.random.default_rng(7)
    nrc, pl, ps0, dt = 5, 128, -10, 0.25
    setup, st = make_setup(nrc=nrc, ps0=ps0, pl=pl, dt=dt,
                           receiver_ids=[0, 0, 1, 1, 2])
    for irc in range(nrc):
        n = 30 + 3 * irc
        ref = rng.normal(size=n).astype(np.float32)
        ref[-1] = 0.7  # nonzero edge: exercises the repeat-tail correction
        setup.set_ref(irc, ref, 5 + irc)
    # taper on two rows (zero outside span: correction must vanish there)
    setup.set_taper(1, PLF([dt * 2, dt * 6, dt * 20, dt * 30], [0, 1, 1, 0]))
    setup.set_taper(3, PLF([dt * 0, dt * 4, dt * 16, dt * 28], [0, 1, 1, 0]))
    setup.shift_lo[:] = -6
    setup.shift_hi[:] = 6
    ctx = setup.device()
    nrec = 3
    shiftrange = (-6, 6)
    B, nt, it0 = 9, 40, 2
    syn = (rng.normal(size=(B, nrc, nt)) * 0.8).astype(np.float32)
    syn[..., -1] = 0.3  # nonzero syn edge too
    lo = np.full((B, nrc), it0, np.int32)
    hi = lo + nt - 1
    moments = (0.5 + rng.random(B)).astype(np.float32)
    risetimes = (dt * 3 * rng.random(B)).astype(np.float32)

    for method in (mf.FLOATING_L1NORM, mf.FLOATING_L2NORM):
        rctx = mf.precompute_ref_context(ctx, method, st, shiftrange,
                                         True, False)

        def one(s, l1, h1, mo, rt):
            return mf.evaluate_misfits(
                ctx, s, it0, l1, h1, method, st, nrec, moment=mo,
                risetime=rt, fold_nshift_max=3, shiftrange=shiftrange,
                rctx=rctx, any_taper=True, any_filter=False, eval_win=None)

        m0, n0, fs0 = jax.vmap(one)(
            jnp.asarray(syn), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(moments), jnp.asarray(risetimes))
        m1, n1, fs1 = mf.evaluate_misfits_floating_batch(
            ctx, jnp.asarray(syn), it0, jnp.asarray(lo), jnp.asarray(hi),
            method, st, nrec, jnp.asarray(moments), jnp.asarray(risetimes),
            fold_nshift_max=3, rctx=rctx, shiftrange=shiftrange,
            any_taper=True, eval_win=None, interpret=True)
        scale = max(float(jnp.abs(m0).max()), 1e-30)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=1e-5, atol=scale * 1e-5)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n0),
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(fs1), np.asarray(fs0))


def test_floating_batch_blocked_variant(monkeypatch):
    """The W-blocked scan kernel (long probes / wide scans stream both
    operands) must match the resident variant."""
    import jax

    from kiwi_tpu.ops import float_scan as fs

    rng = np.random.default_rng(3)
    S, RC, B, W = 9, 6, 64, 512
    ref = rng.normal(size=(S * RC, W)).astype(np.float32)
    syn = rng.normal(size=(RC, B, W)).astype(np.float32)
    for l2 in (False, True):
        res = np.asarray(fs.scan_sums(
            jnp.asarray(ref), jnp.asarray(syn), l2=l2, interpret=True))
        monkeypatch.setattr(fs, "VMEM_TARGET_BYTES", 1)
        blk = np.asarray(fs.scan_sums.__wrapped__(
            jnp.asarray(ref), jnp.asarray(syn), l2, 32, True))
        monkeypatch.undo()
        np.testing.assert_allclose(blk, res, rtol=2e-6,
                                   atol=np.abs(res).max() * 2e-6)


# -- exact per-pair ampspec semantics -----------------------------------------


def _ampspec_reference_host(ref, ref_it0, syn_row, syn_it0, dt, method,
                            taper=None, filt=None, syn_factor=1.0, moment=1.0):
    """Independent host-side transliteration of the reference's per-pair
    amplitude-spectrum norm (probes_adjust_spans comparator.f90:464-486,
    update_spectrum :1186-1215, l1/l2norm_func :627-676), in float64."""
    ref = np.asarray(ref, np.float64)
    syn_row = np.asarray(syn_row, np.float64) * moment
    a_lo, a_hi = ref_it0, ref_it0 + len(ref) - 1
    b_lo, b_hi = syn_it0, syn_it0 + len(syn_row) - 1
    u_lo, u_hi = min(a_lo, b_lo), max(a_hi, b_hi)
    ulen = u_hi - u_lo + 1
    minlen = 2 * max(len(ref), len(syn_row))
    ntrans = 1 << int(np.ceil(np.log2(max(ulen, minlen))))
    p_lo = u_lo - (ntrans - ulen) // 2

    def content(data, lo, hi):
        idx = np.arange(p_lo, p_lo + ntrans)
        vals = data[np.clip(idx - lo, 0, hi - lo)]
        return np.where(idx < lo, 0.0, vals)

    a = content(ref, a_lo, a_hi)
    b = content(syn_row, b_lo, b_hi)
    if taper is not None:
        w = taper.taper_weights((p_lo, p_lo + ntrans - 1), dt, ip="cos")
        a = a * w
        b = b * w
    amp_a = np.abs(np.fft.rfft(a))
    amp_b = np.abs(np.fft.rfft(b))
    df = 1.0 / (ntrans * dt)
    if filt is not None:
        fw = filt.taper_weights((0, ntrans // 2), df, ip="cos")
        amp_a = amp_a * fw
        amp_b = amp_b * fw
    d = amp_a - syn_factor * amp_b
    if method == mf.AMPSPEC_L2NORM:
        return np.sqrt(df * np.sum(d * d)), np.sqrt(df * np.sum(amp_a * amp_a))
    return df * np.sum(np.abs(d)), df * np.sum(np.abs(amp_a))


def test_ampspec_per_pair_parity_exact():
    """Device ampspec norms must reproduce the reference's per-pair grown
    pow2 spans and df exactly (VERDICT r3 item 5), on rows whose pair spans
    and ntrans all differ, with tapers and filters in play."""
    dt = 0.5
    setup, st = make_setup(nrc=4, ps0=-10, pl=256, dt=dt,
                           receiver_ids=[0, 1, 2, 3])
    rng = np.random.default_rng(11)

    refs = {
        0: (rng.normal(size=30).astype(np.float32), 5),
        1: (rng.normal(size=90).astype(np.float32), -5),
        2: (rng.normal(size=17).astype(np.float32), 40),
        3: (rng.normal(size=60).astype(np.float32), 0),
    }
    for irc, (vals, it0) in refs.items():
        setup.set_ref(irc, vals, it0)

    taper1 = PLF([-2.0, 3.0, 30.0, 41.0], [0.0, 1.0, 1.0, 0.0])
    taper3 = PLF([1.0, 4.0, 20.0, 28.0], [0.0, 1.0, 1.0, 0.0])
    setup.set_taper(1, taper1)
    setup.set_taper(3, taper3)
    filt2 = PLF([0.02, 0.08, 0.5, 0.8], [0.0, 1.0, 1.0, 0.0])
    filt3 = PLF([0.0, 0.0, 0.3, 0.6], [0.0, 1.0, 1.0, 0.0])
    setup.set_filter(2, filt2)
    setup.set_filter(3, filt3)
    setup.syn_factor[2] = 0.8

    # synthetic rows: window at it0=0, len 80; per-row physical spans with
    # constant tails up to the window end so the probe's repeat-right equals
    # the reference's strip end-repeat
    nt = 80
    syn = rng.normal(size=(4, nt)).astype(np.float32)
    lo = np.array([3, 0, 10, 2], dtype=np.int64)
    hi = np.array([nt - 1, 70, 60, nt - 1], dtype=np.int64)
    for r in range(4):
        syn[r, : lo[r]] = 0.0
        syn[r, hi[r]:] = syn[r, hi[r]]
    moment = 2.5

    tapers = {1: taper1, 3: taper3}
    filts = {2: filt2, 3: filt3}
    for method in (mf.AMPSPEC_L1NORM, mf.AMPSPEC_L2NORM):
        m, n, _ = _eval(setup, st, syn, 0, lo, hi, method, moment=moment)
        for irc in range(4):
            vals, it0 = refs[irc]
            em, en = _ampspec_reference_host(
                vals, it0, syn[irc, lo[irc]: hi[irc] + 1], int(lo[irc]), dt,
                method, taper=tapers.get(irc), filt=filts.get(irc),
                syn_factor=float(setup.syn_factor[irc]), moment=moment,
            )
            assert abs(float(m[irc]) - em) <= 1e-5 * max(em, en), (method, irc)
            assert abs(float(n[irc]) - en) <= 1e-5 * en, (method, irc)


def test_ampspec_pair_span_outside_probe_span():
    """A short pair centered near the probe edge makes the pair span stick
    out of the unified span; the extended grid must still be exact."""
    dt = 1.0
    setup, st = make_setup(nrc=1, ps0=0, pl=128, dt=dt, receiver_ids=[0])
    rng = np.random.default_rng(7)
    vals = rng.normal(size=12).astype(np.float32)
    setup.set_ref(0, vals, 0)
    nt = 16
    syn = rng.normal(size=(1, nt)).astype(np.float32)
    syn[0, -1] = syn[0, -2]
    m, n, _ = _eval(setup, st, syn, 0, [0], [nt - 1], mf.AMPSPEC_L1NORM)
    em, en = _ampspec_reference_host(vals, 0, syn[0], 0, dt, mf.AMPSPEC_L1NORM)
    assert abs(float(m[0]) - em) <= 1e-5 * max(em, en)
    assert abs(float(n[0]) - en) <= 1e-5 * en


def test_ampspec_long_offcenter_pair_fits_grid():
    """A pair LONGER than pl/2 placed off-center (right-aligned spans whose
    centered pow2 window overhangs the probe) must not be truncated by the
    extended grid (round-4 review finding: the first 2x grid silently cut
    the repeat-right content, 2.7e-2 norm error)."""
    dt = 1.0
    setup, st = make_setup(nrc=1, ps0=0, pl=128, dt=dt, receiver_ids=[0])
    rng = np.random.default_rng(13)
    # ref len 60 right-aligned in the probe; nonzero trailing samples so
    # the repeat-right content beyond the window matters
    vals = rng.normal(size=60).astype(np.float32)
    setup.set_ref(0, vals, 68)
    # syn span len 70 right-aligned (e.g. fold-widened past pl/2)
    nt = 70
    syn = rng.normal(size=(1, nt)).astype(np.float32)
    syn[0, -1] = 1.7  # nonzero end-repeat
    for method in (mf.AMPSPEC_L1NORM, mf.AMPSPEC_L2NORM):
        m, n, _ = _eval(setup, st, syn, 58, [58], [127], method)
        em, en = _ampspec_reference_host(vals, 68, syn[0], 58, dt, method)
        assert abs(float(m[0]) - em) <= 1e-5 * max(em, en), (method, m, em)
        assert abs(float(n[0]) - en) <= 1e-5 * en, (method, n, en)
