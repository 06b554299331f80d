"""VMEM-window Pallas kernel (ops/synth_window) vs the XLA grouped path.

Runs in interpret mode on the CPU mesh; the real-TPU path is exercised by
benchmark/profile_finite.py and was validated bit-for-bit (2e-7 relative,
f32 reduction order) against this same interpret path on a v5e.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kiwi_tpu import geo, synth
from kiwi_tpu.engine import Engine, Receiver
from kiwi_tpu.gf import elseis
from kiwi_tpu.ops import synth_window as sw


@pytest.fixture(scope="module")
def setup():
    stf = np.array([0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    store = elseis.build_ahfull_store(
        nx=40, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for i in range(4):
        d = 1200.0 + 400.0 * i
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.3 * i)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    p = np.array(
        [0, 0, 0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", p)
    return eng, p, store


def test_window_kernel_matches_grouped(setup):
    eng, p, store = setup
    batch = np.tile(p, (3, 1))
    batch[:, 5] = np.array([20.0, 91.0, 200.0], np.float32)
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    cfg = plan["cfg"]
    assert sw.usable(cfg)

    gfd = jnp.asarray(store.data)
    gfi = jnp.asarray(store.itmin)
    zsl = np.s_[cfg.iz0:cfg.iz0 + cfg.nzw]
    xsl = np.s_[cfg.ix0:cfg.ix0 + cfg.nxw]
    ext = synth.materialize_window(gfd[xsl, zsl], gfi[xsl, zsl], cfg)
    ext_flat = sw.pack_ext(ext, cfg)
    geom = eng._geometry().device()

    def ref_one(cent, rec):
        kin = synth._centroid_kinematics(cfg, rec, cent)
        return synth._grouped_accumulate(ext, cfg, kin, gsize)

    ref = np.asarray(
        jax.vmap(lambda c: jax.vmap(lambda r: ref_one(c, r))(geom))(cbatch)
    )

    def kin_one(cent):
        return jax.vmap(lambda rec: synth._centroid_kinematics(cfg, rec, cent))(geom)

    kin = jax.vmap(kin_one)(cbatch)
    ard = np.asarray(sw.synthesize_ard_batch(ext_flat, cfg, kin, gsize,
                                             interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ard, ref, rtol=1e-5, atol=scale * 1e-5)


def test_window_dma_variant_matches_resident(setup, monkeypatch):
    """Force the HBM + row-DMA kernel on the small window and check it
    against the VMEM-resident variant (same math, different staging)."""
    eng, p, store = setup
    batch = np.tile(p, (2, 1))
    batch[:, 5] = np.array([45.0, 135.0], np.float32)
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    cfg = plan["cfg"]

    gfd = jnp.asarray(store.data)
    gfi = jnp.asarray(store.itmin)
    ext = synth.materialize_window(
        gfd[cfg.ix0:cfg.ix0 + cfg.nxw, cfg.iz0:cfg.iz0 + cfg.nzw],
        gfi[cfg.ix0:cfg.ix0 + cfg.nxw, cfg.iz0:cfg.iz0 + cfg.nzw], cfg)
    ext_flat = sw.pack_ext(ext, cfg)
    geom = eng._geometry().device()

    def kin_one(cent):
        return jax.vmap(lambda rec: synth._centroid_kinematics(cfg, rec, cent))(geom)

    kin = jax.vmap(kin_one)(cbatch)
    res = np.asarray(sw.synthesize_ard_batch(ext_flat, cfg, kin, gsize,
                                             interpret=True))
    monkeypatch.setattr(sw, "VMEM_RESIDENT_BYTES", 0)
    sw.window_forward.clear_cache()
    # the layout rule depends on residency: re-pack under the forced budget
    # (the DMA variant uses the 8-aligned row pitch)
    ext_flat_dma = sw.pack_ext(ext, cfg)
    assert ext_flat_dma.shape[0] > ext_flat.shape[0]
    dma = np.asarray(sw.synthesize_ard_batch(ext_flat_dma, cfg, kin, gsize,
                                             interpret=True))
    sw.window_forward.clear_cache()
    scale = max(np.abs(res).max(), 1e-30)
    np.testing.assert_allclose(dma, res, rtol=1e-6, atol=scale * 1e-6)


def test_smem_chunk_cap(setup):
    """The engine caps window-kernel batches so the scalar-prefetch index
    arrays (node_rows + kks) fit SMEM (~1 MB/core)."""
    eng, p, store = setup
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(
        np.tile(p, (2, 1)))
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    if plan["max_chunk"] is None:
        pytest.skip("window path not active in this environment")
    R = 4
    ncent = int(np.prod(shape))
    P = ncent // gsize
    words = R * P + ncent
    assert plan["max_chunk"] * words * 4 <= 800 * 1024


def test_usable_gates():
    from kiwi_tpu.synth import SynthConfig

    base = dict(dt=0.1, dx=50.0, dz=50.0, firstx=50.0, firstz=0.0, ng=10,
                nt=100, ix0=0, iz0=0, out_it0=0, s_base=-8)
    ok = SynthConfig(**base, nxw=64, nzw=24, nt_out=80, s_len=24)
    assert sw.usable(ok)
    # time axes beyond 128 lanes are multi-tile wide vectors, still usable
    long_t = SynthConfig(**base, nxw=64, nzw=24, nt_out=140, s_len=24)
    assert sw.usable(long_t)
    tele = SynthConfig(**base, nxw=64, nzw=24, nt_out=1900, s_len=64)
    assert sw.usable(tele)
    # beyond T_MAX: falls back to the XLA paths
    huge_t = SynthConfig(**base, nxw=64, nzw=24, nt_out=2100, s_len=64)
    assert not sw.usable(huge_t)
    # a shift range whose bucket scratch would blow scoped VMEM
    huge_s = SynthConfig(**base, nxw=64, nzw=24, nt_out=960, s_len=960)
    assert not sw.usable(huge_s)
    # window too big for VMEM residency: still usable -- it takes the
    # HBM + per-group row-DMA kernel variant
    big = SynthConfig(**base, nxw=512, nzw=64, nt_out=80, s_len=24)
    assert sw.usable(big)
    n_rows = big.nxw * big.nzw * big.ng
    assert n_rows * 128 * 4 > sw.VMEM_RESIDENT_BYTES


def test_tall_group_matches_numpy_oracle():
    """G = 6 (a taller-than-typical sublane stack, still <= 8): pin the
    group-stacked kernel math against a numpy emulation on synthetic
    operands."""
    from kiwi_tpu.synth import SynthConfig

    rng = np.random.default_rng(3)
    B, R, P, G, ng = 2, 3, 5, 6, 10
    nxw, nzw = 6, 5
    nt_out, s_len = 40, 24
    nt_ext = nt_out + s_len
    N = nxw * nzw
    ext = rng.normal(size=(N * ng, nt_ext)).astype(np.float32)
    ext_flat = jnp.asarray(np.pad(ext, ((0, 0), (0, 128 - nt_ext))))
    node = rng.integers(0, N - nzw - 2, size=(B, R, P)).astype(np.int32)
    strides3 = jnp.asarray(np.array([1, nzw, nzw + 1], np.int32))
    kks = rng.integers(0, s_len, size=(B, 1, P, G)).astype(np.int32)
    wsp = rng.random((B, R, P, 4)).astype(np.float32)
    wm = rng.random((B, R, P, G, sw.NW)).astype(np.float32)
    wsp_b = jnp.broadcast_to(jnp.asarray(wsp)[..., None], wsp.shape + (128,))
    wm_t = np.swapaxes(wm, -1, -2)  # group-major [B, R, P, NW, G]
    wm_b = jnp.broadcast_to(jnp.asarray(wm_t)[..., None], wm_t.shape + (128,))

    out = np.asarray(sw.window_forward(
        ext_flat, jnp.asarray(node), strides3, jnp.asarray(kks), wsp_b, wm_b,
        G=G, ng=ng, nshift=s_len, interpret=True))

    # numpy oracle of the kernel math
    s3 = np.array([ng, nzw * ng, (nzw + 1) * ng])
    ref = np.zeros((B, R, 3, 128), np.float32)
    extp = np.pad(ext, ((0, 0), (0, 128 - nt_ext)))
    for b in range(B):
        for r in range(R):
            for p in range(P):
                base = node[b, r, p] * ng
                rows = (extp[base:base + ng] * wsp[b, r, p, 0]
                        + extp[base + s3[0]:base + s3[0] + ng] * wsp[b, r, p, 1]
                        + extp[base + s3[1]:base + s3[1] + ng] * wsp[b, r, p, 2]
                        + extp[base + s3[2]:base + s3[2] + ng] * wsp[b, r, p, 3])
                sb = np.roll(rows, -1, axis=1)
                for g in range(G):
                    w = wm[b, r, p, g]
                    kk = kks[b, 0, p, g]
                    c = w[8] * sb + w[9] * rows
                    p1 = w[0] * c[0] + w[1] * c[1] + w[2] * c[2] + w[5] * c[8]
                    p2 = w[3] * c[3] + w[4] * c[4]
                    dd = w[0] * c[5] + w[1] * c[6] + w[2] * c[7] + w[5] * c[9]
                    av = w[6] * p1 - w[7] * p2
                    rv = w[7] * p1 + w[6] * p2
                    for ch, row in ((0, av), (1, rv), (2, dd)):
                        ref[b, r, ch] += np.roll(row, -kk)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=scale * 1e-5)


def test_long_window_matches_numpy_oracle():
    """T > 128 (multi-lane-tile time axis): the wide-vector kernel against
    a numpy emulation on synthetic operands (nt_ext = 300 -> T = 384)."""
    rng = np.random.default_rng(11)
    B, R, P, G, ng = 2, 2, 4, 3, 10
    nxw, nzw = 6, 5
    nt_out, s_len = 260, 40
    nt_ext = nt_out + s_len
    T = -(-nt_ext // 128) * 128
    ngp = 16  # multi-tile layout pads node rows to an 8-multiple pitch
    N = nxw * nzw
    ext3 = rng.normal(size=(N, ng, nt_ext)).astype(np.float32)
    extp = np.pad(ext3, ((0, 0), (0, ngp - ng), (0, T - nt_ext)))
    ext_flat = jnp.asarray(extp.reshape(N * ngp, T))
    node = rng.integers(0, N - nzw - 2, size=(B, R, P)).astype(np.int32)
    strides3 = jnp.asarray(np.array([1, nzw, nzw + 1], np.int32))
    kks = rng.integers(0, s_len, size=(B, 1, P, G)).astype(np.int32)
    wsp = rng.random((B, R, P, 4)).astype(np.float32)
    wm = rng.random((B, R, P, G, sw.NW)).astype(np.float32)
    wsp_b = jnp.broadcast_to(jnp.asarray(wsp)[..., None], wsp.shape + (128,))
    wm_t = np.swapaxes(wm, -1, -2)  # group-major [B, R, P, NW, G]
    wm_b = jnp.broadcast_to(jnp.asarray(wm_t)[..., None], wm_t.shape + (128,))

    out = np.asarray(sw.window_forward(
        ext_flat, jnp.asarray(node), strides3, jnp.asarray(kks), wsp_b, wm_b,
        G=G, ng=ng, nshift=s_len, interpret=True))
    assert out.shape == (B, R, 3, T)

    s3 = np.array([1, nzw, nzw + 1])
    ref = np.zeros((B, R, 3, T), np.float32)
    for b in range(B):
        for r in range(R):
            for p in range(P):
                nd = node[b, r, p]
                ep = extp[:, :ng]
                rows = (ep[nd] * wsp[b, r, p, 0]
                        + ep[nd + s3[0]] * wsp[b, r, p, 1]
                        + ep[nd + s3[1]] * wsp[b, r, p, 2]
                        + ep[nd + s3[2]] * wsp[b, r, p, 3])
                sb = np.roll(rows, -1, axis=1)
                for g in range(G):
                    w = wm[b, r, p, g]
                    kk = kks[b, 0, p, g]
                    c = w[8] * sb + w[9] * rows
                    p1 = w[0] * c[0] + w[1] * c[1] + w[2] * c[2] + w[5] * c[8]
                    p2 = w[3] * c[3] + w[4] * c[4]
                    dd = w[0] * c[5] + w[1] * c[6] + w[2] * c[7] + w[5] * c[9]
                    av = w[6] * p1 - w[7] * p2
                    rv = w[7] * p1 + w[6] * p2
                    for ch, row in ((0, av), (1, rv), (2, dd)):
                        ref[b, r, ch] += np.roll(row, -kk)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=scale * 1e-5)


@pytest.fixture(scope="module")
def setup_long():
    """A store with long traces: plans get nt_ext > 256 (multi-tile T)."""
    stf = np.concatenate([
        np.zeros(4), np.linspace(0.0, 1.0, 80), np.ones(40)])
    store = elseis.build_ahfull_store(
        nx=40, nz=8, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for i in range(3):
        d = 1200.0 + 500.0 * i
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.3 * i)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    p = np.array(
        [0, 0, 0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    eng.set_source_params("bilateral", p)
    return eng, p, store


def test_long_window_engine_matches_grouped(setup_long):
    """Engine plans whose nt_ext exceeds 128 lanes keep the window kernel
    (the round-2 fallback regime) and match the XLA grouped path."""
    eng, p, store = setup_long
    batch = np.tile(p, (2, 1))
    batch[:, 5] = np.array([30.0, 200.0], np.float32)
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape, gsize=gsize)
    cfg = plan["cfg"]
    assert cfg.nt_out + cfg.s_len > 128, "store too short for this test"
    assert sw.usable(cfg)

    gfd = jnp.asarray(store.data)
    gfi = jnp.asarray(store.itmin)
    zsl = np.s_[cfg.iz0:cfg.iz0 + cfg.nzw]
    xsl = np.s_[cfg.ix0:cfg.ix0 + cfg.nxw]
    ext = synth.materialize_window(gfd[xsl, zsl], gfi[xsl, zsl], cfg)
    ext_flat = sw.pack_ext(ext, cfg)
    assert ext_flat.shape[1] % 128 == 0 and ext_flat.shape[1] > 128
    geom = eng._geometry().device()

    def ref_one(cent, rec):
        kin = synth._centroid_kinematics(cfg, rec, cent)
        return synth._grouped_accumulate(ext, cfg, kin, gsize)

    ref = np.asarray(
        jax.vmap(lambda c: jax.vmap(lambda r: ref_one(c, r))(geom))(cbatch)
    )

    def kin_one(cent):
        return jax.vmap(lambda rec: synth._centroid_kinematics(cfg, rec, cent))(geom)

    kin = jax.vmap(kin_one)(cbatch)
    ard = np.asarray(sw.synthesize_ard_batch(ext_flat, cfg, kin, gsize,
                                             interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ard, ref, rtol=1e-5, atol=scale * 1e-5)


def test_p_axis_grid_split_matches_unsplit():
    """Plans whose weight blocks exceed the scoped-VMEM budget split the P
    axis over a third grid dimension (accumulating in scratch); forcing a
    tiny budget must not change results."""
    from kiwi_tpu.synth import SynthConfig

    rng = np.random.default_rng(5)
    B, R, P, G, ng = 2, 2, 11, 3, 10
    nxw, nzw = 6, 5
    nt_out, s_len = 40, 24
    nt_ext = nt_out + s_len
    N = nxw * nzw
    ext = rng.normal(size=(N * ng, nt_ext)).astype(np.float32)
    ext_flat = jnp.asarray(np.pad(ext, ((0, 0), (0, 128 - nt_ext))))
    node = jnp.asarray(rng.integers(0, N - nzw - 2, size=(B, R, P))
                       .astype(np.int32))
    strides3 = jnp.asarray(np.array([1, nzw, nzw + 1], np.int32))
    kks = jnp.asarray(rng.integers(0, s_len, size=(B, 1, P, G)).astype(np.int32))
    wsp = rng.random((B, R, P, 4)).astype(np.float32)
    wm = rng.random((B, R, P, G, sw.NW)).astype(np.float32)
    wsp_b = jnp.broadcast_to(jnp.asarray(wsp)[..., None], wsp.shape + (128,))
    wm_t = np.swapaxes(wm, -1, -2)  # group-major [B, R, P, NW, G]
    wm_b = jnp.broadcast_to(jnp.asarray(wm_t)[..., None], wm_t.shape + (128,))

    args = (ext_flat, node, strides3, kks, wsp_b, wm_b)
    ref = np.asarray(sw.window_forward(*args, G=G, ng=ng, nshift=s_len,
                                       interpret=True))
    budget = sw.VMEM_BUDGET_BYTES
    try:
        # leave room for exactly ~2 groups per block -> NP = ceil(11/2) = 6,
        # padded to 12 with no-op groups
        per_p = (G * sw.NW + 4) * 128 * 4
        sw.VMEM_BUDGET_BYTES = (ext_flat.shape[0] * 128 * 4
                                + (s_len * 3 + 8) * 128 * 4 + 4 * per_p)
        sw.window_forward.clear_cache()
        split = np.asarray(sw.window_forward(*args, G=G, ng=ng, nshift=s_len,
                                             interpret=True))
    finally:
        sw.VMEM_BUDGET_BYTES = budget
        sw.window_forward.clear_cache()
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(split, ref, rtol=1e-6, atol=scale * 1e-6)


def test_engine_window_wiring_matches_xla_path(setup, monkeypatch):
    """Full engine integration: with the window kernel forced on (interpret
    mode), misfits/norms/shifts from the batched forward must match the
    XLA path -- pins the span tables, rc gather, chunking and fold wiring
    around the kernel, not just the kernel math."""
    eng, p, store = setup
    monkeypatch.setenv("KIWI_WINDOW_INTERPRET", "1")
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.3, 0.3)
    eng.set_source_params("bilateral", p)
    eng.set_synthetic_reference()

    batch = np.tile(p, (3, 1))
    batch[:, 5] = np.array([45.0, 135.0, 291.0], np.float32)
    cbatch, moments, risetimes, shape, gsize = eng._discretize_batch(batch)
    plan = eng._ensure_plan(cbatch, float(np.max(risetimes)), shape,
                            gsize=gsize)
    assert plan["max_chunk"] is not None, "window path not active"
    cbj = {k: jnp.asarray(v) for k, v in cbatch.items()}
    moj, rtj = jnp.asarray(moments), jnp.asarray(risetimes)
    m_k, n_k, fs_k = [np.asarray(x) for x in
                      plan["forward_batch"](cbj, moj, rtj)]
    m_x, n_x, fs_x = [np.asarray(x) for x in
                      jax.jit(plan["forward_batch_raw_xla"])(cbj, moj, rtj)]
    scale = max(np.abs(m_x).max(), 1e-30)
    np.testing.assert_allclose(m_k, m_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_allclose(n_k, n_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_array_equal(fs_k, fs_x)


def test_dma_variant_with_p_split(monkeypatch):
    """The HBM+row-DMA kernel combined with a split P axis (both limits hit
    at once: window too big for VMEM residency AND weight blocks over the
    scoped budget) must still match the resident single-block result."""
    rng = np.random.default_rng(9)
    B, R, P, G, ng = 2, 2, 7, 2, 10
    nxw, nzw = 6, 5
    nt_out, s_len = 40, 24
    nt_ext = nt_out + s_len
    N = nxw * nzw
    ext = rng.normal(size=(N * ng, nt_ext)).astype(np.float32)
    ext_flat = jnp.asarray(np.pad(ext, ((0, 0), (0, 128 - nt_ext))))
    node = jnp.asarray(rng.integers(0, N - nzw - 2, size=(B, R, P))
                       .astype(np.int32))
    strides3 = jnp.asarray(np.array([1, nzw, nzw + 1], np.int32))
    kks = jnp.asarray(rng.integers(0, s_len, size=(B, 1, P, G)).astype(np.int32))
    wsp = rng.random((B, R, P, 4)).astype(np.float32)
    wm = rng.random((B, R, P, G, sw.NW)).astype(np.float32)
    wsp_b = jnp.broadcast_to(jnp.asarray(wsp)[..., None], wsp.shape + (128,))
    wm_t = np.swapaxes(wm, -1, -2)  # group-major [B, R, P, NW, G]
    wm_b = jnp.broadcast_to(jnp.asarray(wm_t)[..., None], wm_t.shape + (128,))
    args = (ext_flat, node, strides3, kks, wsp_b, wm_b)

    ref = np.asarray(sw.window_forward(*args, G=G, ng=ng, nshift=s_len,
                                       interpret=True))
    # the DMA variant uses the production 8-aligned row pitch
    ngp = 16
    extp = np.pad(ext.reshape(N, ng, nt_ext),
                  ((0, 0), (0, ngp - ng), (0, 128 - nt_ext)))
    args_dma = (jnp.asarray(extp.reshape(N * ngp, 128)),) + args[1:]
    per_p = (G * sw.NW + 4) * 128 * 4
    monkeypatch.setattr(sw, "VMEM_RESIDENT_BYTES", 0)
    monkeypatch.setattr(
        sw, "VMEM_BUDGET_BYTES",
        2 * 4 * ngp * 128 * 4 + (s_len * 3 + 8 + 3 * ngp) * 128 * 4
        + 6 * per_p)
    sw.window_forward.clear_cache()
    try:
        got = np.asarray(sw.window_forward(*args_dma, G=G, ng=ng, ngp=ngp,
                                           nshift=s_len, interpret=True))
    finally:
        sw.window_forward.clear_cache()
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=scale * 1e-6)


def test_g_split_matches_grouped_xla():
    """gsize > 8 (e.g. device-eikonal plans with many time cells per node):
    pack_kinematics splits groups into ceil(G/8) zero-padded sub-groups of
    8; the result must match the XLA grouped path at the original G."""
    from kiwi_tpu.synth import SynthConfig

    rng = np.random.default_rng(17)
    B, R, G = 2, 2, 10
    P, ng = 4, 10
    C = P * G
    nxw, nzw = 7, 6
    nt_out, s_len = 40, 24
    s_base = -8
    nt_ext = nt_out + s_len
    cfg = SynthConfig(
        dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0, ng=ng,
        nt=nt_ext, ix0=0, iz0=0, nxw=nxw, nzw=nzw, out_it0=0,
        nt_out=nt_out, s_base=s_base, s_len=s_len,
    )
    ext = jnp.asarray(
        rng.normal(size=(nxw, nzw, ng, nt_ext)).astype(np.float32))

    def per_group(a):
        return np.repeat(a, G, axis=-1)

    ix0 = per_group(rng.integers(0, nxw - 1, size=(B, R, P)))
    iz0 = per_group(rng.integers(0, nzw - 1, size=(B, R, P)))
    ixs = np.stack([ix0, ix0 + 1], axis=-1).astype(np.int32)
    izs = np.stack([iz0, iz0 + 1], axis=-1).astype(np.int32)
    wsp = np.repeat(rng.random((B, R, P, 4)).astype(np.float32), G, axis=2)
    kin = {
        "ixs": jnp.asarray(ixs),
        "izs": jnp.asarray(izs),
        "wsp": jnp.asarray(wsp),
        # receiver-invariant (ish = floor(centroid time / dt) in
        # production; the S-packed kernel relies on it)
        "ish": jnp.asarray(np.broadcast_to(rng.integers(
            s_base, s_base + s_len, size=(B, 1, C)).astype(np.int32),
            (B, R, C))),
        "frac": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "valid": jnp.asarray(rng.random((B, R, C)) > 0.2),
        "f": jnp.asarray(rng.normal(size=(B, R, C, 6)).astype(np.float32)),
        "cos_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "sin_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
    }
    ext_flat = sw.pack_ext(ext, cfg)
    got = np.asarray(
        sw.synthesize_ard_batch(ext_flat, cfg, kin, G, interpret=True))

    def oracle_one(k):
        k = dict(k)
        k["wg"] = synth._group_weights(k["f"], k["cos_l"], k["sin_l"], ng)
        return synth._grouped_accumulate(ext, cfg, k, G)

    ref = np.asarray(jax.vmap(jax.vmap(oracle_one))(kin))
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=scale * 1e-5)


@pytest.mark.parametrize("nt_out,s_len", [(40, 24), (260, 40)])
@pytest.mark.parametrize("strategy", ["reduce", "roll"])
def test_compact_wmeta_matches_grouped_xla(monkeypatch, nt_out, s_len,
                                           strategy):
    """Compact weight packing (the eikonal-regime fast path: G=1, P past
    the 128-lane tile boundary so _wextract's tile/lane split is
    exercised) against the XLA grouped oracle, single- and multi-tile T,
    both extraction strategies."""
    from kiwi_tpu.synth import SynthConfig

    monkeypatch.setenv("KIWI_WMETA", "compact")
    monkeypatch.setenv("KIWI_WEXTRACT", strategy)
    rng = np.random.default_rng(31)
    B, R, G = 2, 2, 1
    P, ng = 169, 10
    C = P * G
    nxw, nzw = 7, 6
    s_base = -8
    nt_ext = nt_out + s_len
    cfg = SynthConfig(
        dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0, ng=ng,
        nt=nt_ext, ix0=0, iz0=0, nxw=nxw, nzw=nzw, out_it0=0,
        nt_out=nt_out, s_base=s_base, s_len=s_len,
    )
    ext = jnp.asarray(
        rng.normal(size=(nxw, nzw, ng, nt_ext)).astype(np.float32))

    ix0 = rng.integers(0, nxw - 1, size=(B, R, P))
    iz0 = rng.integers(0, nzw - 1, size=(B, R, P))
    kin = {
        "ixs": jnp.asarray(np.stack([ix0, ix0 + 1], axis=-1).astype(np.int32)),
        "izs": jnp.asarray(np.stack([iz0, iz0 + 1], axis=-1).astype(np.int32)),
        "wsp": jnp.asarray(rng.random((B, R, P, 4)).astype(np.float32)),
        "ish": jnp.asarray(np.broadcast_to(rng.integers(
            s_base, s_base + s_len, size=(B, 1, C)).astype(np.int32),
            (B, R, C))),
        "frac": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "valid": jnp.asarray(rng.random((B, R, C)) > 0.2),
        "f": jnp.asarray(rng.normal(size=(B, R, C, 6)).astype(np.float32)),
        "cos_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "sin_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
    }
    ext_flat = sw.pack_ext(ext, cfg)
    got = np.asarray(
        sw.synthesize_ard_batch(ext_flat, cfg, kin, G, interpret=True))
    assert got.shape == (B, R, 3, nt_out)
    sw.window_forward.clear_cache()

    def oracle_one(k):
        k = dict(k)
        k["wg"] = synth._group_weights(k["f"], k["cos_l"], k["sin_l"], ng)
        return synth._grouped_accumulate(ext, cfg, k, G)

    ref = np.asarray(jax.vmap(jax.vmap(oracle_one))(kin))[..., :nt_out]
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=scale * 1e-5)


def test_receiver_lane_packing_matches_grouped_xla(monkeypatch):
    """S > 1 (receivers packed into the lane axis, R not a multiple of S):
    parity against the XLA grouped path, including the zero-weight pad
    receiver and the shared-kk invariant.  S > 1 is off by default
    (measured slower on v5e; see choose_s) -- forced via KIWI_WINDOW_S
    here to keep the packed path correct for ablations."""
    from kiwi_tpu.synth import SynthConfig

    monkeypatch.setenv("KIWI_WINDOW_S", "2")
    rng = np.random.default_rng(23)
    B, R, G = 2, 3, 3
    P, ng = 5, 10
    C = P * G
    nxw, nzw = 7, 6
    nt_out, s_len = 40, 24
    s_base = -8
    nt_ext = nt_out + s_len
    cfg = SynthConfig(
        dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0, ng=ng,
        nt=nt_ext, ix0=0, iz0=0, nxw=nxw, nzw=nzw, out_it0=0,
        nt_out=nt_out, s_base=s_base, s_len=s_len,
    )
    assert sw.choose_s(cfg, R) == 2
    ext = jnp.asarray(
        rng.normal(size=(nxw, nzw, ng, nt_ext)).astype(np.float32))

    def per_group(a):
        return np.repeat(a, G, axis=-1)

    ix0 = per_group(rng.integers(0, nxw - 1, size=(B, R, P)))
    iz0 = per_group(rng.integers(0, nzw - 1, size=(B, R, P)))
    kin = {
        "ixs": jnp.asarray(np.stack([ix0, ix0 + 1], axis=-1).astype(np.int32)),
        "izs": jnp.asarray(np.stack([iz0, iz0 + 1], axis=-1).astype(np.int32)),
        "wsp": jnp.asarray(np.repeat(
            rng.random((B, R, P, 4)).astype(np.float32), G, axis=2)),
        "ish": jnp.asarray(np.broadcast_to(rng.integers(
            s_base, s_base + s_len, size=(B, 1, C)).astype(np.int32),
            (B, R, C))),
        "frac": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "valid": jnp.asarray(rng.random((B, R, C)) > 0.2),
        "f": jnp.asarray(rng.normal(size=(B, R, C, 6)).astype(np.float32)),
        "cos_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
        "sin_l": jnp.asarray(rng.random((B, R, C)).astype(np.float32)),
    }
    ext_flat = sw.pack_ext(ext, cfg)
    got = np.asarray(
        sw.synthesize_ard_batch(ext_flat, cfg, kin, G, interpret=True))
    assert got.shape == (B, R, 3, nt_out)

    def oracle_one(k):
        k = dict(k)
        k["wg"] = synth._group_weights(k["f"], k["cos_l"], k["sin_l"], ng)
        return synth._grouped_accumulate(ext, cfg, k, G)

    ref = np.asarray(jax.vmap(jax.vmap(oracle_one))(kin))[..., :nt_out]
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=scale * 1e-5)


def test_engine_float_scan_matches_fallback(setup, monkeypatch):
    """Engine integration of the floating-shift scan kernel
    (ops/float_scan.py, interpret mode): misfits/norms/shifts through
    forward_batch with the scan enabled must match the vmapped evaluation
    -- pins the eval_batch wiring, the tail correction against real GF
    synthetics (nonzero static offsets), folds and chunking."""
    eng, p, store = setup
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.3, 0.3)
    eng.set_source_params("bilateral", p)
    eng.set_synthetic_reference()
    batch = np.tile(p, (3, 1))
    batch[:, 5] = np.array([45.0, 135.0, 291.0], np.float32)

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    m_x, n_x, fs_x = [np.asarray(x) for x in
                      eng.misfits_for_source_batch(batch)]

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "1")
    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    eng._invalidate()
    m_k, n_k, fs_k = [np.asarray(x) for x in
                      eng.misfits_for_source_batch(batch)]

    scale = max(np.abs(m_x).max(), 1e-30)
    np.testing.assert_allclose(m_k, m_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_allclose(n_k, n_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_array_equal(fs_k, fs_x)


@pytest.fixture(scope="module")
def setup_longprobe():
    """Long-trace store: probes big enough that the floating-scan kernel
    takes its W-blocked streaming path (ref stack over the VMEM target)."""
    stf = np.concatenate([np.zeros(3), np.linspace(0.0, 1.0, 300), np.ones(60)])
    store = elseis.build_ahfull_store(
        nx=24, nz=4, dt=0.1, dx=150.0, dz=150.0, firstx=150.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf,
    )
    eng = Engine(store)
    olat, olon = 30.0, 70.0
    recs = []
    for i in range(3):
        d = 1500.0 + 500.0 * i
        la, lo = geo.ne_to_latlon(np.radians(olat), np.radians(olon), d, 0.4 * i)
        recs.append(Receiver(np.degrees(float(la)), np.degrees(float(lo)), "ned"))
    eng.set_receivers(recs)
    eng.set_source_location(olat, olon, 0.0)
    eng.set_effective_dt(0.1)
    eng.set_local_interpolation(True)
    p = np.array(
        [0, 0, 0, 400.0, 1e12, 91.0, 87.0, 164.0, 0.0, 300.0, 200.0, 250.0,
         2500.0, 0.2],
        dtype=np.float32,
    )
    return eng, p, store


def test_engine_float_scan_blocked_long_probe(setup_longprobe, monkeypatch):
    """Long probes push the scan kernel onto its W-blocked streaming path;
    the engine wiring must still match the vmapped evaluation."""
    from kiwi_tpu.ops import float_scan as fs

    eng, p, store = setup_longprobe
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.5, 0.5)
    eng.set_source_params("bilateral", p)
    eng.set_synthetic_reference()
    batch = np.tile(p, (3, 1))
    batch[:, 5] = np.array([45.0, 135.0, 291.0], np.float32)

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    m_x, n_x, fs_x = [np.asarray(x) for x in
                      eng.misfits_for_source_batch(batch)]

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "1")
    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    monkeypatch.setattr(fs, "VMEM_TARGET_BYTES", 1)  # force blocked
    eng._invalidate()
    m_k, n_k, fs_k = [np.asarray(x) for x in
                      eng.misfits_for_source_batch(batch)]

    scale = max(np.abs(m_x).max(), 1e-30)
    np.testing.assert_allclose(m_k, m_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_allclose(n_k, n_x, rtol=1e-5, atol=scale * 1e-5)
    np.testing.assert_array_equal(fs_k, fs_x)


def test_engine_float_scan_tiny_amplitudes(setup, monkeypatch):
    """Moment-1.0 floating norms through BOTH eval paths: the amplitude
    normalization (misfit.MisfitSetup.device) must keep the scan sums out
    of the f32 flush-to-zero range and the fscan kernel must agree with
    the vmapped path at that scale."""
    eng, p, store = setup
    p1 = p.copy()
    p1[4] = 1.0  # moment -> samples ~1e-19
    eng.set_misfit_method("floating_l1norm")
    eng.set_floating_shiftrange(-0.3, 0.3)
    eng.set_source_params("bilateral", p1)
    eng.set_synthetic_reference()
    batch = np.tile(p1, (3, 1))
    batch[:, 5] = np.array([70.0, 91.0, 113.0], np.float32)

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "0")
    eng._invalidate()
    m_x, n_x, _ = [np.asarray(x) for x in eng.misfits_for_source_batch(batch)]

    monkeypatch.setenv("KIWI_FLOAT_SCAN", "1")
    monkeypatch.setenv("KIWI_FLOAT_SCAN_INTERPRET", "1")
    eng._invalidate()
    m_k, n_k, _ = [np.asarray(x) for x in eng.misfits_for_source_batch(batch)]

    # wrong-strike rows misfit strictly nonzero (no underflow plateau)
    g_x = np.sqrt((m_x**2).sum(1)) / np.sqrt((n_x**2).sum(1))
    assert g_x[0] > 1e-3 and g_x[2] > 1e-3, g_x
    assert g_x[1] < 1e-5, g_x
    scale = np.abs(m_x).max()
    np.testing.assert_allclose(m_k, m_x, rtol=2e-5, atol=scale * 2e-5)
    np.testing.assert_allclose(n_k, n_x, rtol=2e-5, atol=scale * 2e-5)
