"""Eikonal solver tests (counterpart of test_eikonal.f90: FMM vs analytic
circular front) plus fast-sweeping vs FMM agreement."""

import numpy as np
import jax.numpy as jnp

from kiwi_tpu import eikonal


def test_fmm_uniform_speed_circular_front():
    n = 61
    d = 100.0
    speed = np.full((n, n), 2500.0)
    first = (0.0, 0.0)
    p0 = (n // 2 * d, n // 2 * d)
    times = eikonal.fmm_solve(speed, (d, d), first, p0)
    xs = np.arange(n) * d
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    dist = np.hypot(X - p0[0], Y - p0[1])
    exact = dist / 2500.0
    err = np.abs(times - exact)
    # FMM first-order error ~ O(h); worst along diagonals
    assert err.max() < 2.0 * d / 2500.0
    interior = err[5:-5, 5:-5]
    assert np.median(interior) < 1.0 * d / 2500.0


def test_fmm_anisotropic_spacing():
    speed = np.full((41, 21), 1000.0)
    times = eikonal.fmm_solve(speed, (50.0, 100.0), (0.0, 0.0), (1000.0, 1000.0))
    # along the axes the times are exact
    assert abs(times[20, 10]) < 1e-12
    assert abs(times[30, 10] - 10 * 50.0 / 1000.0) < 1e-6
    assert abs(times[20, 15] - 5 * 100.0 / 1000.0) < 1e-6


def test_sweep_matches_fmm_uniform():
    n = 41
    d = 100.0
    speed = np.full((n, n), 3000.0)
    p0 = (1700.0, 2300.0)
    t_fmm = eikonal.fmm_solve(speed, (d, d), (0.0, 0.0), p0)
    t_swp = np.asarray(
        eikonal.sweep_solve(jnp.asarray(speed, jnp.float32), (d, d), (0.0, 0.0), p0)
    )
    # both are first-order schemes on the same stencil; agreement much
    # tighter than the discretization error
    assert np.abs(t_swp - t_fmm).max() < 0.5 * d / 3000.0


def test_sweep_matches_fmm_variable_speed():
    rng = np.random.default_rng(5)
    n = 48
    d = 50.0
    speed = 2000.0 + 800.0 * rng.random((n, n))
    p0 = (12 * d, 30 * d)
    t_fmm = eikonal.fmm_solve(speed, (d, d), (0.0, 0.0), p0)
    t_swp = np.asarray(
        eikonal.sweep_solve(jnp.asarray(speed, jnp.float32), (d, d), (0.0, 0.0), p0, n_rounds=12)
    )
    denom = np.maximum(t_fmm, 1e-3)
    rel = np.abs(t_swp - t_fmm) / denom
    assert np.median(rel) < 0.01
    assert rel.max() < 0.08


def test_sweep_slow_barrier():
    # rupture must go around a slow barrier, not through it
    n = 41
    d = 100.0
    speed = np.full((n, n), 3000.0)
    speed[18:23, :30] = 300.0  # slow wall with a gap at the top
    p0 = (5 * d, 15 * d)
    t = np.asarray(eikonal.sweep_solve(jnp.asarray(speed, jnp.float32), (d, d), (0.0, 0.0), p0, n_rounds=16))
    t_fmm = eikonal.fmm_solve(speed, (d, d), (0.0, 0.0), p0)
    # behind the wall, the front must have traveled around (longer path)
    direct = np.hypot((35 - 5) * d, 0.0) / 3000.0
    assert t[35, 15] > 1.4 * direct
    assert abs(t[35, 15] - t_fmm[35, 15]) / t_fmm[35, 15] < 0.05


def test_sweep_exact_vs_fmm_in_one_round():
    from kiwi_tpu import eikonal as eik

    """The anti-diagonal Gauss-Seidel sweep is exact (to f32) against the
    FMM for fields whose characteristics turn < 90 degrees -- uniform,
    layered, and masked rupture-front speed fields."""
    rng = np.random.default_rng(0)
    xg, yg = np.meshgrid(np.arange(90) - 45, np.arange(70) - 35, indexing="ij")
    cases = [
        np.full((90, 70), 3000.0, np.float32),
        np.repeat(np.linspace(2000, 4000, 90)[:, None], 70, 1).astype(np.float32),
        np.where(np.hypot(xg, yg) < 30, 2800.0, 700.0).astype(np.float32),
    ]
    for speed in cases:
        ref = eik.fmm_solve(speed, (50.0, 50.0), (0.0, 0.0), (2200.0, 1700.0))
        t1 = np.asarray(eik.sweep_solve(speed, (50.0, 50.0), (0.0, 0.0),
                                        (2200.0, 1700.0), n_rounds=1))
        finite = ref < 1e20
        rel = np.abs(t1[finite] - ref[finite]) / np.maximum(ref[finite], 1e-3)
        assert rel.max() < 1e-5, rel.max()


def test_prepare_batch_vectorized_matches_loop():
    """The batched prepare (one Sutherland-Hodgman pass per half-space
    over the whole batch) must reproduce the per-source loop bit-exactly:
    the device-vs-host discretization crosscheck depends on identical
    grid dims and cell geometry."""
    import numpy as np

    from kiwi_tpu.sources import eikonal as eiksrc

    ctx = eiksrc.EikonalContext(
        constraints=[
            (np.array([0.0, 0.0, 50.0]), np.array([0.0, 0.0, -1.0])),
            (np.array([0.0, 0.0, 700.0]), np.array([0.0, 0.0, 1.0])),
            (np.array([250.0, 0.0, 0.0]), np.array([1.0, 0.3, 0.0])),
        ],
        layer_depths=np.array([100.0, 400.0, 900.0]),
        layer_vs=np.array([1500.0, 2400.0, 3200.0, 3800.0]),
    )
    rng = np.random.default_rng(7)
    B = 24
    named = []
    for i in range(B):
        p = np.array(
            [0.1 * i, 8.0 * i, -15.0 * i, 300.0 + 10.0 * i, 1e12,
             10.0 * i, 30.0 + 2.0 * i, 40.0, 10.0 * rng.random(),
             10.0 * rng.random(), 150.0 + 8.0 * i,
             20.0 * rng.random(), -20.0 * rng.random(),
             0.7 + 0.01 * i, 0.3],
            dtype=np.float32,
        )
        named.append(eiksrc.NAMED_PARAMS["eikonal"](p))

    s_vec, a_vec = eiksrc.prepare_batch(named, 0.1, ctx)
    s_loop, a_loop = eiksrc._prepare_batch_loop(named, 0.1, ctx)
    assert s_vec == s_loop
    assert set(a_vec) == set(a_loop)
    for k in a_loop:
        np.testing.assert_array_equal(a_vec[k], a_loop[k], err_msg=k)

    # a zero-radius member routes the public API to the loop fallback
    p0 = np.array(
        [0.0, 0.0, 0.0, 300.0, 1e12, 0.0, 30.0, 40.0, 0.0, 0.0, 0.0,
         0.0, 0.0, 0.9, 0.3], dtype=np.float32)
    named0 = [eiksrc.NAMED_PARAMS["eikonal"](p0)]
    s0, a0 = eiksrc.prepare_batch(named0, 0.1, ctx)
    s0l, a0l = eiksrc._prepare_batch_loop(named0, 0.1, ctx)
    assert s0 == s0l
    for k in a0l:
        np.testing.assert_array_equal(a0[k], a0l[k], err_msg=k)


def test_named_params_batch_matches_loop():
    """named_params_batch must reproduce per-row NAMED_PARAMS bit-exactly
    (rotation matrices feed the rupture grids; m6 feeds the tables)."""
    import numpy as np

    from kiwi_tpu.sources import eikonal as eiksrc

    rng = np.random.default_rng(3)
    B = 16
    pb_eik = rng.normal(size=(B, 15)).astype(np.float32) * 100.0
    pv, m6s, rotm = eiksrc.named_params_batch("eikonal", pb_eik)
    for i in range(B):
        pd, m6, r = eiksrc.NAMED_PARAMS["eikonal"](pb_eik[i])
        for k, v in pd.items():
            assert pv[k][i] == v, k
        np.testing.assert_array_equal(m6s[i], m6)
        np.testing.assert_array_equal(rotm[i], r)

    pb_mte = rng.normal(size=(B, 20)).astype(np.float32) * 100.0
    pv, m6s, rotm = eiksrc.named_params_batch("mt_eikonal", pb_mte)
    for i in range(B):
        pd, m6, r = eiksrc.NAMED_PARAMS["mt_eikonal"](pb_mte[i])
        for k, v in pd.items():
            assert pv[k][i] == v, k
        np.testing.assert_array_equal(m6s[i], m6)
        np.testing.assert_array_equal(rotm[i], r)


def test_sweep_kernel_matches_xla_batch():
    """The Pallas column-scan solver (ops/eik_sweep.py) must reproduce the
    vmapped XLA fast-sweeping solver to fp rounding: same Godunov stencil,
    same Zhao (2005) diagonal ordering, different execution engine."""
    import jax

    from kiwi_tpu.ops import eik_sweep

    rng = np.random.default_rng(3)
    B, nx, ny = 5, 48, 40  # B deliberately not a lane multiple
    speed = rng.uniform(1000.0, 4000.0, (B, nx, ny)).astype(np.float32)
    delta = rng.uniform(50.0, 300.0, (B, 2)).astype(np.float32)
    first = rng.uniform(-1000.0, 0.0, (B, 2)).astype(np.float32)
    ip = first + rng.uniform(0.2, 0.8, (B, 2)).astype(np.float32) * (
        delta * [nx - 1, ny - 1])

    ref = np.asarray(jax.vmap(
        lambda s, d, f, p: eikonal.sweep_solve(s, d, f, p, n_rounds=2)
    )(jnp.asarray(speed), jnp.asarray(delta), jnp.asarray(first),
      jnp.asarray(ip)))
    got = np.asarray(eik_sweep.sweep_solve_batch(
        speed, delta, first, ip, n_rounds=2, interpret=True))

    finite = ref < 1e29
    assert finite.all()
    rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-6)
    assert rel.max() < 1e-4, rel.max()


def test_device_discretizer_kernel_path(monkeypatch):
    """discretize_device_batch with the Pallas sweep (interpret mode on
    CPU) must match the XLA-sweep path on every output."""
    from kiwi_tpu.sources import eikonal as eiksrc

    ctx = eiksrc.EikonalContext(
        constraints=[
            (np.array([0.0, 0.0, 50.0]), np.array([0.0, 0.0, -1.0])),
            (np.array([0.0, 0.0, 700.0]), np.array([0.0, 0.0, 1.0])),
        ],
        layer_depths=np.array([100.0, 400.0, 900.0]),
        layer_vs=np.array([1500.0, 2400.0, 3200.0, 3800.0]),
    )
    rng = np.random.default_rng(11)
    B = 3
    named = []
    for i in range(B):
        p = np.array(
            [0.1 * i, 8.0 * i, -15.0 * i, 300.0 + 10.0 * i, 1e12,
             10.0 * i, 30.0 + 2.0 * i, 40.0, 10.0 * rng.random(),
             10.0 * rng.random(), 150.0 + 8.0 * i,
             20.0 * rng.random(), -20.0 * rng.random(),
             0.7 + 0.01 * i, 0.3],
            dtype=np.float32,
        )
        named.append(eiksrc.NAMED_PARAMS["eikonal"](p))
    static, arrays = eiksrc.prepare_batch(named, 0.5, ctx)

    monkeypatch.setenv("KIWI_SWEEP_KERNEL", "0")
    ref = eiksrc.discretize_device_batch(
        static, arrays, 0.5, ctx, nt_cell_max=8, _cache={})
    monkeypatch.setenv("KIWI_SWEEP_KERNEL", "1")
    monkeypatch.setenv("KIWI_SWEEP_INTERPRET", "1")
    got = eiksrc.discretize_device_batch(
        static, arrays, 0.5, ctx, nt_cell_max=8, _cache={})

    assert set(ref) == set(got)
    np.testing.assert_array_equal(np.asarray(ref["active"]),
                                  np.asarray(got["active"]))
    for k in ("north", "east", "depth", "m"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5,
            err_msg=k)
    # arrival times inherit the solver's fp-order differences
    np.testing.assert_allclose(
        np.asarray(got["time"]), np.asarray(ref["time"]),
        rtol=1e-4, atol=1e-3)
