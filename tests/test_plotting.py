"""Plot-layer units: beachball radiation signs, misfogram, spectra panels."""

import numpy as np
import pytest

from kiwi_tpu import plotting


def test_beachball_explosion_all_compressional(tmp_path):
    """Isotropic source: every lower-hemisphere first motion is positive."""
    from kiwi_tpu.euler import m6_to_sym

    m6 = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    m = m6_to_sym(m6)
    rng = np.random.default_rng(0)
    g = rng.normal(size=(200, 3))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    u = np.einsum("ki,ij,kj->k", g, m, g)
    assert np.all(u > 0)
    plotting.plot_beachball(m6, str(tmp_path / "exp.png"))
    assert (tmp_path / "exp.png").exists()


def test_beachball_strike_slip_quadrants(tmp_path):
    """Vertical strike-slip (strike 0): compression in the NE and SW
    quadrants for mxy > 0 (radiation sign = 2 mxy gn ge)."""
    from kiwi_tpu.euler import m6_to_sym

    m6 = np.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    m = m6_to_sym(m6)

    def sign_at(gn, ge, gd):
        g = np.array([gn, ge, gd])
        g = g / np.linalg.norm(g)
        return float(g @ m @ g)

    assert sign_at(1.0, 1.0, 0.5) > 0  # NE
    assert sign_at(-1.0, -1.0, 0.5) > 0  # SW
    assert sign_at(1.0, -1.0, 0.5) < 0  # NW
    assert sign_at(-1.0, 1.0, 0.5) < 0  # SE
    plotting.plot_beachball(m6, str(tmp_path / "ss.png"))


def test_source_m6_sdr_vs_explicit():
    """source_m6 agrees between an sdr source and the equivalent explicit
    moment-tensor source."""
    from kiwi_tpu.euler import mt_from_sdr, sym_to_m6

    class FakeEngine:
        pass

    e = FakeEngine()
    e.source_type = "bilateral"
    e.source_params = np.zeros(14, np.float32)
    e.source_params[4] = 2.5e12  # moment
    e.source_params[5:8] = [30.0, 60.0, 45.0]  # strike, dip, slip-rake
    m_sdr = plotting.source_m6(e)

    expect = sym_to_m6(
        mt_from_sdr(np.radians(30.0), np.radians(60.0), np.radians(45.0))
    ) * 2.5e12
    np.testing.assert_allclose(m_sdr, expect, rtol=1e-5)

    e2 = FakeEngine()
    e2.source_type = "moment_tensor"
    e2.source_params = np.zeros(11, np.float32)
    e2.source_params[4:10] = expect.astype(np.float32)
    m_mt = plotting.source_m6(e2)
    np.testing.assert_allclose(m_mt, expect.astype(np.float32), rtol=1e-6)
