"""Pallas grouped-synthesis kernel (experimental) vs the XLA grouped path,
in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kiwi_tpu import synth
from kiwi_tpu.gf import elseis
from kiwi_tpu.sources import get_source_model


@pytest.fixture(scope="module")
def setup():
    stf = np.array([0, 0, 0, 0.2, 0.5, 0.8, 1, 1, 1], np.float64)
    store = elseis.build_ahfull_store(
        nx=60, nz=40, dt=0.1, dx=100.0, dz=100.0, firstx=100.0, firstz=0.0,
        material=(2300.0, 3200.0, 1600.0), stf=stf)
    geom = synth.precompute_receiver_geometry(
        np.radians(30.0), np.radians(70.0),
        np.radians([30.02, 30.03]), np.radians([70.01, 70.0]))
    model = get_source_model("bilateral")
    params = np.array([0.3, 50., -30., 1500., 1., 40., 70., 20., 10.,
                       900., 700., 800., 2500., 0.4], np.float32)
    shape = model.grid_shape(params, 0.1)
    pb = np.tile(params, (3, 1))
    pb[:, 5] = [40.0, 80.0, 120.0]
    cbatch = jax.vmap(lambda p: model.discretize(p, 0.1, shape))(jnp.asarray(pb))
    ext_m, dr, tr = model.param_stats(pb, 0.1)
    cfg = synth.plan_config(store, geom, ext_m, dr, tr)
    gfd, gfi = synth.window_arrays(store, cfg)
    ext = synth.materialize_window(gfd, gfi, cfg)
    recs = geom.device()
    return store, cfg, ext, recs, cbatch, shape[-1]


def test_pallas_grouped_matches_xla(setup):
    from kiwi_tpu.ops import synth_pallas

    store, cfg, ext, recs, cbatch, G = setup
    ext2 = ext.reshape(cfg.nxw * cfg.nzw, cfg.ng, -1)
    kin = jax.vmap(lambda c1: jax.vmap(
        lambda rec: synth._centroid_kinematics(cfg, rec, c1))(recs))(cbatch)
    ard_pl = synth_pallas.synthesize_ard_batch(ext2, cfg, kin, G, interpret=True)

    def ref_one(cent):
        def per_rec(rec):
            k = synth._centroid_kinematics(cfg, rec, cent)
            return synth._grouped_accumulate(ext, cfg, k, G)
        return jax.vmap(per_rec)(recs)

    ard_ref = jax.vmap(ref_one)(cbatch)
    s = np.abs(np.asarray(ard_ref)).max()
    np.testing.assert_allclose(
        np.asarray(ard_pl), np.asarray(ard_ref), atol=s * 2e-6)
