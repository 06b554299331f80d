"""Multi-chip SPMD for the inversion engine.

The reference scales out with a pool of `minimizer` processes over
pipes/SSH, sharding the *receiver set* by epicentral distance and walking
sources serially (seismosizer.py:89-124, :785-827).  The TPU-native
equivalents, expressed as a jax.sharding Mesh + NamedShardings so XLA
inserts the collectives:

* axis "s" (sources): the grid-search batch axis -- embarrassingly parallel,
  the dominant axis (replaces the reference's serial source loop).  THIS
  module's `sharded_forward` shards only this axis; the GF window and the
  misfit context ride along replicated.
* axis "r" (receivers): the reference's distance-balanced receiver split
  with per-device GF *store partitions* lives in `parallel/gfshard.py`
  (build_plan shards receiver groups + their GF distance windows over "r"
  under shard_map); use it when the replicated window does not fit.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_sources=None, n_receivers=1, devices=None):
    """Mesh over (sources, receivers) axes."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_sources is None:
        n_sources = n // n_receivers
    if n_sources * n_receivers != n:
        raise ValueError(f"mesh {n_sources}x{n_receivers} != {n} devices")
    return Mesh(devices.reshape(n_sources, n_receivers), axis_names=("s", "r"))


def shard_centroid_batch(cbatch, mesh):
    """Place a [B, ...] centroid batch with the batch axis over mesh axis s."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P("s", *([None] * (v.ndim - 1)))))
        for k, v in cbatch.items()
    }


def sharded_forward(engine, params_batch, mesh):
    """Evaluate a source batch with the batch axis sharded over the mesh.

    Returns (misfits [B, RC], norms [B, RC]) like
    Engine.misfits_for_source_batch, but computed SPMD across the mesh's
    "s" axis; the misfit context (reference traces) is replicated, and
    XLA partitions the batched synthesis accordingly.  Batches that do
    not divide the "s" axis are padded with the last source (device_put
    rejects uneven shards); the pad rows are sliced off the outputs.
    """
    pb = np.atleast_2d(np.asarray(params_batch, dtype=np.float32))
    b = pb.shape[0]
    ns = int(mesh.shape["s"])
    bpad = -(-b // ns) * ns
    if bpad != b:
        pb = np.concatenate([pb, np.repeat(pb[-1:], bpad - b, axis=0)])
    cbatch, moments, risetimes, shape, gsize = engine._discretize_batch(pb)
    plan = engine._ensure_plan(
        cbatch, float(np.max(risetimes, initial=0.0)), shape, gsize=gsize
    )
    cbatch = shard_centroid_batch(cbatch, mesh)
    msh = NamedSharding(mesh, P("s"))
    m, n, fs = plan["forward_batch"](
        cbatch, jax.device_put(moments, msh), jax.device_put(risetimes, msh)
    )
    return m[:b], n[:b], fs[:b]
