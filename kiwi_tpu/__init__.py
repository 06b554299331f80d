"""kiwi-tpu: a TPU-native kinematic earthquake source modeling & inversion framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Kinherd
"Kiwi Tools" (kinematic waveform inversion): device-resident Green's-function
stores, batched seismogram synthesis by GF superposition, a full waveform
misfit engine, six parameterized source models, and vmapped/sharded inversion
loops (grid search + bootstrap + Levenberg-Marquardt).

Design notes
------------
* Waveform data is float32 (like the reference engine); geodesy is float64
  (the reference uses real*8 there).  We therefore enable jax x64 support and
  pin dtypes explicitly everywhere.
* The reference's sparse traces / LRU caches / process pools exist to fit a
  2008 CPU+disk budget.  Here the GF database is a dense device-resident
  array, synthesis is a batched scatter+convolve, and "grid search" is a vmap
  over source batches.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from . import geo, euler, plf  # noqa: E402,F401
