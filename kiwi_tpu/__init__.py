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

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the synthesis/misfit programs take 20-40 s to
# compile on TPU; warm starts (protocol replays, repeated CLI runs, Step
# pipelines) hit the cache instead.  KIWI_COMPILE_CACHE=0 disables,
# KIWI_COMPILE_CACHE=<dir> relocates.
_cache = _os.environ.get("KIWI_COMPILE_CACHE", "")
if _cache != "0":
    _jax.config.update(
        "jax_compilation_cache_dir",
        _cache or _os.path.join(_os.path.expanduser("~"), ".cache", "kiwi_tpu", "xla"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"

from . import geo, euler, plf  # noqa: E402,F401
