"""Dense trace conventions replacing the reference's sparse traces.

The reference (sparse_trace.f90) stores a GF trace as strips over an integer
index span; semantics that every consumer relies on:

* sample index i corresponds to time i*dt (gfdb_build_ahfull.f90:206),
* values before the span start are ZERO,
* values after the span end REPEAT THE LAST SAMPLE forever
  (sparse_trace.f90:696-703) -- this is what makes static offsets and
  near-field ramps persist,
* a fractional time shift s means linear interpolation:
  out(j) += f * ((1-frac) * x(j - ish) + frac * x(j - ish - 1)) with
  ish = floor(s), frac = s - ish (sparse_trace.f90:639-646, 683-693).

Here a trace is a dense float32 row of fixed length NT plus an int32 itmin;
the row is edge-padded (last value repeated) up to NT at materialization, so
"after the end" extension only needs an index clip, and "before the start"
is a zero mask.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fnint(x):
    """Fortran NINT: round half away from zero."""
    x = np.asarray(x)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)


def jnint(x):
    """Fortran NINT for jnp arrays."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)


def sample_ext(data, itmin, idx):
    """Sample the extended trace at absolute indices idx (jnp).

    data: f32[..., NT] edge-padded rows; itmin: i32[...]; idx: i32[K].
    Returns f32[..., K]: 0 before itmin, data within, last value after.
    """
    nt = data.shape[-1]
    rel = idx - itmin[..., None]
    vals = jnp.take_along_axis(data, jnp.clip(rel, 0, nt - 1), axis=-1)
    return jnp.where(rel < 0, 0.0, vals)


def dataspan(values, itmin=0):
    """Trimmed data span like strip_dataspan (sparse_trace.f90:347-377).

    Returns (first, last) absolute indices: leading zeros removed, trailing
    samples equal to the final value collapsed to one.  Returns None for an
    all-zero trace.
    """
    v = np.asarray(values)
    if v.size == 0:
        return None
    nz = np.flatnonzero(v != 0.0)
    if nz.size == 0:
        return None
    first = int(nz[0])
    lastval = v[-1]
    diff = np.flatnonzero(v != lastval)
    last = int(diff[-1]) + 1 if diff.size else 0
    last = max(last, first)
    return first + itmin, last + itmin


def multiply_add_ref(acc, acc_it0, data, itmin, factor=1.0, rshift=0.0):
    """Host reference implementation of trace_multiply_add on dense arrays.

    acc: float64/32 array with absolute start index acc_it0 (fixed size, like
    trace_multiply_add_nogrow).  Used by tests to pin the semantics the
    device kernels must reproduce.
    """
    acc = np.asarray(acc)
    data = np.asarray(data, dtype=acc.dtype)
    nt = data.shape[0]
    ish = int(np.floor(rshift))
    frac = float(rshift) - ish

    def ext(j):  # absolute index sample with zero-left/edge-right extension
        rel = j - (itmin + ish)
        out = np.zeros(j.shape, dtype=acc.dtype)
        inside = rel >= 0
        out[inside] = data[np.minimum(rel[inside], nt - 1)]
        return out

    j = np.arange(acc_it0, acc_it0 + acc.shape[0])
    acc += factor * ((1.0 - frac) * ext(j) + frac * ext(j - 1))
    return acc


def pack_trace(values, it0):
    """Dense samples starting at absolute index it0 -> (trimmed values, itmin).

    Equivalent information content of trace_pack (sparse_trace.f90:443-555):
    we keep interior zeros dense but trim leading zeros; trailing zeros keep
    one sample (so the trace "ends at zero" and has no static offset), and a
    genuinely static tail keeps its final value.
    """
    v = np.asarray(values, dtype=np.float32)
    span = dataspan(v)
    if span is None:
        return np.zeros(1, dtype=np.float32), int(it0)
    first, last = span
    return v[first : last + 1].copy(), int(it0 + first)


MAXGAP = 5  # sparse_trace.f90:25


def pack_strips(values, itmin):
    """Split a dense trace into sparse strips exactly like trace_pack
    (sparse_trace.f90:443-555): nonzero runs separated by gaps of more than
    MAXGAP zeros; each strip keeps one trailing zero when a gap (or the
    trace end) follows; an all-zero trace yields a single zero sample at the
    span start.

    Returns [(start_abs_index, f32 array)].
    """
    v = np.asarray(values, dtype=np.float32)
    n = v.shape[0]
    strips = []
    interest = False
    gap = 0
    ibeg = iend = 0
    for i in range(n):
        if v[i] != 0.0:
            if not interest:
                interest = True
                ibeg = i
            gap = 0
            iend = i
        elif interest:
            gap += 1
            if gap > MAXGAP:
                strips.append((ibeg, v[ibeg : iend + 2].copy()))
                interest = False
    if interest:
        if gap > 0:
            strips.append((ibeg, v[ibeg : iend + 2].copy()))
        else:
            strips.append((ibeg, v[ibeg : iend + 1].copy()))
    if not strips:
        return [(int(itmin), np.zeros(1, dtype=np.float32))]
    return [(int(itmin) + s, d) for s, d in strips]
