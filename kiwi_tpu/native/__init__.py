"""Native (C++) runtime components.

The compute path is JAX/XLA/Pallas; the I/O-heavy runtime pieces mirror the
reference's native shims in C++ (mseed/mseed_simple.c -> mseed.cc).  Built
on demand with g++ (`python -m kiwi_tpu.native.build` or automatically on
first use); the pure-Python codecs remain as fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libkiwinative.so")
_lib = None
_tried = False


_SOURCES = ("mseed.cc", "sac.cc")


def build(verbose=False):
    """Compile the native library; returns the .so path."""
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO, *srcs,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {_SO}", file=sys.stderr)
    return _SO


def get_lib(auto_build=True):
    """ctypes handle to the native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried and not os.path.exists(_SO):
        return None
    _tried = True
    stale = not os.path.exists(_SO) or any(
        os.path.exists(os.path.join(_DIR, src))
        and os.path.getmtime(_SO) < os.path.getmtime(os.path.join(_DIR, src))
        for src in _SOURCES
    )
    if stale:
        if not auto_build:
            return None
        try:
            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.kiwi_mseed_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.kiwi_mseed_write.restype = ctypes.c_int
    lib.kiwi_mseed_nsamples.argtypes = [ctypes.c_char_p]
    lib.kiwi_mseed_nsamples.restype = ctypes.c_int
    lib.kiwi_mseed_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.kiwi_mseed_read.restype = ctypes.c_int
    lib.kiwi_sac_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.kiwi_sac_write.restype = ctypes.c_int
    lib.kiwi_sac_nsamples.argtypes = [ctypes.c_char_p]
    lib.kiwi_sac_nsamples.restype = ctypes.c_int
    lib.kiwi_sac_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.kiwi_sac_read.restype = ctypes.c_int
    _lib = lib
    return _lib


def mseed_write(filename, data, toffset, deltat, network="", station="",
                location="", channel=""):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float32)
    rc = lib.kiwi_mseed_write(
        filename.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], float(toffset), float(deltat),
        network.encode(), station.encode(), location.encode(), channel.encode(),
    )
    if rc != 0:
        raise IOError(f"kiwi_mseed_write failed ({rc}) for {filename}")
    return True


def mseed_read(filename):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n = lib.kiwi_mseed_nsamples(filename.encode())
    if n < 0:
        raise IOError(f"kiwi_mseed_read failed ({n}) for {filename}")
    out = np.empty(n, dtype=np.float32)
    toffset = ctypes.c_double()
    deltat = ctypes.c_double()
    rc = lib.kiwi_mseed_read(
        filename.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(toffset), ctypes.byref(deltat),
    )
    if rc < 0:
        raise IOError(f"kiwi_mseed_read failed ({rc}) for {filename}")
    return out, toffset.value, deltat.value


if __name__ == "__main__":
    build(verbose=True)


def sac_write(filename, data, toffset, deltat, station="", channel=""):
    """C++ SAC writer; returns False when the native lib is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, dtype=np.float32)
    rc = lib.kiwi_sac_write(
        filename.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], float(toffset), float(deltat),
        station.encode(), channel.encode(),
    )
    if rc != 0:
        raise IOError(f"kiwi_sac_write failed ({rc}) for {filename}")
    return True


def sac_read(filename):
    """C++ SAC reader; returns None when the native lib is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n = lib.kiwi_sac_nsamples(filename.encode())
    if n < 0:
        raise IOError(f"kiwi_sac_read failed ({n}) for {filename}")
    out = np.empty(max(n, 1), dtype=np.float32)
    toffset = ctypes.c_double()
    deltat = ctypes.c_double()
    rc = lib.kiwi_sac_read(
        filename.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(toffset), ctypes.byref(deltat),
    )
    if rc < 0:
        raise IOError(f"kiwi_sac_read failed ({rc}) for {filename}")
    return out[:n], toffset.value, deltat.value
