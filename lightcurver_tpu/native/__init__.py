"""Native (C++) host-preprocessing backend, loaded via ctypes.

The shared library is compiled on first use (g++, cached next to the
source); every caller gracefully falls back to the numpy/scipy
implementations when the toolchain or binary is unavailable.
"""

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "lightcurver_native.cpp"
_LIB = _HERE / "liblightcurver_native.so"

_lib = None
_tried = False


def _compile():
    # compile to a per-process temp path and os.replace (atomic): Pool
    # workers all hit first-use compilation concurrently, and g++
    # writing the final .so directly could leave a corrupt library that
    # a sibling worker dlopens mid-write (or that poisons every later
    # run with a fresh mtime)
    tmp = _LIB.with_suffix(f".so.tmp{os.getpid()}")
    # -march=native is safe here: the library is (re)compiled on first
    # use on the machine that runs it, never shipped.  It matters: the
    # cosmic-ray kernel's branchless rank scans only vectorize with the
    # host's full SIMD set.  Retried without the flag for exotic
    # toolchains that reject it.
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
    try:
        for extra in (["-march=native"], []):
            cmd = base + extra + ["-o", str(tmp), str(_SRC)]
            result = subprocess.run(cmd, capture_output=True, timeout=120)
            if result.returncode == 0:
                break
        else:
            result.check_returncode()
        os.replace(tmp, _LIB)
    finally:
        tmp.unlink(missing_ok=True)


def load():
    """Return the ctypes library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LIGHTCURVER_DISABLE_NATIVE"):
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _compile()
        lib = ctypes.CDLL(str(_LIB))
        lib.lc_background_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.lc_extract_sources.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_void_p]
        lib.lc_extract_sources.restype = ctypes.c_int
        lib.lc_detect_cosmics.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception as e:  # toolchain missing, compile error, ...
        logging.getLogger("lightcurver.native").info(
            f"native backend unavailable ({e}); using numpy fallbacks")
        _lib = None
    return _lib


def _fptr(array):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def background_mesh(image, gy, gx, mask=None):
    """(back_grid, rms_grid) via the native mesh estimator, or None."""
    lib = load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.float32)
    ny, nx = image.shape
    back = np.empty((gy, gx), dtype=np.float32)
    rms = np.empty((gy, gx), dtype=np.float32)
    if mask is not None:
        mask = np.ascontiguousarray(mask, dtype=np.uint8)
        mask_ptr = mask.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_ptr = None
    lib.lc_background_mesh(_fptr(image), mask_ptr, ny, nx, gy, gx,
                           _fptr(back), _fptr(rms))
    return back.astype(float), rms.astype(float)


def extract_sources(image, variance, threshold, min_area,
                    max_sources=100000):
    """Native source extraction; returns an (n, 8) float array or None.

    Columns: x, y, flux, a, b, npix, peak, positive_flux.
    """
    lib = load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.float32)
    variance = np.ascontiguousarray(
        np.broadcast_to(variance, image.shape), dtype=np.float32)
    ny, nx = image.shape
    out = np.empty((max_sources, 8), dtype=np.float32)
    n = lib.lc_extract_sources(_fptr(image), _fptr(variance), ny, nx,
                               float(threshold), int(min_area),
                               _fptr(out), max_sources, None)
    return out[:n].copy()


def detect_cosmics(data, invar=None, sigclip=4.5, sigfrac=0.3,
                   objlim=5.0, niter=2):
    """Native L.A.Cosmic detection; (mask, cleaned) or None.

    Same contract as processes/cosmics.detect_cosmics (which is the
    numpy/scipy twin this kernel is cross-fuzzed against); `invar` is
    the per-pixel noise VARIANCE despite the name, matching the
    reference's astroscrappy call signature
    (reference lightcurver/processes/cutout_making.py:85).
    """
    lib = load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float64)
    ny, nx = data.shape
    if invar is not None:
        invar = np.ascontiguousarray(
            np.broadcast_to(invar, data.shape), dtype=np.float64)
        var_ptr = invar.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        var_ptr = None
    mask = np.empty(data.shape, dtype=np.uint8)
    cleaned = np.empty(data.shape, dtype=np.float64)
    lib.lc_detect_cosmics(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), var_ptr,
        ny, nx, float(sigclip), float(sigfrac), float(objlim),
        int(niter),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cleaned.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return mask.astype(bool), cleaned
