"""Native (C++) host-preprocessing backend, loaded via ctypes.

The shared library is compiled on first use (g++, cached next to the
source); every caller gracefully falls back to the numpy/scipy
implementations when the toolchain or binary is unavailable.
"""

import ctypes
import hashlib
import logging
import os
import platform
import subprocess
import sys
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "lightcurver_native.cpp"

_lib = None
_tried = False


def _isa_tag():
    """Short tag identifying this host's ISA (machine + CPU-flag hash).

    The cached .so is built with -march=native, so a library compiled
    on one host may use instructions another host lacks.  Keying the
    cache filename by the ISA means a shared package dir (NFS conda
    env, container image reused across heterogeneous hosts) never
    dlopens a sibling host's binary — each ISA compiles its own.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"{platform.machine()}-{digest}"


def _lib_path():
    return _HERE / f"liblightcurver_native-{_isa_tag()}.so"


def _host_key():
    """Full (uncut) identity of this host's CPU, for the selftest stamp.

    Stronger than _isa_tag (which truncates the flag hash for a
    filename): the stamp must not transfer between hosts whose
    truncated tags collide, since skipping the selftest on a foreign
    binary is exactly the SIGILL hole the selftest closes.
    """
    ident = {"machine": platform.machine()}
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                for key in ("flags", "Features", "model name"):
                    if line.startswith(key) and key not in ident:
                        ident[key] = line.strip()
                if len(ident) == 4:
                    break
    except OSError:
        pass
    joined = "|".join(f"{k}={v}" for k, v in sorted(ident.items()))
    return hashlib.sha256(joined.encode()).hexdigest()


def _stamp_path(lib_path):
    return lib_path.with_suffix(".ok")


def _stamp_value(lib_path):
    so_hash = hashlib.sha256(lib_path.read_bytes()).hexdigest()
    return f"{so_hash} {_host_key()}\n"


def _write_stamp(lib_path):
    """Record 'this exact .so ran on this host' (atomic, best-effort)."""
    tmp = _stamp_path(lib_path).with_suffix(f".ok.tmp{os.getpid()}")
    try:
        tmp.write_text(_stamp_value(lib_path))
        os.replace(tmp, _stamp_path(lib_path))
    except OSError:
        tmp.unlink(missing_ok=True)


def _stamp_valid(lib_path):
    try:
        return _stamp_path(lib_path).read_text() == _stamp_value(lib_path)
    except OSError:
        return False


def _compile(lib_path):
    # compile to a per-process temp path and os.replace (atomic): Pool
    # workers all hit first-use compilation concurrently, and g++
    # writing the final .so directly could leave a corrupt library that
    # a sibling worker dlopens mid-write (or that poisons every later
    # run with a fresh mtime)
    tmp = lib_path.with_suffix(f".so.tmp{os.getpid()}")
    # -march=native is safe here: the library is (re)compiled on first
    # use on the machine that runs it and the cache filename is keyed
    # by the host ISA (_isa_tag), never shared across ISAs.  It
    # matters: the cosmic-ray kernel's branchless rank scans only
    # vectorize with the host's full SIMD set.  Retried without the
    # flag for exotic toolchains that reject it.
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17"]
    try:
        for extra in (["-march=native"], []):
            cmd = base + extra + ["-o", str(tmp), str(_SRC)]
            result = subprocess.run(cmd, capture_output=True, timeout=120)
            if result.returncode == 0:
                break
        else:
            result.check_returncode()
        os.replace(tmp, lib_path)
    finally:
        tmp.unlink(missing_ok=True)


def _selftest(lib_path):
    """True if the cached .so survives one real call in a subprocess.

    A pre-existing cache could still carry instructions this host
    cannot execute (ISA-flag hash collision, partial CPU-flag
    reporting): dlopen+call would then SIGILL and kill the process.
    Probing in a throwaway subprocess turns that crash into a rebuild.
    """
    code = (
        "import ctypes, numpy as np\n"
        f"lib = ctypes.CDLL({str(lib_path)!r})\n"
        "d = np.zeros((8, 8)); m = np.zeros((8, 8), np.uint8)\n"
        "c = np.zeros((8, 8))\n"
        "lib.lc_detect_cosmics("
        "d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), None, 8, 8,"
        "ctypes.c_double(4.5), ctypes.c_double(0.3),"
        "ctypes.c_double(5.0), 2,"
        "m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),"
        "c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=60)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def load():
    """Return the ctypes library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LIGHTCURVER_DISABLE_NATIVE"):
        return None
    try:
        lib_path = _lib_path()
        cached = (lib_path.exists()
                  and lib_path.stat().st_mtime >= _SRC.stat().st_mtime)
        # the subprocess selftest costs ~0.5-2 s and every Pool worker
        # calls load() once — a stamp recording "this exact binary ran
        # on this host" amortizes it to once per build instead of once
        # per process
        if cached and not _stamp_valid(lib_path):
            if _selftest(lib_path):
                _write_stamp(lib_path)
            else:
                # stale/foreign binary: rebuild rather than trust it
                cached = False
        if not cached:
            _compile(lib_path)
            # compiled on THIS host just now: trusted by construction
            _write_stamp(lib_path)
        lib = ctypes.CDLL(str(lib_path))
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
