"""ctypes bindings for the native field pipeline (native/fieldpipe.cpp).

Builds the shared library on first use if a compiler is available and
falls back to the pure-Python/scipy paths otherwise, so the package works
everywhere and goes fast where it can.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False


def _repo_native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def get_lib():
    """The loaded library, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    ndir = _repo_native_dir()
    so = os.path.join(ndir, "libfieldpipe.so")
    src = os.path.join(ndir, "fieldpipe.cpp")
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src,
                 "-pthread"], check=True, capture_output=True, timeout=120)
            logger.info("Built native fieldpipe library")
        except Exception as e:  # noqa: BLE001
            logger.info("Could not build native fieldpipe (%s); using "
                        "Python fallbacks", e)
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.decode_i16.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_float, ctypes.c_float, ctypes.c_int16,
            ctypes.c_int]
        lib.fill_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.fill_seafloor.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _LIB = lib
    except OSError as e:
        logger.info("Could not load native fieldpipe: %s", e)
    return _LIB


def decode_i16(raw, scale, offset, fill=None):
    """int16 -> float32 CF unpack; returns None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.int16)
    out = np.empty(raw.shape, dtype=np.float32)
    lib.decode_i16(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size, float(scale), float(offset),
        np.int16(fill) if fill is not None else 0,
        1 if fill is not None else 0)
    return out


def fill_nearest(field):
    """In-place NaN -> nearest-valid fill over the last two axes.
    Returns True if the native path ran."""
    lib = get_lib()
    if lib is None:
        return False
    f = field
    assert f.dtype == np.float32 and f.flags["C_CONTIGUOUS"]
    ny, nx = f.shape[-2], f.shape[-1]
    nz = int(np.prod(f.shape[:-2])) if f.ndim > 2 else 1
    lib.fill_nearest(f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     nz, ny, nx)
    return True


def fill_seafloor(block):
    """In-place downward fill along axis 0 of a (Z, Y, X) block."""
    lib = get_lib()
    if lib is None:
        return False
    assert block.dtype == np.float32 and block.flags["C_CONTIGUOUS"]
    nz, ny, nx = block.shape
    lib.fill_seafloor(block.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), nz, ny, nx)
    return True
