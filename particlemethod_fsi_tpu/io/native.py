"""ctypes bindings to the native C++ IO runtime (``native/fsiio.cpp``).

The reference solver's runtime does its IO in C++ stdio
(``/root/reference/src/main.cpp:788-1189``); this module gives the Python
framework the same native-speed path for the ASCII formats, falling back to
pure NumPy when the shared library hasn't been built.  ``make -C native``
(or the first call to :func:`ensure_built`) produces ``libfsiio.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfsiio.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and build and (_NATIVE_DIR / "fsiio.cpp").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, i32p, dp, cp = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_char_p,
    )
    lib.fsiio_parse_grid_body.restype = i64
    lib.fsiio_parse_grid_body.argtypes = [cp, i64, i64, i32p, dp, dp, dp]
    lib.fsiio_write_grid.restype = ctypes.c_int32
    lib.fsiio_write_grid.argtypes = [cp, ctypes.c_double, i64, ctypes.c_double,
                                     dp, dp, i32p, dp, dp, dp]
    lib.fsiio_write_vtk.restype = ctypes.c_int32
    lib.fsiio_write_vtk.argtypes = [cp, i64, i32p, dp, dp, dp, dp, dp, dp, dp,
                                    i32p, i32p]
    _lib = lib
    return _lib


def _dptr(a):
    return None if a is None else np.ascontiguousarray(a, dtype=np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return None if a is None else np.ascontiguousarray(a, dtype=np.int32).ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_grid_body(text_bytes: bytes, n: int):
    """Parse n body rows; returns (prop, pos, pos0, vel) or None if the
    native library is unavailable."""
    lib = ensure_built()
    if lib is None:
        return None
    prop = np.empty(n, dtype=np.int32)
    pos = np.empty((n, 3), dtype=np.float64)
    pos0 = np.empty((n, 3), dtype=np.float64)
    vel = np.empty((n, 3), dtype=np.float64)
    got = lib.fsiio_parse_grid_body(
        text_bytes, len(text_bytes), n,
        prop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pos0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got != n:
        raise ValueError(f"native grid parse: expected {n} rows, got {got}")
    return prop, pos, pos0, vel


def write_grid(path, *, time, spacing, domain_min, domain_max, prop, pos,
               pos0, vel) -> bool:
    lib = ensure_built()
    if lib is None:
        return False
    rc = lib.fsiio_write_grid(
        str(path).encode(), float(time), int(prop.shape[0]), float(spacing),
        _dptr(domain_min), _dptr(domain_max), _iptr(prop), _dptr(pos),
        _dptr(pos0), _dptr(vel),
    )
    if rc:
        raise IOError(f"native grid write failed rc={rc}: {path}")
    return True


def write_vtk(path, *, prop, pos, pos0, vel, stress=None, strain=None,
              accel=None, force=None, nbr0_count=None, nbr_count=None) -> bool:
    lib = ensure_built()
    if lib is None:
        return False
    rc = lib.fsiio_write_vtk(
        str(path).encode(), int(prop.shape[0]), _iptr(prop), _dptr(pos),
        _dptr(pos0), _dptr(vel), _dptr(stress), _dptr(strain), _dptr(accel),
        _dptr(force), _iptr(nbr0_count), _iptr(nbr_count),
    )
    if rc:
        raise IOError(f"native vtk write failed rc={rc}: {path}")
    return True
