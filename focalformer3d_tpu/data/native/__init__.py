"""ctypes binding + on-demand build of the native point loader.

Compiles pointloader.cpp with g++ on first use (cached as a .so next to the
source); falls back to None when no toolchain is available — callers keep a
NumPy path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libpointloader.so"
_SRC = _DIR / "pointloader.cpp"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.ffl_load_sweeps.restype = ctypes.c_int64
    lib.ffl_load_sweeps.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def load_sweeps_native(
    paths,
    rotations: np.ndarray,  # (n, 3, 3) float32
    translations: np.ndarray,  # (n, 3) float32
    time_lags: np.ndarray,  # (n,) float32
    use_rot: np.ndarray,  # (n,) uint8
    use_trans: np.ndarray,
    remove_close: np.ndarray,
    load_dim: int = 5,
    close_radius: float = 1.0,
    capacity: int = 400000,
    n_threads: int = 8,
) -> Optional[np.ndarray]:
    """Parallel load+transform+concat; returns (rows, load_dim) or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[str(p).encode() for p in paths]
    )
    rot = np.ascontiguousarray(rotations, np.float32)
    tr = np.ascontiguousarray(translations, np.float32)
    tl = np.ascontiguousarray(time_lags, np.float32)
    ur = np.ascontiguousarray(use_rot, np.uint8)
    ut = np.ascontiguousarray(use_trans, np.uint8)
    rc = np.ascontiguousarray(remove_close, np.uint8)
    out = np.empty((capacity, load_dim), np.float32)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def up(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    rows = lib.ffl_load_sweeps(
        c_paths, n, fp(rot), fp(tr), fp(tl), up(ur), up(ut), up(rc),
        load_dim, ctypes.c_float(close_radius), fp(out),
        ctypes.c_int64(capacity), n_threads,
    )
    return out[:rows]
