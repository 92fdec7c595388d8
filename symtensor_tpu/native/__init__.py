"""Native (C++) table-generation backend.

Compiles `tablegen.cpp` with the system g++ on first use (cached next to the
source) and binds it via ctypes — no pybind11 needed. Every entry point has
a NumPy reference implementation in utils/; `available()` gates usage and
tests assert bit-identical outputs between the two backends.

Disable with SYMTENSOR_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from ..config import logger

_HERE = Path(__file__).parent
_SRC = _HERE / "tablegen.cpp"
_LIB_PATH = _HERE / "_tablegen.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    # No -march=native: the .so is built locally per machine (and excluded
    # from version control), but a cached build may still travel with a
    # copied checkout — keep the ISA baseline portable.
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:  # noqa: BLE001 — fall back to NumPy on any failure
        logger.warning("native tablegen compile failed (%s); using NumPy", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SYMTENSOR_NO_NATIVE"):
            return None
        # >= (not >): a fresh checkout gives source and any stray cached
        # binary identical mtimes — rebuild rather than trusting a binary
        # from another machine.
        if not _LIB_PATH.exists() or (
            _SRC.stat().st_mtime >= _LIB_PATH.stat().st_mtime
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            logger.warning("native tablegen load failed (%s)", e)
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.st_indep_size.restype = ctypes.c_int64
        lib.st_indep_size.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.st_gflat_rep.restype = ctypes.c_int64
        lib.st_gflat_rep.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p]
        lib.st_row_stats.restype = ctypes.c_int64
        lib.st_row_stats.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int32,
            f32p, i32p,
        ]
        lib.st_position.restype = ctypes.c_int64
        lib.st_position.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i64p,
        ]
        lib.st_dense_gather.restype = ctypes.c_int64
        lib.st_dense_gather.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p]
        lib.st_insert_table.restype = ctypes.c_int64
        lib.st_insert_table.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def gflat_rep(rank: int, dim: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or rank < 2:
        return None
    n = lib.st_indep_size(rank, dim)
    out = np.empty((n, rank), dtype=np.int32)
    got = lib.st_gflat_rep(rank, dim, _ptr(out, ctypes.c_int32))
    if got != n:
        return None
    return out


def row_stats(rep: np.ndarray, rank: int, classes) -> Optional[tuple]:
    """(gamma float32, class_ids int32) for sorted int rows."""
    lib = _load()
    if lib is None:
        return None
    rep32 = np.ascontiguousarray(rep, dtype=np.int32)
    n = len(rep32)
    cls = np.zeros((len(classes), rank), dtype=np.int32)
    for i, c in enumerate(classes):
        cls[i, : len(c)] = c
    gamma = np.empty(n, dtype=np.float32)
    cid = np.empty(n, dtype=np.int32)
    got = lib.st_row_stats(
        _ptr(rep32, ctypes.c_int32),
        n,
        rank,
        _ptr(cls, ctypes.c_int32),
        len(classes),
        _ptr(gamma, ctypes.c_float),
        _ptr(cid, ctypes.c_int32),
    )
    if got != n:
        return None
    return gamma, cid


def position(rows: np.ndarray, rank: int, dim: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or rank < 2:
        return None
    rows32 = np.ascontiguousarray(rows, dtype=np.int32)
    out = np.empty(len(rows32), dtype=np.int64)
    got = lib.st_position(
        _ptr(rows32, ctypes.c_int32), len(rows32), rank, dim,
        _ptr(out, ctypes.c_int64),
    )
    return out if got == len(rows32) else None


def dense_gather(rank: int, dim: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    total = dim**rank
    out = np.empty(total, dtype=np.int32)
    got = lib.st_dense_gather(rank, dim, _ptr(out, ctypes.c_int32))
    return out if got == total else None


def insert_table(
    reps: np.ndarray, k: int, dim: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    reps32 = np.ascontiguousarray(reps, dtype=np.int32)
    out = np.empty((len(reps32), dim), dtype=np.int32)
    got = lib.st_insert_table(
        _ptr(reps32, ctypes.c_int32), len(reps32), k, dim,
        _ptr(out, ctypes.c_int32),
    )
    return out if got == len(reps32) * dim else None
