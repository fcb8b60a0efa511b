"""ctypes bindings for the native ORF-scanning core (``native/orfscan.cpp``).

Loads ``liborfscan.so`` from the package directory when built
(``make -C native``); if absent, callers fall back to the pure-Python
implementations in ``gecco_tpu.orf.scan`` (identical semantics, tested
for equality).  The library is also built on demand by
``ensure_built()`` when a C++ toolchain is available.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy

__all__ = ["load", "ensure_built", "native_candidates", "native_hexamer_counts", "native_scores"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "liborfscan.so")
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def ensure_built(quiet: bool = True) -> bool:
    """Try to build the shared library with the in-repo Makefile."""
    if os.path.exists(_LIB_PATH):
        return True
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (OSError, subprocess.CalledProcessError):
        return False
    return os.path.exists(_LIB_PATH)


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or `None`."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.orfscan_candidates.restype = ctypes.c_int
    lib.orfscan_candidates.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.orfscan_hexamer_counts.restype = None
    lib.orfscan_hexamer_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.orfscan_score.restype = None
    lib.orfscan_score.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def _ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def native_candidates(
    codes: "numpy.ndarray", min_gene: int, max_starts: int
) -> Optional[Tuple["numpy.ndarray", "numpy.ndarray", "numpy.ndarray"]]:
    lib = load()
    if lib is None:
        return None
    codes8 = numpy.ascontiguousarray(codes, dtype=numpy.int8)
    capacity = max(1024, len(codes8))
    while True:
        starts = numpy.empty(capacity, dtype=numpy.int32)
        ends = numpy.empty(capacity, dtype=numpy.int32)
        flags = numpy.empty(capacity, dtype=numpy.uint8)
        count = lib.orfscan_candidates(
            _ptr(codes8, ctypes.c_int8), len(codes8), min_gene, max_starts,
            _ptr(starts, ctypes.c_int32), _ptr(ends, ctypes.c_int32),
            _ptr(flags, ctypes.c_uint8), capacity,
        )
        if count >= 0:
            return starts[:count].copy(), ends[:count].copy(), flags[:count].copy()
        capacity *= 2


def native_hexamer_counts(codes: "numpy.ndarray", spans: List[Tuple[int, int]]) -> Optional["numpy.ndarray"]:
    lib = load()
    if lib is None:
        return None
    codes8 = numpy.ascontiguousarray(codes, dtype=numpy.int8)
    counts = numpy.ones(4096, dtype=numpy.float64)
    if spans:
        begins = numpy.array([b for b, _ in spans], dtype=numpy.int32)
        ends = numpy.array([e for _, e in spans], dtype=numpy.int32)
        lib.orfscan_hexamer_counts(
            _ptr(codes8, ctypes.c_int8), len(codes8),
            _ptr(begins, ctypes.c_int32), _ptr(ends, ctypes.c_int32), len(spans),
            _ptr(counts, ctypes.c_double),
        )
    return counts


def native_scores(
    codes: "numpy.ndarray", log_odds: "numpy.ndarray",
    starts: "numpy.ndarray", ends: "numpy.ndarray",
) -> Optional["numpy.ndarray"]:
    lib = load()
    if lib is None:
        return None
    codes8 = numpy.ascontiguousarray(codes, dtype=numpy.int8)
    odds = numpy.ascontiguousarray(log_odds, dtype=numpy.float64)
    starts32 = numpy.ascontiguousarray(starts, dtype=numpy.int32)
    ends32 = numpy.ascontiguousarray(ends, dtype=numpy.int32)
    out = numpy.empty(len(starts32), dtype=numpy.float64)
    lib.orfscan_score(
        _ptr(codes8, ctypes.c_int8), len(codes8), _ptr(odds, ctypes.c_double),
        _ptr(starts32, ctypes.c_int32), _ptr(ends32, ctypes.c_int32), len(starts32),
        _ptr(out, ctypes.c_double),
    )
    return out
