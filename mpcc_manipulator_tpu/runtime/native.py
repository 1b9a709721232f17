"""ctypes bindings for the native runtime library (cpp/mpcc_runtime.cpp).

Provides:
  * :func:`parse_floats` — fast parser for the reference-format weight/bias
    text files (drop-in replacement for numpy.loadtxt on these assets);
  * :class:`TelemetryRing` — non-blocking per-tick logger backed by a
    native SPSC ring buffer with a background flusher thread.

The library auto-builds with ``make`` on first use; every entry point has a
pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libmpcc_runtime.so")

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CPP_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.mpcc_parse_floats.restype = ctypes.c_longlong
    lib.mpcc_parse_floats.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_longlong]
    lib.mpcc_ring_create.restype = ctypes.c_void_p
    lib.mpcc_ring_create.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int]
    lib.mpcc_ring_append.restype = ctypes.c_int
    lib.mpcc_ring_append.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.mpcc_ring_dropped.restype = ctypes.c_ulonglong
    lib.mpcc_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.mpcc_ring_close.restype = None
    lib.mpcc_ring_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def parse_floats(path: str, expected: int | None = None) -> np.ndarray:
    """Parse whitespace-separated doubles from a text file (native fast path,
    numpy fallback)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path).reshape(-1)
    cap = expected if expected is not None else os.path.getsize(path) // 2 + 16
    out = np.empty(cap, dtype=np.float64)
    n = lib.mpcc_parse_floats(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(cap))
    if n < 0:
        raise IOError(f"cannot read {path}")
    return out[:n].copy()


class TelemetryRing:
    """Non-blocking telemetry logger (native ring buffer; Python fallback
    buffers in memory and writes on close)."""

    def __init__(self, path: str, record_len: int, capacity: int = 4096,
                 text_mode: bool = False):
        self.record_len = record_len
        self.path = path
        self.text_mode = text_mode
        self._lib = _load()
        self._handle = None
        self._fallback: list[np.ndarray] | None = None
        if self._lib is not None:
            self._handle = self._lib.mpcc_ring_create(
                path.encode(), record_len, capacity, int(text_mode))
        if self._handle is None:
            self._fallback = []

    def append(self, record: np.ndarray) -> bool:
        rec = np.ascontiguousarray(record, dtype=np.float64)
        assert rec.size == self.record_len
        if self._handle is not None:
            return bool(self._lib.mpcc_ring_append(
                self._handle, rec.ctypes.data_as(ctypes.POINTER(ctypes.c_double))))
        self._fallback.append(rec.copy())
        return True

    @property
    def dropped(self) -> int:
        if self._handle is not None:
            return int(self._lib.mpcc_ring_dropped(self._handle))
        return 0

    def close(self):
        if self._handle is not None:
            self._lib.mpcc_ring_close(self._handle)
            self._handle = None
        elif self._fallback is not None:
            arr = np.stack(self._fallback) if self._fallback else \
                np.zeros((0, self.record_len))
            if self.text_mode:
                np.savetxt(self.path, arr, fmt="%.17g")
            else:
                arr.astype(np.float64).tofile(self.path)
            self._fallback = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
