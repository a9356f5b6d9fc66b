"""ctypes bindings for the native (C++) components, with lazy build.

The shared library is compiled on first use with g++ (cached next to the
source).  Every native entry point has a pure-Python oracle in the package;
callers fall back automatically if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "edt.cpp"), os.path.join(_HERE, "mailbox.cpp")]
_LIB = os.path.join(_HERE, "libkissmpc_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o",
        _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or any(
            os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.kissmpc_edt.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.kissmpc_edt.restype = None
        lib.kissmpc_pack_circles.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.kissmpc_pack_circles.restype = ctypes.c_int
        lib.kissmpc_mailbox_create.argtypes = [ctypes.c_int64]
        lib.kissmpc_mailbox_create.restype = ctypes.c_void_p
        lib.kissmpc_mailbox_destroy.argtypes = [ctypes.c_void_p]
        lib.kissmpc_mailbox_destroy.restype = None
        lib.kissmpc_mailbox_publish.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.kissmpc_mailbox_publish.restype = ctypes.c_uint64
        lib.kissmpc_mailbox_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.kissmpc_mailbox_read.restype = ctypes.c_uint64
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def edt(foreground: np.ndarray) -> Optional[np.ndarray]:
    """Native exact EDT; None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    fg = np.ascontiguousarray(foreground != 0, dtype=np.uint8)
    h, w = fg.shape
    out = np.empty((h, w), dtype=np.float32)
    lib.kissmpc_edt(
        fg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def pack_circles_from_dist(
    dist: np.ndarray, min_radius: float, max_circles: int
):
    """Native greedy packing on a distance transform; None if unavailable.

    Mutates a copy of ``dist``; returns (centers [M, 2] (x, y), radii [M]).
    """
    lib = load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dist, dtype=np.float32).copy()
    h, w = d.shape
    centers = np.empty((max_circles, 2), dtype=np.float32)
    radii = np.empty((max_circles,), dtype=np.float32)
    n = lib.kissmpc_pack_circles(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h,
        w,
        ctypes.c_float(min_radius),
        max_circles,
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        radii.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return centers[:n].astype(np.float64), radii[:n].astype(np.float64)


class Mailbox:
    """Native seqlock mailbox for fixed-capacity float payloads.

    Single-writer / any-reader, lock-free (mailbox.cpp): the real-time
    equivalent of `io.pubsub.LatestValue` — publish never blocks, read never
    observes a torn payload, and the critical section runs outside the GIL.
    ``None`` from `create` means the native toolchain is unavailable (callers
    fall back to the Python LatestValue).
    """

    def __init__(self, lib, handle, capacity: int):
        self._lib = lib
        self._h = handle
        self._cap = capacity
        self._out = np.empty((capacity,), dtype=np.float64)
        self._n = ctypes.c_int64(0)

    @staticmethod
    def create(capacity: int) -> Optional["Mailbox"]:
        lib = load()
        if lib is None:
            return None
        h = lib.kissmpc_mailbox_create(ctypes.c_int64(capacity))
        if not h:
            return None
        return Mailbox(lib, h, capacity)

    def publish(self, data: np.ndarray) -> int:
        flat = np.ascontiguousarray(data, dtype=np.float64).reshape(-1)
        assert flat.size <= self._cap, (flat.size, self._cap)
        return int(
            self._lib.kissmpc_mailbox_publish(
                self._h,
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.c_int64(flat.size),
            )
        )

    def read(self):
        """-> (payload copy [n] | None, version) — LatestValue's contract."""
        v = int(
            self._lib.kissmpc_mailbox_read(
                self._h,
                self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.byref(self._n),
            )
        )
        if v == 0:
            return None, 0
        return self._out[: self._n.value].copy(), v

    def close(self) -> None:
        if self._h:
            self._lib.kissmpc_mailbox_destroy(self._h)
            self._h = None

    def __del__(self):  # best-effort; close() is the explicit path
        try:
            self.close()
        except Exception:
            pass
