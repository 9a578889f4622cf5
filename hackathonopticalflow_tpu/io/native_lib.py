"""ctypes bindings for the native host runtime (io/native/hofio.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to
the source. All entry points degrade gracefully: callers can check
`available()` and fall back to numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "hofio.cpp")
_SO = os.path.join(_DIR, "libhofio.so")
_lock = threading.Lock()
_lib = None
_build_err: str | None = None


def _load():
    global _lib, _build_err
    with _lock:
        if _lib is not None or _build_err is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        "-pthread",
                        _SRC,
                        "-o",
                        _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.hof_bgr2gray_u8.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.hof_u8_to_f32.argtypes = [
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int64,
            ]
            lib.hof_ring_open.restype = ctypes.c_void_p
            lib.hof_ring_open.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.hof_ring_next.restype = ctypes.c_int
            lib.hof_ring_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.hof_ring_close.argtypes = [ctypes.c_void_p]
            lib.hof_trace_contours.restype = ctypes.c_int
            lib.hof_trace_contours.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover
            _build_err = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def bgr2gray_u8(bgr: np.ndarray) -> np.ndarray:
    """OpenCV-exact BGR->gray on the host (native)."""
    lib = _load()
    bgr = np.ascontiguousarray(bgr, dtype=np.uint8)
    h, w = bgr.shape[:2]
    out = np.empty((h, w), np.uint8)
    lib.hof_bgr2gray_u8(bgr.ctypes.data, out.ctypes.data, h * w)
    return out


class RawFrameRing:
    """Background-threaded raw-frame file reader with an SPSC ring buffer
    (the host side of the decode -> device prefetch pipeline)."""

    def __init__(self, path: str, frame_shape: tuple[int, ...], n_slots: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native lib unavailable: {_build_err}")
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self._bytes = int(np.prod(frame_shape))
        self._h = lib.hof_ring_open(path.encode(), self._bytes, n_slots)
        if not self._h:
            raise FileNotFoundError(path)

    def next(self) -> np.ndarray | None:
        out = np.empty(self.frame_shape, np.uint8)
        ok = self._lib.hof_ring_next(self._h, out.ctypes.data)
        return out if ok else None

    def close(self):
        if self._h:
            self._lib.hof_ring_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def trace_contours(
    binary: np.ndarray, max_pts: int = 1 << 20, max_contours: int = 4096
) -> list[np.ndarray]:
    """Outer-border contours of a binary image (native border following —
    the framework's cv2.findContours equivalent for the show_contours
    feature, reference DenseOF.py:394-399)."""
    lib = _load()
    b = np.ascontiguousarray(binary != 0).astype(np.uint8)
    h, w = b.shape
    xy = np.empty((max_pts, 2), np.int32)
    lens = np.empty(max_contours, np.int32)
    n = lib.hof_trace_contours(
        b.ctypes.data, h, w, xy.ctypes.data, max_pts, lens.ctypes.data, max_contours
    )
    out = []
    off = 0
    for i in range(n):
        out.append(xy[off : off + lens[i]].copy())
        off += lens[i]
    return out
