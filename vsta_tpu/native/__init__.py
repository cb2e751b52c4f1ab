"""Native (C++) host-side data-pipeline components, bound via ctypes.

The reference's decode/resize hot path runs in PIL/torchvision's C
internals on DataLoader workers (reference:
project/data/wildtrack_loader.py:368-373). This package is the
framework's own native equivalent - see imgcodec.cpp. The library is
compiled on first use with the system toolchain (g++ + libjpeg/libpng)
and cached next to the source; every entry point degrades gracefully to
the PIL path when the toolchain or codecs are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "imgcodec.cpp"
_LIB = _HERE / "_imgcodec.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        str(_SRC),
        "-o",
        str(_LIB),
        "-ljpeg",
        "-lpng",
        "-lz",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except Exception:
        return False
    if r.returncode != 0:
        print(f"[vsta_tpu.native] build failed:\n{r.stderr[:2000]}")
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VSTA_NO_NATIVE"):
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            print(f"[vsta_tpu.native] load failed: {e}")
            return None
        lib.vsta_decode_resize_u8.restype = ctypes.c_int
        lib.vsta_decode_resize_u8.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.vsta_decode_resize_norm.restype = ctypes.c_int
        lib.vsta_decode_resize_norm.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.vsta_image_size.restype = ctypes.c_int
        lib.vsta_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native codec is built and loadable."""
    return _load() is not None


def decode_resize_u8(path: str, out_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Decode PNG/JPEG + PIL-style triangle resize -> uint8 [H, W, 3].

    Returns None when the native library is unavailable or decoding
    fails (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    H, W = out_hw
    out = np.empty((H, W, 3), np.uint8)
    rc = lib.vsta_decode_resize_u8(
        path.encode(), H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    )
    return out if rc == 0 else None


def decode_resize_norm(
    path: str,
    out_hw: Tuple[int, int],
    mean: np.ndarray,
    std: np.ndarray,
) -> Optional[np.ndarray]:
    """Decode + resize + fused (x/255 - mean)/std -> float32 [H, W, 3]."""
    lib = _load()
    if lib is None:
        return None
    H, W = out_hw
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    out = np.empty((H, W, 3), np.float32)
    rc = lib.vsta_decode_resize_norm(
        path.encode(),
        H,
        W,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def image_size(path: str) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vsta_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None
