"""ctypes binding for the native C++ batch image decoder.

Builds ``native/libdream_loader.so`` on first use (cached) and exposes
:func:`decode_batch`.  Falls back to PIL transparently when the native
toolchain or image libraries are unavailable, so the framework never hard-
depends on the shared object.

This is the runtime's native data-loading component: the host-side decode
thread pool lives in C++ (no GIL, no worker processes), replacing the
reference's DataLoader fork-per-worker design (reference
scripts/train_network.py:448-454).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libdream_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.dl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.dl_decode_batch.restype = ctypes.c_int
        lib.dl_decode_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dl_decode_probe.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def probe(path: str):
    """Return (width, height) of an image, or None on failure."""
    lib = _load_library()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            return im.size
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.dl_decode_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return (w.value, h.value)


def decode_batch(
    paths: Sequence[str],
    height: int,
    width: int,
    n_threads: int = 8,
) -> np.ndarray:
    """Decode a batch of image files into a [n, height, width, 3] uint8 array.

    Frames whose native size differs are bilinearly resized (C++ side).
    """
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    lib = _load_library()
    if lib is None:
        from PIL import Image

        for i, p in enumerate(paths):
            with Image.open(p) as im:
                im = im.convert("RGB")
                if im.size != (width, height):
                    im = im.resize((width, height), resample=Image.BILINEAR)
                out[i] = np.asarray(im)
        return out

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.dl_decode_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, n_threads,
    )
    if failures:
        raise IOError(f"native decoder failed on {failures}/{n} frames")
    return out
