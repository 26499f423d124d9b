"""ctypes binding for the native frame loader (native/frame_loader.cc).

Decodes PNG frames and resizes them straight into contiguous NHWC float32
buffers — the framework's native data-IO layer (the reference relies on
decord/imageio's native decoders under its python loader). Falls back
cleanly when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os.path as osp
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = osp.join(
    osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
    "native",
    "libframeloader.so",
)
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.isfile(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.me_load_frames.restype = ctypes.c_int
    lib.me_load_frames.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


MODE_RGB_BILINEAR = 0
MODE_GRAY_NEAREST = 1


def load_frames(
    paths: Sequence[str], height: int, width: int, mode: int = MODE_RGB_BILINEAR
) -> Optional[np.ndarray]:
    """Decode+resize a batch of PNGs. Returns [N, H, W, C] float32 in
    [0, 255], or None if the native library is unavailable or decoding
    failed (caller falls back to the PIL path)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    ch = 1 if mode == MODE_GRAY_NEAREST else 3
    out = np.empty((n, height, width, ch), np.float32)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    ok = lib.me_load_frames(
        blob, len(blob), n, height, width, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ok != n:
        return None
    return out
