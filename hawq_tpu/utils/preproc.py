"""ctypes bindings for the native data-plane library (csrc/hawq_preproc.cpp).

Auto-builds the shared library on first use (make -C csrc) and falls back to
equivalent numpy implementations when no compiler is available, so the
Python API is always importable.  Covers:

  * preprocess_batch — uint8 HWC → resized/cropped/normalized f32 NHWC
  * quantize_int8    — f32 → int8 symmetric quantization (engine input stage)
  * pack_int4        — split-K nibble packing (kernels/matmul.py layout)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'csrc')
_SO_PATH = os.path.join(_CSRC, 'hawq_preproc.so')

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    # Always invoke make: it is a no-op when the .so is fresh, and it
    # rebuilds a stale .so left over from an older source revision (a stale
    # library would silently lack newer symbols and degrade to the numpy
    # fallbacks).
    try:
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.quantize_int8.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_int8, ctypes.c_int8, ctypes.POINTER(ctypes.c_int8)]
    lib.pack_int4_splitk.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8)]
    if hasattr(lib, 'fold4'):
        lib.fold4.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
    if hasattr(lib, 'fold4_general'):
        lib.fold4_general.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def preprocess_batch(images: np.ndarray, resize: int, crop: int,
                     mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 (B, H, W, 3) → f32 (B, crop, crop, 3), resize-short-side +
    center-crop + normalize."""
    images = np.ascontiguousarray(images, np.uint8)
    b, h, w, c = images.shape
    assert c == 3
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = _load()
    out = np.empty((b, crop, crop, 3), np.float32)
    if lib is not None:
        lib.preprocess_batch(_ptr(images, ctypes.c_uint8), b, h, w, resize,
                             crop, _ptr(mean, ctypes.c_float),
                             _ptr(std, ctypes.c_float),
                             _ptr(out, ctypes.c_float))
        return out
    # numpy fallback (nearest-equivalent bilinear via PIL)
    from PIL import Image
    for i in range(b):
        img = Image.fromarray(images[i])
        if w < h:
            nw, nh = resize, int(round(h * resize / w))
        else:
            nw, nh = int(round(w * resize / h)), resize
        img = img.resize((nw, nh), Image.BILINEAR)
        x0, y0 = (nw - crop) // 2, (nh - crop) // 2
        arr = np.asarray(img.crop((x0, y0, x0 + crop, y0 + crop)),
                         np.float32) / 255.0
        out[i] = (arr - mean) / std
    return out


def quantize_int8(x: np.ndarray, scale: float, lo: int = -128,
                  hi: int = 127) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    out = np.empty(x.shape, np.int8)
    if lib is not None:
        lib.quantize_int8(_ptr(x, ctypes.c_float), x.size, scale, lo, hi,
                          _ptr(out, ctypes.c_int8))
        return out
    return np.clip(np.floor(x / scale + 0.5), lo, hi).astype(np.int8)


def pack_int4(w: np.ndarray) -> np.ndarray:
    """Split-K nibble packing; native when available, else numpy
    (kernels/matmul.py pack_int4)."""
    w = np.ascontiguousarray(w, np.int8)
    k, n = w.shape
    assert k % 2 == 0
    lib = _load()
    if lib is not None:
        out = np.empty((k // 2, n), np.int8)
        lib.pack_int4_splitk(_ptr(w, ctypes.c_int8), k, n,
                             _ptr(out, ctypes.c_int8))
        return out
    from hawq_tpu.kernels.matmul import pack_int4 as np_pack
    return np_pack(w)


def _fold4_native(x: np.ndarray, p0: int, fh: int, fw: int) -> np.ndarray:
    """Run the C++ fold4_general over a contiguous (B, H, W, C) array."""
    lib = _load()
    b, h, w, c = x.shape
    out = np.empty((b, fh, fw, 16 * c), x.dtype)
    lib.fold4_general(
        x.view(np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, h, w, c, x.itemsize, p0, fh, fw,
        out.view(np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def fold4_images(x: np.ndarray) -> np.ndarray:
    """Host-side 4×4 block fold of the init-conv input — the production
    input layout for the integer engines (inference/fold.py, docs/
    perf_tpu.md).  Native (threaded C++) when available; numpy fallback is
    value-identical."""
    from hawq_tpu.inference.fold import fold4_geometry
    x = np.ascontiguousarray(x)
    b, h, w, c = x.shape
    fh, fw = fold4_geometry(h, w)      # validates h % 4 == 0 and w % 4 == 0
    lib = _load()
    if lib is not None and hasattr(lib, 'fold4_general'):
        return _fold4_native(x, 3, fh, fw)
    from hawq_tpu.inference.fold import fold4_images as np_fold
    return np_fold(x)


def fold4_images_3x3s2(x: np.ndarray, p0: int) -> np.ndarray:
    """Host-side 4×4 fold for a 3×3/stride-2 init conv (InceptionV3 p0=0 —
    its production input path, docs/perf_tpu.md; MobileNetV2 p0=1).
    Native (threaded C++) when available; numpy fallback value-identical."""
    from hawq_tpu.inference.fold import fold4_3x3s2_geometry
    x = np.ascontiguousarray(x)
    b, h, w, c = x.shape
    lib = _load()
    if lib is not None and hasattr(lib, 'fold4_general'):
        _, fh, _ = fold4_3x3s2_geometry(h, p0)
        _, fw, _ = fold4_3x3s2_geometry(w, p0)
        return _fold4_native(x, p0, fh, fw)
    from hawq_tpu.inference.fold import fold4_images_3x3s2 as np_fold
    return np_fold(x, p0)
