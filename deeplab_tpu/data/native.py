"""ctypes bindings for the native C++ image-ops library (native/imgops.cpp).

The native lib is the framework's equivalent of the reference's OpenCV C++
layer (SURVEY.md N3).  ``augment.py`` routes through these functions when the
library is built (``make -C native``); otherwise its pure-numpy fallbacks run
with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libimgops.so"),
                 os.environ.get("DEEPLAB_TPU_IMGOPS", "")):
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.resize_bilinear_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.c_int]
            lib.resize_nearest_u8.argtypes = lib.resize_bilinear_u8.argtypes
            lib.flip_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
            lib.lut_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.warp_affine_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.gaussian_blur_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
            lib.bgr2yuv_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.yuv2bgr_u8.argtypes = lib.bgr2yuv_u8.argtypes
            lib.clahe_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return load() is not None


def _chw(img: np.ndarray):
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    return h, w, c


def resize_bilinear(img: np.ndarray, size_wh) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    h, w, c = _chw(img)
    ow, oh = int(size_wh[0]), int(size_wh[1])
    out = np.empty((oh, ow) + img.shape[2:], np.uint8)
    lib.resize_bilinear_u8(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def resize_nearest(img: np.ndarray, size_wh) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    h, w, c = _chw(img)
    ow, oh = int(size_wh[0]), int(size_wh[1])
    out = np.empty((oh, ow) + img.shape[2:], np.uint8)
    lib.resize_nearest_u8(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def flip(img: np.ndarray, axis: int) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    h, w, c = _chw(img)
    out = np.empty_like(img)
    lib.flip_u8(_u8p(img), h, w, c, axis, _u8p(out))
    return out


def apply_lut(img: np.ndarray, table: np.ndarray) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    table = np.ascontiguousarray(table, np.uint8)
    out = np.empty_like(img)
    lib.lut_u8(_u8p(img), img.size, _u8p(table), _u8p(out))
    return out


def warp_affine(img: np.ndarray, M: np.ndarray, size_wh,
                nearest: bool = False) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    h, w, c = _chw(img)
    ow, oh = int(size_wh[0]), int(size_wh[1])
    M = np.ascontiguousarray(M, np.float64)
    out = np.empty((oh, ow) + img.shape[2:], np.uint8)
    lib.warp_affine_u8(_u8p(img), h, w, c,
                       M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                       _u8p(out), oh, ow, int(nearest))
    return out


def gaussian_blur(img: np.ndarray, ksize: int) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    h, w, c = _chw(img)
    out = np.empty_like(img)
    lib.gaussian_blur_u8(_u8p(img), h, w, c, ksize, _u8p(out))
    return out


def bgr_to_yuv(img: np.ndarray) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    out = np.empty_like(img)
    lib.bgr2yuv_u8(_u8p(img), img.shape[0] * img.shape[1], _u8p(out))
    return out


def yuv_to_bgr(img: np.ndarray) -> np.ndarray:
    lib = load()
    img = np.ascontiguousarray(img)
    out = np.empty_like(img)
    lib.yuv2bgr_u8(_u8p(img), img.shape[0] * img.shape[1], _u8p(out))
    return out


def clahe(channel: np.ndarray, clip_limit: float = 2.0, tiles=(8, 8)
          ) -> np.ndarray:
    lib = load()
    channel = np.ascontiguousarray(channel)
    h, w = channel.shape
    out = np.empty_like(channel)
    lib.clahe_u8(_u8p(channel), h, w, float(clip_limit), tiles[0], tiles[1],
                 _u8p(out))
    return out
