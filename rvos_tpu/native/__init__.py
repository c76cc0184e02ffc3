"""ctypes bindings for the native preprocessing library.

Builds ``libpreproc.so`` from ``preproc.cpp`` on first use (g++ -O3,
portable codegen — the binary is never committed, so every host runs
object code built for its own toolchain); every entry point has a numpy
fallback so the framework runs without a toolchain.  See
``preproc.cpp`` for the op inventory.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpreproc.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "preproc.cpp")
    cmd = ["g++", "-O3", "-mtune=generic", "-shared", "-fPIC", "-o", _SO, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO)
                < os.path.getmtime(os.path.join(_HERE, "preproc.cpp"))):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.normalize_u8.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int,
                                     f32p, f32p]
        lib.normalize_f32.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                      f32p, f32p]
        lib.resize_nearest_u8.argtypes = [u8p, u8p] + [ctypes.c_int] * 4
        lib.resize_bilinear_f32.argtypes = [f32p, f32p] + [ctypes.c_int] * 5
        lib.box_blur_f32.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int]
        lib.gaussian_noise_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_uint64]
        lib.salt_pepper_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_uint64]
        _lib = lib
        return _lib


_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _up(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def normalize(img: np.ndarray) -> np.ndarray:
    """Fused uint8/float → normalized float32 (ImageNet stats)."""
    lib = get_lib()
    h, w = img.shape[:2]
    out = np.empty((h, w, 3), np.float32)
    if lib is not None:
        img = np.ascontiguousarray(img)
        if img.dtype == np.uint8:
            lib.normalize_u8(_up(img), _fp(out), h, w, _fp(_MEAN), _fp(_STD))
        else:
            imgf = img.astype(np.float32, copy=False)
            lib.normalize_f32(_fp(np.ascontiguousarray(imgf)), _fp(out), h, w,
                              _fp(_MEAN), _fp(_STD))
        return out
    return ((img.astype(np.float32) / 255.0) - _MEAN) / _STD


def resize_nearest_label(lab: np.ndarray, hw) -> np.ndarray:
    lib = get_lib()
    dh, dw = hw
    if lib is not None and lab.dtype == np.uint8:
        lab = np.ascontiguousarray(lab)
        out = np.empty((dh, dw), np.uint8)
        lib.resize_nearest_u8(_up(lab), _up(out), lab.shape[0], lab.shape[1],
                              dh, dw)
        return out
    sh, sw = lab.shape[:2]
    ys = np.minimum((np.arange(dh) * (sh / dh)).astype(np.int64), sh - 1)
    xs = np.minimum((np.arange(dw) * (sw / dw)).astype(np.int64), sw - 1)
    return lab[ys][:, xs]


def box_blur(img: np.ndarray, k: int) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(img.astype(np.float32))
        out = np.empty_like(src)
        lib.box_blur_f32(_fp(src), _fp(out), src.shape[0], src.shape[1], k)
        return out
    from ..data.perturb import box_blur as np_blur
    return np_blur(img, k)


def gaussian_noise(img: np.ndarray, std: float, seed: int = 0) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.ascontiguousarray(img.astype(np.float32))
        lib.gaussian_noise_f32(_fp(out), out.shape[0], out.shape[1],
                               ctypes.c_float(std), ctypes.c_uint64(seed))
        return out
    from ..data.perturb import gaussian_noise as np_noise
    return np_noise(img, std, np.random.default_rng(seed))


def salt_pepper(img: np.ndarray, n_points: int, seed: int = 0) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.ascontiguousarray(img.astype(np.float32))
        lib.salt_pepper_f32(_fp(out), out.shape[0], out.shape[1], n_points,
                            ctypes.c_uint64(seed))
        return out
    from ..data.perturb import salt_and_pepper as np_sp
    return np_sp(img, n_points, np.random.default_rng(seed))
