"""ctypes bindings for the native host-side kernels (native/consensus.cc).

The reference leans on native code for its host data path — numba-JIT consensus
kernels (reference her2_utils.py:87-130), OpenSlide/OpenCV C libraries (SURVEY.md
§2.9). The C++ library here covers the kernels the reference JIT-compiled, built
with ``make -C native`` (or cmake). Every entry point has a pure-numpy fallback in
`stedm_tpu/data/prep.py` / `stedm_tpu/data/wsi.py`; callers use
:func:`consensus_stack_native` etc. which dispatch automatically.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[1] / "native" / "lib" / "libstedm_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # build on demand when a toolchain is present
        try:
            subprocess.run(["make", "-C", str(_LIB_PATH.parents[1])], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.stedm_consensus.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    lib.stedm_extract_patch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8)]
    lib.stedm_downscale_mean.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.stedm_wsi_patch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    # async patch pipeline (native/pipeline.cc)
    lib.stedm_pipe_create.argtypes = [ctypes.c_int64]
    lib.stedm_pipe_create.restype = ctypes.c_void_p
    lib.stedm_pipe_register.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64]
    lib.stedm_pipe_register.restype = ctypes.c_int64
    lib.stedm_pipe_submit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.stedm_pipe_submit.restype = ctypes.c_int64
    lib.stedm_pipe_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.stedm_pipe_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def consensus_stack_native(stack: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """C++ consensus over a [K, H, W] uint8 stack; None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    stack = np.ascontiguousarray(stack, dtype=np.uint8)
    k, h, w = stack.shape
    value = np.empty((h, w), np.uint8)
    strength = np.empty((h, w), np.uint8)
    lib.stedm_consensus(_u8ptr(stack), k, h * w, _u8ptr(value), _u8ptr(strength))
    return value, strength


def extract_patch_native(image: np.ndarray, y_s: int, x_s: int, patch: int,
                         fill: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    if image.ndim == 2:
        h, w = image.shape
        c = 1
        out = np.empty((patch, patch), np.uint8)
    else:
        h, w, c = image.shape
        out = np.empty((patch, patch, c), np.uint8)
    lib.stedm_extract_patch(_u8ptr(image), h, w, c, y_s, x_s, patch, fill,
                            _u8ptr(out))
    return out


def wsi_patch_native(level: np.ndarray, y0: int, x0: int, size: int,
                     down: int) -> np.ndarray | None:
    """Crop ``size*down`` at (y0, x0) in a [H, W, C] uint8 pyramid level with
    white (255) fill outside, block-mean by ``down`` -> [size, size, C]. The
    wsi_sample hot path in one GIL-releasing call; None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    level = np.ascontiguousarray(level, dtype=np.uint8)
    h, w, c = level.shape
    out = np.empty((size, size, c), np.uint8)
    lib.stedm_wsi_patch(_u8ptr(level), h, w, c, y0, x0, size, down, _u8ptr(out))
    return out


def downscale_mean_native(image: np.ndarray, factor: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape if image.ndim == 3 else (*image.shape, 1)
    out = np.empty((h // factor, w // factor, c), np.uint8)
    lib.stedm_downscale_mean(_u8ptr(image.reshape(h, w, c)), h, w, c, factor,
                             _u8ptr(out))
    return out if image.ndim == 3 else out[..., 0]
