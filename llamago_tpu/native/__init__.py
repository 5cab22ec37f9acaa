"""ctypes bindings for the native C++ data-path library (ggjt_kernels.cpp).

Auto-builds libggjt.so with g++ on first use (cached next to the source);
every entry point has a numpy fallback, so the framework works without a
compiler — the native path is a host-throughput optimization for
checkpoint conversion/loading (multithreaded FP16 widening and Q8_0/Q4_0
block quantization).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ggjt_kernels.cpp")
_SO = os.path.join(_HERE, "libggjt.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _threads() -> int:
    env = os.environ.get("LLAMAGO_THREADS")
    if env and env.isdigit() and int(env) > 0:
        return int(env)
    return max(1, os.cpu_count() or 1)


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    global _tried
    if os.path.exists(_SO) and not force:
        if os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ggjt_fp16_to_fp32.argtypes = [u16p, f32p, i64, i32]
        lib.ggjt_quantize_q8_0.argtypes = [f32p, u8p, i64, i64, i32]
        lib.ggjt_quantize_q4_0.argtypes = [f32p, u8p, i64, i64, i32]
        lib.ggjt_transpose_f32.argtypes = [f32p, f32p, i64, i64, i32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def fp16_to_fp32(src: np.ndarray) -> np.ndarray | None:
    """Multithreaded FP16 -> FP32. None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    dst = np.empty(src.shape, np.float32)
    lib.ggjt_fp16_to_fp32(
        _ptr(src.view(np.uint16), ctypes.c_uint16),
        _ptr(dst, ctypes.c_float),
        src.size,
        _threads(),
    )
    return dst


def quantize_rows(kind: str):
    """Return a callable (f32 [out, in] -> raw uint8 blocks) or None."""
    lib = _load()
    if lib is None:
        return None
    if kind not in ("q8_0", "q4_0"):
        return None  # q4_1 has a numpy-only path (quant_file.py)
    from llamago_tpu.checkpoint.quant_file import row_bytes

    fn = lib.ggjt_quantize_q8_0 if kind == "q8_0" else lib.ggjt_quantize_q4_0

    def quantize(x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        out, k = x.shape
        dst = np.empty((out, row_bytes(kind, k)), np.uint8)
        fn(_ptr(x, ctypes.c_float), _ptr(dst, ctypes.c_uint8), out, k, _threads())
        return dst

    return quantize


def transpose_f32(src: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    rows, cols = src.shape
    dst = np.empty((cols, rows), np.float32)
    lib.ggjt_transpose_f32(
        _ptr(src, ctypes.c_float), _ptr(dst, ctypes.c_float), rows, cols, _threads()
    )
    return dst
