"""ctypes bindings + on-demand build of the native preprocessing engine.

The shared library is compiled once (g++ -O3, cached beside the source,
keyed by source mtime); every entry point has a pure-Python/JAX fallback
(ecgmm_tpu.data.preprocess), so the framework works even where a C++
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "_libecgmm_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library if stale. Returns an error message or
    None. Freshness requires BOTH a newer-than-source mtime AND a
    matching host-CPU fingerprint sidecar: the build uses -march=native,
    so a .so produced on another machine can contain instructions this
    host SIGILLs on (same skew utils/cache.py guards the XLA cache
    against)."""
    from ecgmm_tpu.utils.cache import _host_fingerprint

    fp_path = _LIB + ".host"
    fp = _host_fingerprint()
    if (
        os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        and os.path.exists(fp_path)
        and open(fp_path).read() == fp
    ):
        return None
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _LIB,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=240
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"native build failed to launch: {e}"
    if proc.returncode != 0:
        return f"native build failed: {proc.stderr[-2000:]}"
    with open(fp_path, "w") as f:
        f.write(fp)
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None when unavailable (error cached)."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        _build_error = _build()
        if _build_error is not None:
            return None
        lib = ctypes.CDLL(_LIB)
        c_d = ctypes.POINTER(ctypes.c_double)
        lib.ecgmm_remove_baseline.argtypes = [
            c_d, c_d, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.ecgmm_filtfilt.argtypes = [
            c_d, c_d, c_d, ctypes.c_int, c_d, c_d,
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.ecgmm_preprocess_hospital.argtypes = [
            c_d, c_d, c_d, ctypes.c_int, ctypes.c_int, c_d, c_d,
            ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _as2d(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float64)
    return x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x.reshape(1, -1)


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def remove_baseline(x: np.ndarray, window: int = 200) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")
    shape = np.shape(x)
    x2 = _as2d(x)
    out = np.empty_like(x2)
    lib.ecgmm_remove_baseline(
        _ptr(x2), _ptr(out), x2.shape[0], x2.shape[1], window
    )
    return out.reshape(shape)


def _check_filtfilt_len(n_samples: int, n_coef: int) -> None:
    """scipy (and the C++ odd extension) require T > padlen = 3*n_coef;
    shorter rows would read out of bounds in filtfilt_one."""
    padlen = 3 * n_coef
    if n_samples <= padlen:
        raise ValueError(
            f"filtfilt needs x.shape[-1] > padlen ({padlen}); got "
            f"{n_samples}"
        )


def filtfilt(filt, x: np.ndarray) -> np.ndarray:
    """filt: ecgmm_tpu.data.preprocess.IIRFilter."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")
    shape = np.shape(x)
    x2 = _as2d(x)
    _check_filtfilt_len(x2.shape[1], len(filt.b))
    out = np.empty_like(x2)
    b = np.ascontiguousarray(filt.b, np.float64)
    a = np.ascontiguousarray(filt.a, np.float64)
    zi = np.ascontiguousarray(filt.zi, np.float64)
    lib.ecgmm_filtfilt(
        _ptr(b), _ptr(a), _ptr(zi), len(b), _ptr(x2), _ptr(out),
        x2.shape[0], x2.shape[1],
    )
    return out.reshape(shape)


def preprocess_hospital(x: np.ndarray, window: int = 200) -> np.ndarray:
    """Fused baseline removal + hospital low-pass filtfilt (the
    dataset.py:91-95 pipeline), threaded across signals."""
    from ecgmm_tpu.data.preprocess import butter_lowpass

    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")
    filt = butter_lowpass()
    shape = np.shape(x)
    x2 = _as2d(x)
    _check_filtfilt_len(x2.shape[1], len(filt.b))
    out = np.empty_like(x2)
    b = np.ascontiguousarray(filt.b, np.float64)
    a = np.ascontiguousarray(filt.a, np.float64)
    zi = np.ascontiguousarray(filt.zi, np.float64)
    lib.ecgmm_preprocess_hospital(
        _ptr(b), _ptr(a), _ptr(zi), len(b), window, _ptr(x2), _ptr(out),
        x2.shape[0], x2.shape[1],
    )
    return out.reshape(shape)
