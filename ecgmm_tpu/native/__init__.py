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
# Two independent libraries: the core engine (preprocessing + digitizer,
# no external deps beyond libc) and the heatmap kernels (need zlib for
# the PNG writer). A host without zlib dev files loses ONLY the native
# heatmap path — the previously working preprocess/digitize kernels keep
# building and loading.
_CORE_SRCS = [
    os.path.join(_HERE, "preprocess.cpp"),
    os.path.join(_HERE, "digitize.cpp"),
]
_HEATMAP_SRCS = [os.path.join(_HERE, "heatmap.cpp")]
_CORE_LIB = os.path.join(_HERE, "_libecgmm_native.so")
_HEATMAP_LIB = os.path.join(_HERE, "_libecgmm_heatmap.so")

_lock = threading.Lock()
_libs: "dict[str, Optional[ctypes.CDLL]]" = {}
_build_errors: "dict[str, str]" = {}


def _build(srcs, lib_path, extra_flags=()) -> Optional[str]:
    """Compile a shared library if stale. Returns an error message or
    None. Freshness requires BOTH a newer-than-source mtime AND a
    matching host-CPU fingerprint sidecar: the build uses -march=native,
    so a .so produced on another machine can contain instructions this
    host SIGILLs on (same skew utils/cache.py guards the XLA cache
    against)."""
    from ecgmm_tpu.utils.cache import _host_fingerprint

    fp_path = lib_path + ".host"
    fp = _host_fingerprint()
    if (
        os.path.exists(lib_path)
        and os.path.getmtime(lib_path)
        >= max(os.path.getmtime(s) for s in srcs)
        and os.path.exists(fp_path)
        and open(fp_path).read() == fp
    ):
        return None
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", *srcs, "-o", lib_path, *extra_flags,
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


def _load(key: str) -> Optional[ctypes.CDLL]:
    """Build+load one of the two libraries, caching result or error."""
    with _lock:
        if key in _libs:
            return _libs[key]
        if key in _build_errors:
            return None
        if key == "core":
            err = _build(_CORE_SRCS, _CORE_LIB)
        else:
            err = _build(_HEATMAP_SRCS, _HEATMAP_LIB, ("-lz",))
        if err is not None:
            _build_errors[key] = err
            return None
        lib = ctypes.CDLL(_CORE_LIB if key == "core" else _HEATMAP_LIB)
        c_d = ctypes.POINTER(ctypes.c_double)
        c_f = ctypes.POINTER(ctypes.c_float)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        if key == "core":
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
            lib.ecgmm_digitize_darkness.argtypes = [
                c_u8, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, c_f, c_f, c_f,
            ]
            lib.ecgmm_trace_sums.argtypes = [
                c_f, ctypes.c_int64, ctypes.c_int64, c_f, c_d, c_d,
            ]
            lib.ecgmm_colmax.argtypes = [
                c_f, ctypes.c_int64, ctypes.c_int64, c_f,
            ]
            lib.ecgmm_gridness.argtypes = [
                c_u8, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, c_f, c_u8,
            ]
        else:
            lib.ecgmm_cam_overlay.argtypes = [
                c_u8, ctypes.c_int64, ctypes.c_int64, c_f,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
                ctypes.c_float, c_u8, c_u8,
            ]
            lib.ecgmm_png_encode_sub.argtypes = [
                c_u8, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                c_u8, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.ecgmm_png_encode_sub.restype = ctypes.c_int
        _libs[key] = lib
        return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded CORE library, or None when unavailable (error cached)."""
    return _load("core")


def get_heatmap_lib() -> Optional[ctypes.CDLL]:
    """The loaded HEATMAP library (needs zlib), or None."""
    return _load("heatmap")


def available() -> bool:
    return get_lib() is not None


def heatmap_available() -> bool:
    return get_heatmap_lib() is not None


def maybe(disable_env: str, need: str = "core"):
    """The shared gated accessor for callers with a numpy/PIL fallback:
    this module when the `need`ed library ('core' or 'heatmap') builds
    and the disable env var is unset, else None. One definition so the
    dispatch helpers in serve/digitize.py and serve/api.py cannot
    drift."""
    if os.environ.get(disable_env):
        return None
    ok = heatmap_available() if need == "heatmap" else available()
    if not ok:
        return None
    import sys

    return sys.modules[__name__]


def _as2d(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float64)
    return x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x.reshape(1, -1)


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def remove_baseline(x: np.ndarray, window: int = 200) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
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
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
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


def _fptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def darkness_map(
    image: np.ndarray, bg_window: int = 25
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Fused serve/digitize.py darkness_map + per-column and per-row
    maxima for a uint8 photo: returns (rel [h, w] float32, col_max [w]
    float32, row_max [h] float32). The rel map is bit-exact against the
    numpy implementation (same float32 expressions; maxima are
    order-free). Raises when the native engine is unavailable or the
    image dtype/shape is unsupported — callers fall back to numpy."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
    raw = np.asarray(image)
    if raw.dtype != np.uint8 or raw.ndim not in (2, 3):
        raise TypeError(f"expected uint8 2-D/3-D image, got {raw.dtype}")
    if raw.ndim == 3:
        # numpy path reduces over the first 3 channels only (RGB[A])
        raw = raw[..., :3]
        c = raw.shape[-1]
        if c == 2:
            raise TypeError("2-channel images unsupported")
    else:
        c = 1
    raw = np.ascontiguousarray(raw)
    h, w = raw.shape[0], raw.shape[1]
    rel = np.empty((h, w), np.float32)
    col_max = np.empty((w,), np.float32)
    row_max = np.empty((h,), np.float32)
    lib.ecgmm_digitize_darkness(
        _u8ptr(raw), h, w, c, bg_window, _fptr(rel), _fptr(col_max),
        _fptr(row_max)
    )
    return rel, col_max, row_max


def colmax(rel: np.ndarray) -> np.ndarray:
    """Per-column maxima of a darkness map, (w,) float32 (digitize.cpp
    ecgmm_colmax; GIL released, threaded)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
    rel = np.ascontiguousarray(rel, np.float32)
    h, w = rel.shape
    out = np.empty((w,), np.float32)
    lib.ecgmm_colmax(_fptr(rel), h, w, _fptr(out))
    return out


def trace_centroid(
    rel: np.ndarray,
    col_frac: float,
    floor: float,
    col_max: Optional[np.ndarray] = None,
) -> "tuple[np.ndarray, np.ndarray]":
    """serve/digitize.py extract_trace core over a precomputed darkness
    map: returns (centroid [w] float32, valid [w] bool). The per-column
    ink threshold and the valid mask are computed HERE with numpy (same
    float32 promotion as the pure-numpy path, so the inclusion set and
    mask are bit-identical); only the h×w weighted-sum sweep runs in
    C++ (float64 accumulation vs numpy's pairwise float32 — centroids
    agree to ~1e-4 px)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
    rel = np.ascontiguousarray(rel, np.float32)
    h, w = rel.shape
    if col_max is None:
        col_max = np.empty((w,), np.float32)
        lib.ecgmm_colmax(_fptr(rel), h, w, _fptr(col_max))
    else:
        col_max = np.ascontiguousarray(col_max, np.float32)
    # numpy-semantics threshold (float32 weak promotion), as in
    # serve/digitize.py extract_trace
    thr = np.ascontiguousarray(
        np.maximum(floor, col_frac * col_max), np.float32
    )
    wsum = np.empty((w,), np.float64)
    wrow = np.empty((w,), np.float64)
    lib.ecgmm_trace_sums(
        _fptr(rel), h, w, _fptr(thr), _ptr(wsum), _ptr(wrow)
    )
    valid = (col_max >= floor) & (wsum > 0)
    centroid = np.where(
        valid, wrow / np.maximum(wsum, 1e-6), 0.0
    ).astype(np.float32)
    return centroid, valid


def gridness(
    image: np.ndarray, pool: int = 1, bg_window: int = 32
) -> "tuple[np.ndarray, np.ndarray]":
    """Fused serve/digitize.py gridness computation for a uint8 RGB[A]
    photo: returns (gridness float32 [h//pool, w//pool], pooled
    brightness uint8 of the same shape). Bit-exact against the numpy
    `_gridness_core` path (same float32 expressions; max/min pooling is
    order-free). `pool` is 1 (full resolution, = `gridness_map`) or 2
    (the `_grid_analysis` location-grade path)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
    raw = np.asarray(image)
    if raw.dtype != np.uint8 or raw.ndim != 3 or raw.shape[-1] < 3:
        raise TypeError(
            f"expected uint8 RGB image, got {raw.dtype} ndim={raw.ndim}"
        )
    raw = np.ascontiguousarray(raw[..., :4])
    h, w, c = raw.shape
    hp, wp = h // pool, w // pool
    g = np.empty((hp, wp), np.float32)
    bright = np.empty((hp, wp), np.uint8)
    lib.ecgmm_gridness(
        _u8ptr(raw), h, w, c, pool, bg_window, _fptr(g), _u8ptr(bright)
    )
    return g, bright


def preprocess_hospital(x: np.ndarray, window: int = 200) -> np.ndarray:
    """Fused baseline removal + hospital low-pass filtfilt (the
    dataset.py:91-95 pipeline), threaded across signals."""
    from ecgmm_tpu.data.preprocess import butter_lowpass

    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            f"native engine unavailable: {_build_errors.get('core')}"
        )
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


def cam_overlay(
    image_u8: np.ndarray, cam: np.ndarray, lut: np.ndarray,
    alpha: float = 0.4,
) -> np.ndarray:
    """Fused CAM bilinear-upsample (PIL triangle-filter convention) +
    jet-LUT alpha blend (heatmap.cpp ecgmm_cam_overlay). Bit-identical to
    Image.fromarray(cam,"F").resize(BILINEAR) followed by
    explain.gradcam.overlay_heatmap; GIL released for the call.

    image_u8: (H, W, 3) uint8; cam: (ch, cw) float; lut: (256, 3) uint8.
    """
    lib = get_heatmap_lib()
    if lib is None:
        raise RuntimeError(
            f"native heatmap unavailable: {_build_errors.get('heatmap')}"
        )
    img = np.ascontiguousarray(image_u8, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"image must be (H, W, 3) uint8, got {img.shape}")
    cam2 = np.ascontiguousarray(cam, np.float32)
    if cam2.ndim != 2:
        raise ValueError(f"cam must be 2-D, got shape {np.shape(cam)}")
    lut2 = np.ascontiguousarray(lut, np.uint8)
    if lut2.shape != (256, 3):
        raise ValueError(f"lut must be (256, 3) uint8, got {lut2.shape}")
    h, w = img.shape[:2]
    out = np.empty_like(img)
    # match numpy's scalar handling: (1 - alpha) is computed in Python
    # double, then rounded ONCE to float32 when it meets the float32 array
    lib.ecgmm_cam_overlay(
        _u8ptr(img), h, w, _fptr(cam2), cam2.shape[0], cam2.shape[1],
        ctypes.c_float(float(alpha)), ctypes.c_float(1.0 - float(alpha)),
        _u8ptr(lut2), _u8ptr(out),
    )
    return out


def png_encode(rgb: np.ndarray, level: int = 1) -> bytes:
    """RGB8 PNG encode with per-row Sub filtering and band-parallel
    deflate (heatmap.cpp ecgmm_png_encode_sub). Any decoder sees one
    normal IDAT stream; GIL released for the call."""
    lib = get_heatmap_lib()
    if lib is None:
        raise RuntimeError(
            f"native heatmap unavailable: {_build_errors.get('heatmap')}"
        )
    img = np.ascontiguousarray(rgb, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"rgb must be (H, W, 3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    raw = h * (1 + 3 * w)
    # deflateBound-style worst case per band (stored blocks + flush
    # markers) plus fixed chunk overhead
    cap = raw + raw // 8 + 8 * 1024
    out = np.empty(cap, np.uint8)
    out_len = ctypes.c_int64(0)
    rc = lib.ecgmm_png_encode_sub(
        _u8ptr(img), h, w, int(level), _u8ptr(out), cap,
        ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError(f"native PNG encode failed (rc={rc})")
    return out[: out_len.value].tobytes()
