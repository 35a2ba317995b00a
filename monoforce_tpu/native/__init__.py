"""ctypes bindings for the native host-ops library.

Compiles ``hostops.cpp`` with g++ on first use (cached next to the source;
falls back to a user cache dir if the package is read-only) and exposes
numpy-in/numpy-out wrappers.  Every op has a pure-numpy fallback elsewhere in
the package; ``available()`` reports whether the native path loaded.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["available", "estimate_heightmap", "voxel_downsample", "filter_grid"]

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "hostops.cpp")


def _build(src: str) -> str | None:
    with open(src, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    candidates = [os.path.dirname(src),
                  os.path.join(tempfile.gettempdir(), "monoforce_tpu_native")]
    for d in candidates:
        try:
            os.makedirs(d, exist_ok=True)
            out = os.path.join(d, f"libhostops_{tag}.so")
            if os.path.exists(out):
                return out
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", out]
            subprocess.run(cmd, check=True, capture_output=True)
            return out
        except Exception:
            continue
    return None


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build(_source_path())
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.estimate_heightmap_f32.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p, f32p,
            ctypes.c_int64]
        lib.voxel_downsample_f32.argtypes = [f32p, ctypes.c_int64,
                                             ctypes.c_float, f32p]
        lib.voxel_downsample_f32.restype = ctypes.c_int64
        lib.filter_grid_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                        i64p]
        lib.filter_grid_f32.restype = ctypes.c_int64
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def estimate_heightmap(points: np.ndarray, grid_res: float, d_max: float,
                       h_max: float, r_min: float | None = None,
                       h_min: float | None = None) -> np.ndarray | None:
    """Native max-z rasterization; returns (2, n, n) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = int(len(np.arange(-d_max, d_max, grid_res)))
    out_h = np.empty(n * n, np.float32)
    out_m = np.empty(n * n, np.float32)
    lib.estimate_heightmap_f32(
        _fptr(pts), len(pts), ctypes.c_float(grid_res),
        ctypes.c_float(d_max), ctypes.c_float(h_max),
        ctypes.c_float(-1.0 if r_min is None else r_min),
        ctypes.c_float(-h_max if h_min is None else h_min),
        _fptr(out_h), _fptr(out_m), n)
    return np.stack([out_h.reshape(n, n), out_m.reshape(n, n)], axis=0)


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample_f32(_fptr(pts), len(pts),
                                 ctypes.c_float(voxel_size), _fptr(out))
    return out[:m].copy()


def filter_grid(points: np.ndarray, grid_res: float) -> np.ndarray | None:
    """Indices of one (first) point per cell, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], dtype=np.float32)
    idx = np.empty(len(pts), np.int64)
    m = lib.filter_grid_f32(_fptr(pts), len(pts), ctypes.c_float(grid_res),
                            idx.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int64)))
    return idx[:m].copy()
