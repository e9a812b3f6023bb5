"""ctypes bindings for the native host library (``native/``).

Graceful degradation: if the shared library hasn't been built (or the
toolchain is absent), every entry point reports unavailable and callers
fall back to the numpy implementations. Build with ``make -C native`` or
:func:`build` here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "available",
    "build",
    "voxel_downsample",
    "radius_neighbors",
    "knn",
    "fps",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libbufferx_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bx_voxel_downsample.restype = ctypes.c_int64
    lib.bx_voxel_downsample.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, f32p, ctypes.c_int64,
    ]
    lib.bx_radius_neighbors.restype = ctypes.c_int32
    lib.bx_radius_neighbors.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int32, i32p,
    ]
    lib.bx_knn.restype = ctypes.c_int32
    lib.bx_knn.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_float, i32p, f32p,
    ]
    lib.bx_fps.restype = ctypes.c_int32
    lib.bx_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Compile the shared library in-tree. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return available()


def _c3(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, np.float32)[:, :3])


def voxel_downsample(pts, voxel: float, capacity: int | None = None):
    """Barycenter voxel downsample -> [M, 3] float32."""
    lib = _load()
    pts = _c3(pts)
    if lib is None:
        from bufferx_tpu.kernels.voxel import voxel_downsample_np

        return voxel_downsample_np(pts, voxel)
    cap = capacity or len(pts)
    out = np.empty((cap, 3), np.float32)
    m = lib.bx_voxel_downsample(pts, len(pts), float(voxel), out, cap)
    return out[:m].copy()


def radius_neighbors(queries, pts, radius: float, max_count: int):
    """[Nq, max_count] int32 neighbor indices, -1 padded."""
    lib = _load()
    queries = _c3(queries)
    pts = _c3(pts)
    if lib is None:
        d2 = (
            (queries[:, None, :] - pts[None, :, :]) ** 2
        ).sum(-1)
        out = np.full((len(queries), max_count), -1, np.int32)
        for q in range(len(queries)):
            hits = np.where(d2[q] <= radius * radius)[0][:max_count]
            out[q, : len(hits)] = hits
        return out
    out = np.empty((len(queries), max_count), np.int32)
    lib.bx_radius_neighbors(
        queries, len(queries), pts, len(pts), float(radius),
        int(max_count), out,
    )
    return out


def knn(queries, pts, k: int, cell_size: float | None = None):
    """k nearest neighbors -> (idx [Nq, k] int32, d2 [Nq, k] f32)."""
    lib = _load()
    queries = _c3(queries)
    pts = _c3(pts)
    if lib is None:
        d2 = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :k].astype(np.int32)
        return idx, np.take_along_axis(d2, idx, 1).astype(np.float32)
    if cell_size is None:
        span = pts.max(0) - pts.min(0)
        cell_size = float(max(span.max(), 1e-3)) / max(
            (len(pts) ** (1.0 / 3.0)), 1.0
        )
    idx = np.empty((len(queries), k), np.int32)
    d2 = np.empty((len(queries), k), np.float32)
    lib.bx_knn(queries, len(queries), pts, len(pts), int(k),
               float(cell_size), idx, d2)
    return idx, d2


def fps(pts, k: int) -> np.ndarray:
    """Host farthest point sampling -> [k] int32 indices."""
    lib = _load()
    pts = _c3(pts)
    if lib is None:
        n = len(pts)
        sel = [0]
        mind = ((pts - pts[0]) ** 2).sum(-1)
        for _ in range(k - 1):
            s = int(np.argmax(mind))
            sel.append(s)
            mind = np.minimum(mind, ((pts - pts[s]) ** 2).sum(-1))
        return np.asarray(sel, np.int32)
    out = np.empty(k, np.int32)
    lib.bx_fps(pts, len(pts), int(k), out)
    return out
