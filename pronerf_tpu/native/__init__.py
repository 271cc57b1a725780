"""ctypes bindings for the native host runtime (``native/pronerf_native.cpp``).

Auto-builds the shared library with the repo Makefile on first import when a
compiler is available; every entry point has a NumPy fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libpronerf_native.so"
_SRC_DIR = _HERE.parents[1] / "native"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_SRC_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.build_ray_pool.restype = ctypes.c_int
    lib.build_ray_pool.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_int,
    ]
    lib.colmap_points3d_visibility.restype = ctypes.c_int64
    lib.colmap_points3d_visibility.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.greedy_cover.restype = ctypes.c_int
    lib.greedy_cover.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_ray_pool_native(images, poses, K, seed: int, shuffle: bool = True):
    """[T,H,W,3] images + [T,3,4] poses -> ([T*H*W,3,3] pool, [T*H*W] ids).

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, np.float32)
    poses = np.ascontiguousarray(poses, np.float32)
    K = np.ascontiguousarray(K, np.float32)
    T, H, W, _ = images.shape
    rays = np.empty((T * H * W, 3, 3), np.float32)
    ids = np.empty((T * H * W,), np.int32)
    rc = lib.build_ray_pool(
        _fptr(images), _fptr(poses), _fptr(K), T, H, W, _fptr(rays),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_uint64(seed), int(shuffle),
    )
    if rc != 0:
        return None
    return rays, ids


def colmap_visibility_native(points3d_bin, image_rank: np.ndarray, n_train: int):
    """points3D.bin + dense image_id->train-rank map -> [n_train, P] 0/1."""
    lib = _load()
    if lib is None:
        return None
    image_rank = np.ascontiguousarray(image_rank, np.int32)
    path = str(points3d_bin).encode()
    rank_ptr = image_rank.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_points = lib.colmap_points3d_visibility(
        path, rank_ptr, len(image_rank) - 1, n_train, None, 0
    )
    if n_points < 0:
        return None
    vis = np.zeros((n_train, n_points), np.float32)
    rc = lib.colmap_points3d_visibility(
        path, rank_ptr, len(image_rank) - 1, n_train, _fptr(vis), n_points
    )
    if rc < 0:
        return None
    return vis


def greedy_cover_native(vis: np.ndarray, n_pick: int):
    lib = _load()
    if lib is None:
        return None
    vis = np.ascontiguousarray(vis, np.float32).copy()
    n_train, n_points = vis.shape
    picks = np.empty((n_pick,), np.int32)
    lib.greedy_cover(
        _fptr(vis), n_train, n_points, n_pick,
        picks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return picks
