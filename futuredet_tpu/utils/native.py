"""ctypes bindings for the native host library (csrc/futuredet_host.cpp).

Auto-builds with g++ on first use (no pybind11 in this environment); every
entry point has a numpy fallback so the framework runs without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    so = os.path.abspath(os.path.join(_CSRC, "build", "libfuturedet_host.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    # a stale prebuilt .so (older csrc) may miss newer entry points — rebuild
    # once, and fall back to pure numpy rather than crash if still missing
    required = ("fd_load_sweeps", "fd_voxelize", "fd_shuffle",
                "fd_accumulate2")
    if not all(hasattr(lib, s) for s in required):
        try:
            subprocess.run(["make", "-B", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except Exception:
            return None
        if not all(hasattr(lib, s) for s in required):
            return None
    lib.fd_load_sweeps.restype = ctypes.c_int64
    lib.fd_voxelize.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _lib() is not None


def load_sweeps_native(paths: Sequence[str], transforms, time_lags,
                       max_points: int, file_feats: int = 5,
                       keep_feats: int = 5, close_radius: float = 1.0
                       ) -> Optional[np.ndarray]:
    """Threaded sweep aggregation. transforms: list of (4,4) or None.
    Returns (N, keep_feats+1) or None if the native lib is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    has_tm = np.array([t is not None for t in transforms], np.uint8)
    tms = np.zeros((n, 16), np.float64)
    for i, t in enumerate(transforms):
        if t is not None:
            tms[i] = np.asarray(t, np.float64).reshape(16)
    lags = np.asarray(time_lags, np.float64)
    # rows past the returned count are never read — skip the (large) memset
    out = np.empty((max_points, keep_feats + 1), np.float32)
    total = lib.fd_load_sweeps(
        c_paths, has_tm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lags.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n), ctypes.c_double(close_radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(max_points), ctypes.c_int(file_feats),
        ctypes.c_int(keep_feats))
    if total < 0:
        return None
    return out[:total]


def voxelize_native(points: np.ndarray, voxel_size, coors_range,
                    max_points: int, max_voxels: int):
    """Native hard voxelizer (exact numba-kernel semantics). Returns
    (voxels, coors, num_points) or None."""
    lib = _lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    n, f = points.shape
    vs = np.asarray(voxel_size, np.float64)
    cr = np.asarray(coors_range, np.float64)
    grid = np.round((cr[3:] - cr[:3]) / vs).astype(np.int64)
    voxels = np.zeros((max_voxels, max_points, f), np.float32)
    coors = np.zeros((max_voxels, 3), np.int32)
    nump = np.zeros((max_voxels,), np.int32)
    scratch = np.full(int(np.prod(grid)), -1, np.int32)
    num = lib.fd_voxelize(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int(f),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(max_points), ctypes.c_int64(max_voxels),
        voxels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        coors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nump.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return voxels[:num], coors[:num], nump[:num]


def accumulate_native(unit_offsets, mem_sample, mem_centers, mem_size,
                      mem_yaw, mem_vel, mem_attr, gt_offsets, gt_centers,
                      gt_size, gt_yaw, gt_vel, gt_attr, *, dist_th: float,
                      final_match_th: Optional[float], match_timestep: int,
                      association_oracle: bool, mr_thresh: float):
    """Greedy matcher for the joint-metrics engine (fd_accumulate2).
    Returns (tp (U,) uint8, errs (U, 8) float32) or None if unavailable.
    Error columns: trans, scale, orient, vel, attr, ade, fde, miss; the attr
    column is NaN for TPs whose GT has no attribute (id -1)."""
    lib = _lib()
    if lib is None:
        return None
    U = len(unit_offsets) - 1
    G, T = gt_centers.shape[0], gt_centers.shape[1]
    tp = np.zeros((U,), np.uint8)
    errs = np.zeros((U, 8), np.float32)
    taken = np.zeros((max(G, 1),), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fd_accumulate2(
        unit_offsets.ctypes.data_as(i32p), ctypes.c_int64(U),
        mem_sample.ctypes.data_as(i32p),
        mem_centers.ctypes.data_as(f32p),
        mem_size.ctypes.data_as(f32p),
        mem_yaw.ctypes.data_as(f32p),
        mem_vel.ctypes.data_as(f32p),
        mem_attr.ctypes.data_as(i32p),
        gt_offsets.ctypes.data_as(i32p),
        gt_centers.ctypes.data_as(f32p),
        gt_size.ctypes.data_as(f32p),
        gt_yaw.ctypes.data_as(f32p),
        gt_vel.ctypes.data_as(f32p),
        gt_attr.ctypes.data_as(i32p),
        ctypes.c_int(T), ctypes.c_float(dist_th),
        ctypes.c_float(-1.0 if final_match_th is None else final_match_th),
        ctypes.c_int(match_timestep),
        ctypes.c_uint8(1 if association_oracle else 0),
        ctypes.c_float(mr_thresh),
        tp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        errs.ctypes.data_as(f32p),
        taken.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return tp, errs


def shuffle_native(points: np.ndarray, seed: int = 0) -> bool:
    lib = _lib()
    if lib is None:
        return False
    points = np.ascontiguousarray(points)
    lib.fd_shuffle(points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   ctypes.c_int64(points.shape[0]),
                   ctypes.c_int(points.shape[1]), ctypes.c_uint64(seed))
    return True
