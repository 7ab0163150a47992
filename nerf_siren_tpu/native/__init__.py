"""JIT-compiled native host library (the analogue of the reference's
torch_utils/custom_ops.py:61-157 plugin loader, minus CUDA: TPU compute lives
in XLA/Pallas; this covers host-side data-path hot loops).

Build: g++ -O3 -shared, cached by source hash under ~/.cache/nerf_siren_tpu.
Binding: ctypes. Falls back to the numpy implementations in datasets.ray_utils
when no compiler is available — call `available()` to check.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "raygen.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> str:
    d = os.environ.get("NERF_SIREN_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "nerf_siren_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"raygen_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             _SRC, "-o", so_path + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(so_path + ".tmp", so_path)
        return so_path
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.ray_directions.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p]
    lib.world_rays.argtypes = [f32p, f32p, i64, f32p, f32p]
    lib.ndc_rays.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_float,
                             ctypes.c_float, i64, f32p, f32p]
    lib.blend_rgba_white.argtypes = [u8p, i64, f32p]
    lib.pack_rays.argtypes = [f32p, f32p, ctypes.c_float, ctypes.c_float, i64, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def ray_directions(H: int, W: int, focal: float) -> np.ndarray:
    lib = _load()
    out = np.empty((H, W, 3), np.float32)
    lib.ray_directions(H, W, float(focal), out)
    return out


def world_rays(dirs: np.ndarray, c2w: np.ndarray):
    lib = _load()
    dirs = np.ascontiguousarray(dirs.reshape(-1, 3), np.float32)
    c2w = np.ascontiguousarray(c2w, np.float32)
    n = dirs.shape[0]
    rays_o = np.empty((n, 3), np.float32)
    rays_d = np.empty((n, 3), np.float32)
    lib.world_rays(dirs, c2w, n, rays_o, rays_d)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float,
             rays_o: np.ndarray, rays_d: np.ndarray):
    lib = _load()
    rays_o = np.ascontiguousarray(rays_o, np.float32).copy()
    rays_d = np.ascontiguousarray(rays_d, np.float32).copy()
    lib.ndc_rays(H, W, float(focal), float(near), rays_o.shape[0], rays_o, rays_d)
    return rays_o, rays_d


def blend_rgba_white(rgba: np.ndarray) -> np.ndarray:
    lib = _load()
    rgba = np.ascontiguousarray(rgba.reshape(-1, 4), np.uint8)
    out = np.empty((rgba.shape[0], 3), np.float32)
    lib.blend_rgba_white(rgba, rgba.shape[0], out)
    return out


def pack_rays(rays_o: np.ndarray, rays_d: np.ndarray,
              near: float, far: float) -> np.ndarray:
    lib = _load()
    rays_o = np.ascontiguousarray(rays_o, np.float32)
    rays_d = np.ascontiguousarray(rays_d, np.float32)
    out = np.empty((rays_o.shape[0], 8), np.float32)
    lib.pack_rays(rays_o, rays_d, float(near), float(far), rays_o.shape[0], out)
    return out
