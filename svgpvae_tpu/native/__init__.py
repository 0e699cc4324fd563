"""Native (C++) data-plane bindings.

Compiles svgpvae_tpu/native/dataio.cpp on first use with g++ (-O3 -fopenmp)
into a cached shared library and binds it with ctypes.  All entry points
have pure-numpy fallbacks in svgpvae_tpu.data, selected automatically when
the toolchain or the build is unavailable — `available()` reports which
tier is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("dataio.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> Path:
    d = Path(os.environ.get("SVGPVAE_NATIVE_CACHE",
                            Path.home() / ".cache" / "svgpvae_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so_path = _build_dir() / f"dataio_{tag}.so"
        if not so_path.exists():
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-fopenmp", str(_SRC), "-o", str(so_path)]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(str(so_path))

        lib.svt_rasterize_balls.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.svt_rasterize_balls.restype = None

        lib.svt_rotate_images_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.svt_rotate_images_bilinear.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def rasterize_balls(paths_px: np.ndarray, px: int, py: int,
                    r: float) -> Optional[np.ndarray]:
    """(batch, tmax, 2) pixel coords -> (batch, tmax, py, px) f32 frames;
    None when the native tier is unavailable."""
    lib = _load()
    if lib is None:
        return None
    paths = np.ascontiguousarray(paths_px, dtype=np.float32)
    batch, tmax, _ = paths.shape
    out = np.empty((batch, tmax, py, px), dtype=np.float32)
    lib.svt_rasterize_balls(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        batch, tmax, px, py, ctypes.c_float(r),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def rotate_images(images: np.ndarray,
                  angles_deg: np.ndarray) -> Optional[np.ndarray]:
    """(n, h, w) images x (a,) angles -> (n, a, h, w) bilinear rotations;
    None when the native tier is unavailable."""
    lib = _load()
    if lib is None:
        return None
    imgs = np.ascontiguousarray(images, dtype=np.float64)
    angs = np.ascontiguousarray(angles_deg, dtype=np.float64)
    n, h, w = imgs.shape
    out = np.empty((n, len(angs), h, w), dtype=np.float64)
    lib.svt_rotate_images_bilinear(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, h, w, angs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(angs), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
