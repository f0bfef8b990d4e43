"""ctypes bindings for the native CPU engine (native/bcd_cpu.cpp).

Serves two roles: the framework's CPU runtime fallback, and the
self-generated performance baseline for bench.py (the upstream reference
binary cannot be built in this environment). Built on demand with g++ if
the shared library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from bcd_tpu.params import DenoiserParameters

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbcd_cpu.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "bcd_cpu.cpp")

_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    ):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             "-std=c++17", _SRC_PATH, "-o", _LIB_PATH],
            check=True,
        )
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build_native()
        _lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        _lib.bcd_denoise_monoscale.argtypes = [
            f32p, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            f32p, ctypes.c_int,
        ]
        _lib.bcd_denoise_monoscale.restype = ctypes.c_int
    return _lib


def _f32(arr) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype=np.float32)


def denoise_monoscale_cpu(color, nb, histo, cov, params: DenoiserParameters,
                          n_threads: int = 0) -> np.ndarray:
    lib = _load()
    color = _f32(color)
    nb = _f32(nb)
    histo = _f32(histo)
    cov = _f32(cov)
    h, w = color.shape[:2]
    out = np.empty((h, w, 3), dtype=np.float32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    rc = lib.bcd_denoise_monoscale(
        ptr(color), ptr(nb), ptr(histo), ptr(cov),
        h, w, histo.shape[-1],
        ctypes.c_float(params.histogram_distance_threshold),
        params.patch_radius, params.search_window_radius,
        ctypes.c_float(params.min_eigen_value),
        ptr(out), n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"bcd_denoise_monoscale failed with code {rc}")
    return out


def denoise_multiscale_cpu(color, nb, histo, cov, params: DenoiserParameters,
                           nb_of_scales: int = 3,
                           n_threads: int = 0) -> np.ndarray:
    """Multiscale on the native engine; pyramid ops in numpy (negligible
    cost next to the per-scale denoise)."""
    from bcd_tpu.native_pyramid import (
        downscale_average, downscale_sum, downscale_cov_sum, merge_outputs,
    )

    inputs = [(_f32(color), _f32(nb), _f32(histo), _f32(cov))]
    for _ in range(nb_of_scales - 1):
        c, n, h, sc = inputs[-1]
        inputs.append(
            (downscale_average(c), downscale_sum(n), downscale_sum(h),
             downscale_cov_sum(sc, n))
        )
    merged = None
    for scale in range(nb_of_scales - 1, -1, -1):
        c, n, h, sc = inputs[scale]
        out = denoise_monoscale_cpu(c, n, h, sc, params, n_threads)
        merged = out if merged is None else merge_outputs(out, merged)
    return merged
