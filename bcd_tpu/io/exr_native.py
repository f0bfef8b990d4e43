"""ctypes bindings for the system-OpenEXR bridge (native/exr_bridge.cpp).

The pure-numpy codec (bcd_tpu/io/exr.py) decodes NONE/RLE/ZIPS/ZIP/PXR24
itself; files using the remaining OpenEXR compressions (PIZ — the default
of many renderers — B44/B44A, DWAA/DWAB) are routed here. The bridge links
the BSD-3 system libOpenEXR (the reference instead vendors IlmImf behind
an AGPL wrapper, src/io/exr/io_exr.cpp, which must not be reused). Built
on demand with g++; ``available()`` reports whether that worked.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libexr_bridge.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "exr_bridge.cpp")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None

# Imf::Compression enum values (write-side selector)
IMF_NONE, IMF_RLE, IMF_ZIPS, IMF_ZIP, IMF_PIZ, IMF_PXR24, IMF_B44, \
    IMF_B44A, IMF_DWAA, IMF_DWAB = range(10)


def _toolchain_flags() -> list:
    """Compile/link flags for the system libOpenEXR. pkg-config is the
    authoritative source (it tracks the installed version's library
    suffixes, e.g. -lOpenEXR-3_2 on OpenEXR 3.2 hosts); the hardcoded 3_1
    names are only the fallback for hosts without .pc files."""
    try:
        out = subprocess.run(
            ["pkg-config", "--cflags", "--libs", "OpenEXR"],
            check=True, capture_output=True, text=True,
        ).stdout.split()
        if out:
            return out
    except Exception:
        pass
    return ["-I/usr/include/OpenEXR", "-I/usr/include/Imath",
            "-lOpenEXR-3_1", "-lIex-3_1", "-lIlmThread-3_1", "-lImath-3_1"]


def build_bridge(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    ):
        proc = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
             "-o", _LIB_PATH] + _toolchain_flags(),
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"exr_bridge build failed: {proc.stderr.strip()[-500:]}")
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build_bridge()
        lib = ctypes.CDLL(_LIB_PATH)
        c = ctypes
        lib.exr_bridge_last_error.restype = c.c_char_p
        lib.exr_bridge_info.argtypes = [
            c.c_char_p, c.POINTER(c.c_int), c.POINTER(c.c_int),
            c.POINTER(c.c_int), c.POINTER(c.c_int), c.c_char_p, c.c_int]
        lib.exr_bridge_info.restype = c.c_int
        lib.exr_bridge_read.argtypes = [
            c.c_char_p, c.POINTER(c.c_float), c.c_int, c.c_int, c.c_int]
        lib.exr_bridge_read.restype = c.c_int
        lib.exr_bridge_write.argtypes = [
            c.c_char_p, c.POINTER(c.c_float), c.c_char_p,
            c.POINTER(c.c_int), c.c_int, c.c_int, c.c_int, c.c_int]
        lib.exr_bridge_write.restype = c.c_int
        _lib = lib
    return _lib


def available() -> bool:
    """True when the bridge can be built/loaded on this host."""
    global _build_error
    if _build_error is not None:
        return False
    try:
        _load()
        return True
    except Exception as e:  # missing compiler or OpenEXR dev files
        _build_error = str(e)
        return False


def build_error() -> Optional[str]:
    """Why the bridge is unavailable (None when it works or was never
    probed); surfaced in exr.py's ExrError so codec failures are
    diagnosable instead of a bare 'bridge unavailable'."""
    return _build_error


def _check(lib, rc: int) -> None:
    if rc != 0:
        raise RuntimeError(
            f"OpenEXR bridge error: {lib.exr_bridge_last_error().decode()}")


def read_exr(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read any single-part scanline EXR via libOpenEXR. Same return
    contract as :func:`bcd_tpu.io.exr.read_exr` (channels as float32)."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    nch = ctypes.c_int()
    comp = ctypes.c_int()
    names_buf = ctypes.create_string_buffer(1 << 20)
    _check(lib, lib.exr_bridge_info(
        path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(nch),
        ctypes.byref(comp), names_buf, len(names_buf)))
    names = names_buf.value.decode().split("\n") if nch.value else []
    out = np.empty((nch.value, h.value, w.value), np.float32)
    _check(lib, lib.exr_bridge_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nch.value, h.value, w.value))
    from bcd_tpu.io.exr import Channel

    channels = {name: out[i] for i, name in enumerate(names)}
    info = {"width": w.value, "height": h.value,
            "compression": comp.value,
            "channels": [Channel(n) for n in names],  # delivered as float32
            "attributes": {}}
    return channels, info


def write_exr(path: str, channels: Dict[str, np.ndarray],
              pixel_types: Optional[Dict[str, int]] = None,
              compression: int = IMF_PIZ) -> None:
    """Write a single-part scanline EXR via libOpenEXR with any supported
    compression. ``pixel_types`` uses the exr.py convention (1 = HALF,
    2 = FLOAT, default FLOAT)."""
    lib = _load()
    names = sorted(channels)
    shapes = {channels[n].shape for n in names}
    if len(shapes) != 1:
        raise ValueError(f"channel shape mismatch: {shapes}")
    (height, width) = shapes.pop()
    pixel_types = pixel_types or {}
    data = np.ascontiguousarray(
        np.stack([channels[n] for n in names]), dtype=np.float32)
    types = np.asarray([pixel_types.get(n, 2) for n in names],
                       dtype=np.int32)
    _check(lib, lib.exr_bridge_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        "\n".join(names).encode(),
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(names), height, width, compression))
