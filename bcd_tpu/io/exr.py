"""Minimal OpenEXR codec (pure numpy + zlib), written from the public
OpenEXR file-format specification.

Replaces the reference's vendored ``io_exr.cpp`` (which is AGPL-licensed and
must not be reused, reference src/io/exr/io_exr.cpp:1-25). Supports exactly
what the BCD pipeline needs and a little more:

- single-part scanline images, increasing line order
- channel types HALF and FLOAT (read UINT too), x/y sampling 1
- compression NONE, ZIPS (1 line/chunk), ZIP (16 lines/chunk) and RLE for
  read+write; PXR24 (16 lines/chunk, lossy-float deflate) for read.
  PIZ (what most OpenEXR-based renderers emit by default), B44/B44A and
  DWAA/DWAB route to the system-libOpenEXR bridge
  (:mod:`bcd_tpu.io.exr_native`), as do tiled/deep/multipart files
- arbitrary channel names; the BCD stat buffers use ``Bin_%04d`` FLOAT
  channels (reference io_exr.cpp writeMultiImageEXR), color images use
  R/G/B(/A) HALF channels (reference writes via RgbaOutputFile)

The container knows nothing about BCD; higher-level loaders live in
:mod:`bcd_tpu.io.image_io`.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

MAGIC = 20000630
VERSION = 2

# pixel types (OpenEXR attribute values)
UINT = 0
HALF = 1
FLOAT = 2

_PIXEL_DTYPE = {UINT: np.dtype("<u4"), HALF: np.dtype("<f2"), FLOAT: np.dtype("<f4")}
_PIXEL_SIZE = {UINT: 4, HALF: 2, FLOAT: 4}

# compression ids
NO_COMPRESSION = 0
RLE_COMPRESSION = 1
ZIPS_COMPRESSION = 2
ZIP_COMPRESSION = 3
PIZ_COMPRESSION = 4
PXR24_COMPRESSION = 5

# compressions the pure-numpy codec decodes itself; anything else (PIZ,
# B44/B44A, DWAA/DWAB) plus tiled/deep/multipart files route to the
# system-OpenEXR bridge (bcd_tpu/io/exr_native.py)
_LINES_PER_CHUNK = {
    NO_COMPRESSION: 1,
    RLE_COMPRESSION: 1,
    ZIPS_COMPRESSION: 1,
    ZIP_COMPRESSION: 16,
    PXR24_COMPRESSION: 16,
}

# version-field feature bits (OpenEXR file layout spec)
_FLAG_TILED = 0x200
_FLAG_DEEP = 0x800
_FLAG_MULTIPART = 0x1000
_BRIDGE_FLAGS = _FLAG_TILED | _FLAG_DEEP | _FLAG_MULTIPART


@dataclass
class Channel:
    name: str
    pixel_type: int = FLOAT  # HALF / FLOAT / UINT
    p_linear: int = 0
    x_sampling: int = 1
    y_sampling: int = 1


class ExrError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# ZIP predictor + byte interleave (OpenEXR "zip" scheme)
# ---------------------------------------------------------------------------

def _zip_preprocess(data: bytes) -> bytes:
    """Reorder bytes into two halves, then delta-encode."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    half = (n + 1) // 2
    reordered = np.empty(n, dtype=np.uint8)
    reordered[:half] = arr[0::2]
    reordered[half:] = arr[1::2]
    # d[i] = s[i] - s[i-1] + 128, elementwise mod 256
    out = np.empty(n, dtype=np.uint8)
    if n:
        out[0] = reordered[0]
        diff = reordered[1:].astype(np.int16) - reordered[:-1].astype(np.int16) + 128
        out[1:] = diff.astype(np.uint8)
    return out.tobytes()


def _zip_postprocess(data: bytes) -> bytes:
    """Inverse of :func:`_zip_preprocess`: prefix-sum then de-interleave."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    if n == 0:
        return b""
    # s[i] = s[i-1] + d[i] - 128  ==> cumulative sum of (d - 128) offset by s[0]
    deltas = arr.astype(np.int64).copy()
    deltas[1:] -= 128
    summed = np.cumsum(deltas)
    restored = (summed & 0xFF).astype(np.uint8)
    half = (n + 1) // 2
    out = np.empty(n, dtype=np.uint8)
    out[0::2] = restored[:half]
    out[1::2] = restored[half:]
    return out.tobytes()


def _rle_encode(data: bytes) -> bytes:
    """OpenEXR run-length scheme: [count-1, byte] for runs >= 3,
    [-(count), literal bytes] otherwise (signed-char counts, max 127).

    Run detection is vectorized (numpy diff over the buffer); the Python
    loop below walks run/literal SEGMENTS, not bytes — a per-byte loop took
    minutes on a 1080p multi-channel stat buffer."""
    n = len(data)
    if n == 0:
        return b""
    arr = np.frombuffer(data, dtype=np.uint8)
    starts = np.concatenate(
        ([0], np.flatnonzero(arr[1:] != arr[:-1]) + 1))
    lens = np.diff(np.concatenate((starts, [n])))
    is_run = lens >= 3
    out = bytearray()
    i, nseg = 0, len(starts)
    while i < nseg:
        if is_run[i]:
            left, v = int(lens[i]), data[int(starts[i])]
            while left > 0:
                c = min(left, 128)
                out.append(c - 1)
                out.append(v)
                left -= c
            i += 1
        else:  # merge consecutive short segments into one literal span
            j = i
            while j < nseg and not is_run[j]:
                j += 1
            s = int(starts[i])
            e = int(starts[j]) if j < nseg else n
            while s < e:
                c = min(e - s, 127)
                out.append(256 - c)  # -(count) as unsigned byte
                out += data[s : s + c]
                s += c
            i = j
    return bytes(out)


def _rle_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        count = data[i]
        i += 1
        if count > 127:  # signed char < 0: literal run of -count bytes
            run = 256 - count
            out += data[i : i + run]
            i += run
        else:  # run of (count + 1) copies of the next byte
            out += data[i : i + 1] * (count + 1)
            i += 1
    if len(out) != expected:
        raise ExrError(f"RLE chunk decoded to {len(out)} bytes, "
                       f"expected {expected}")
    return bytes(out)


def _pxr24_decode(data: bytes, channels: List["Channel"], width: int,
                  n_lines: int) -> bytes:
    """PXR24: zlib over per-(scanline, channel) BYTE PLANES of row-wise
    DELTA-coded pixels; FLOAT pixels are truncated to 24 bits (top 3 bytes
    of the f32 pattern), reconstructed as ``bits24 << 8``."""
    raw = zlib.decompress(data)
    plane_sizes = {UINT: 4, HALF: 2, FLOAT: 3}
    pos = 0
    rows: List[bytes] = []
    for _ in range(n_lines):
        for ch in channels:
            nb = plane_sizes[ch.pixel_type]
            planes = np.frombuffer(
                raw, np.uint8, count=nb * width, offset=pos
            ).reshape(nb, width).astype(np.uint64)
            pos += nb * width
            # reassemble big-endian diffs, then prefix-sum modulo 2^(8*nb)
            diffs = np.zeros(width, np.uint64)
            for p in range(nb):
                diffs = (diffs << np.uint64(8)) | planes[p]
            vals = np.cumsum(diffs) & np.uint64((1 << (8 * nb)) - 1)
            if ch.pixel_type == FLOAT:
                bits = (vals.astype(np.uint32) << np.uint32(8))
                rows.append(bits.view(np.float32).astype("<f4").tobytes())
            elif ch.pixel_type == HALF:
                rows.append(vals.astype("<u2").tobytes())
            else:
                rows.append(vals.astype("<u4").tobytes())
    if pos != len(raw):
        raise ExrError("PXR24 chunk size mismatch")
    return b"".join(rows)


def _compress_chunk(raw: bytes, compression: int) -> bytes:
    if compression == NO_COMPRESSION:
        return raw
    if compression in (ZIP_COMPRESSION, ZIPS_COMPRESSION):
        packed = zlib.compress(_zip_preprocess(raw), 6)
        return packed if len(packed) < len(raw) else raw
    if compression == RLE_COMPRESSION:
        packed = _rle_encode(_zip_preprocess(raw))
        return packed if len(packed) < len(raw) else raw
    raise ExrError(f"unsupported compression for write: {compression}")


def _decompress_chunk(data: bytes, raw_size: int, compression: int,
                      channels: Optional[List[Channel]] = None,
                      width: int = 0, n_lines: int = 0) -> bytes:
    if compression == NO_COMPRESSION or len(data) == raw_size:
        return data
    if compression in (ZIP_COMPRESSION, ZIPS_COMPRESSION):
        return _zip_postprocess(zlib.decompress(data))
    if compression == RLE_COMPRESSION:
        return _zip_postprocess(_rle_decode(data, raw_size))
    if compression == PXR24_COMPRESSION:
        return _pxr24_decode(data, channels, width, n_lines)
    raise ExrError(f"unsupported compression for read: {compression}")


# ---------------------------------------------------------------------------
# attribute (de)serialization
# ---------------------------------------------------------------------------

def _write_attr(out: List[bytes], name: str, type_name: str, payload: bytes) -> None:
    out.append(name.encode() + b"\0" + type_name.encode() + b"\0")
    out.append(struct.pack("<i", len(payload)))
    out.append(payload)


def _read_cstring(buf: memoryview, pos: int) -> Tuple[str, int]:
    end = pos
    while buf[end] != 0:
        end += 1
    return bytes(buf[pos:end]).decode("latin-1"), end + 1


def _serialize_chlist(channels: List[Channel]) -> bytes:
    parts = []
    for ch in channels:
        parts.append(ch.name.encode() + b"\0")
        parts.append(
            struct.pack("<iBBBBii", ch.pixel_type, ch.p_linear, 0, 0, 0,
                        ch.x_sampling, ch.y_sampling)
        )
    parts.append(b"\0")
    return b"".join(parts)


def _parse_chlist(payload: bytes) -> List[Channel]:
    channels = []
    buf = memoryview(payload)
    pos = 0
    while pos < len(payload) and buf[pos] != 0:
        name, pos = _read_cstring(buf, pos)
        pixel_type, p_linear, _, _, _, xs, ys = struct.unpack_from(
            "<iBBBBii", payload, pos
        )
        pos += 16
        channels.append(Channel(name, pixel_type, p_linear, xs, ys))
    return channels


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def write_exr(
    path: str,
    channels: Dict[str, np.ndarray],
    pixel_types: Optional[Dict[str, int]] = None,
    compression: int = ZIP_COMPRESSION,
) -> None:
    """Write a single-part scanline EXR.

    ``channels`` maps channel name -> (H, W) array. All channels must share
    one shape. ``pixel_types`` optionally overrides the stored pixel type per
    channel (default FLOAT).
    """
    if not channels:
        raise ExrError("no channels to write")
    names = sorted(channels)  # EXR stores channels alphabetically
    shapes = {channels[n].shape for n in names}
    if len(shapes) != 1:
        raise ExrError(f"channel shape mismatch: {shapes}")
    (height, width) = shapes.pop()
    pixel_types = pixel_types or {}
    chans = [Channel(n, pixel_types.get(n, FLOAT)) for n in names]

    header: List[bytes] = [struct.pack("<ii", MAGIC, VERSION)]
    _write_attr(header, "channels", "chlist", _serialize_chlist(chans))
    _write_attr(header, "compression", "compression", struct.pack("<B", compression))
    box = struct.pack("<iiii", 0, 0, width - 1, height - 1)
    _write_attr(header, "dataWindow", "box2i", box)
    _write_attr(header, "displayWindow", "box2i", box)
    _write_attr(header, "lineOrder", "lineOrder", struct.pack("<B", 0))
    _write_attr(header, "pixelAspectRatio", "float", struct.pack("<f", 1.0))
    _write_attr(header, "screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    _write_attr(header, "screenWindowWidth", "float", struct.pack("<f", 1.0))
    header.append(b"\0")  # end of header

    lines_per_chunk = _LINES_PER_CHUNK[compression]
    nb_chunks = (height + lines_per_chunk - 1) // lines_per_chunk

    planes = {
        ch.name: np.ascontiguousarray(
            channels[ch.name], dtype=_PIXEL_DTYPE[ch.pixel_type]
        )
        for ch in chans
    }

    chunks: List[bytes] = []
    for ci in range(nb_chunks):
        y0 = ci * lines_per_chunk
        y1 = min(y0 + lines_per_chunk, height)
        # raw layout: per scanline, per channel (alphabetical), a full row
        rows = []
        for y in range(y0, y1):
            for ch in chans:
                rows.append(planes[ch.name][y].tobytes())
        raw = b"".join(rows)
        packed = _compress_chunk(raw, compression)
        chunks.append(struct.pack("<ii", y0, len(packed)) + packed)

    header_bytes = b"".join(header)
    table_size = 8 * nb_chunks
    offset = len(header_bytes) + table_size
    offsets = []
    for chunk in chunks:
        offsets.append(offset)
        offset += len(chunk)

    with open(path, "wb") as f:
        f.write(header_bytes)
        f.write(struct.pack(f"<{nb_chunks}Q", *offsets))
        for chunk in chunks:
            f.write(chunk)


def read_exr_header(path: str):
    with open(path, "rb") as f:
        data = f.read()
    return _parse_header(data)[:-1]


def _parse_header(data: bytes):
    if len(data) < 8:
        raise ExrError("not an EXR file (truncated)")
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic != MAGIC:
        raise ExrError("not an EXR file (bad magic)")
    if version & _BRIDGE_FLAGS:
        raise ExrError("tiled / deep / multi-part EXR needs the OpenEXR "
                       "bridge")
    buf = memoryview(data)
    pos = 8
    attrs = {}
    while buf[pos] != 0:
        name, pos = _read_cstring(buf, pos)
        type_name, pos = _read_cstring(buf, pos)
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (type_name, bytes(buf[pos : pos + size]))
        pos += size
    pos += 1  # header terminator

    channels = _parse_chlist(attrs["channels"][1])
    (compression,) = struct.unpack_from("<B", attrs["compression"][1], 0)
    xmin, ymin, xmax, ymax = struct.unpack_from("<iiii", attrs["dataWindow"][1], 0)
    return channels, compression, (xmin, ymin, xmax, ymax), attrs, pos


def read_exr(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read a single-part scanline EXR.

    Returns ``(channels, info)`` where ``channels`` maps name -> (H, W)
    float32 array (HALF/UINT converted) and ``info`` carries the raw header
    attributes plus ``width``/``height``.
    """
    with open(path, "rb") as f:
        data = f.read()

    def _bridge(reason: str):
        from bcd_tpu.io import exr_native

        if exr_native.available():
            return exr_native.read_exr(path)
        detail = exr_native.build_error()
        raise ExrError(
            f"{reason}: the pure-numpy codec does not decode it and the "
            "system-OpenEXR bridge is unavailable on this host"
            + (f" ({detail})" if detail else ""))

    if len(data) < 8:
        raise ExrError("not an EXR file (truncated)")
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic == MAGIC and version & _BRIDGE_FLAGS:
        return _bridge("tiled / deep / multi-part EXR")
    channels, compression, (xmin, ymin, xmax, ymax), attrs, pos = _parse_header(data)
    if compression not in _LINES_PER_CHUNK:
        return _bridge(f"compression id {compression} (PIZ/B44/DWA)")
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    lines_per_chunk = _LINES_PER_CHUNK[compression]
    nb_chunks = (height + lines_per_chunk - 1) // lines_per_chunk

    offsets = struct.unpack_from(f"<{nb_chunks}Q", data, pos)

    row_bytes = sum(width * _PIXEL_SIZE[ch.pixel_type] for ch in channels)
    planes = {
        ch.name: np.empty((height, width), dtype=_PIXEL_DTYPE[ch.pixel_type])
        for ch in channels
    }

    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        y -= ymin
        payload = data[off + 8 : off + 8 + size]
        n_lines = min(lines_per_chunk, height - y)
        raw = _decompress_chunk(payload, row_bytes * n_lines, compression,
                                channels, width, n_lines)
        cursor = 0
        for line in range(y, y + n_lines):
            for ch in channels:
                nbytes = width * _PIXEL_SIZE[ch.pixel_type]
                planes[ch.name][line] = np.frombuffer(
                    raw, dtype=_PIXEL_DTYPE[ch.pixel_type], count=width, offset=cursor
                )
                cursor += nbytes

    out = {name: plane.astype(np.float32) for name, plane in planes.items()}
    info = {
        "width": width,
        "height": height,
        "compression": compression,
        "channels": channels,
        "attributes": attrs,
    }
    return out, info
