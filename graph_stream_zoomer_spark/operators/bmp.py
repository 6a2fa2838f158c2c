"""Pure stdlib+numpy BMP codec (uncompressed BI_RGB, 24/32-bit) — the
remaining trivially-decodable common image format, completing the in-tree
media kernels (PPM, baseline JPEG, PNG, WAV, MJPEG-AVI; SURVEY.md §2.10).

Handles the Windows BITMAPINFOHEADER (and the larger V4/V5 headers, which
are supersets), bottom-up and top-down row order, 4-byte row padding, and
BGR(A) channel order. RLE/1/4/8-bit palette forms stay with the declared
lib-gated stub in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (h, w, 3) uint8 RGB
    array. Raises ValueError on anything else (sniff-don't-trust: callers
    fall through to the stub)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (planes={planes} bpp={bpp} compression={compression})"
        )
    if w <= 0 or h_raw == 0:
        raise ValueError("degenerate BMP dimensions")
    bottom_up = h_raw > 0
    h = abs(h_raw)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("need an (h, w, 3) array")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + dib + pix
