"""Pure stdlib+numpy GIF codec — LZW decode (GIF87a/89a), a fixed-code
LZW encoder (the classic clear-code-per-block trick, decodable by any
conformant reader), and multi-frame parsing so animated GIFs feed the
video frame-sampling kernel alongside MJPEG-AVI (operators/avi.py).
Completes the in-tree media kernels (SURVEY.md §2.10).

Scope: global or local color tables, 89a extension blocks (graphic
control delays honored, others skipped), full-frame images. Interlaced
images and partial-frame composition (disposal methods) stay with the
declared lib-gated stub in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-block bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated LZW stream")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def fresh() -> list[bytes | None]:
        return [bytes([i]) for i in range(clear)] + [None, None]

    table = fresh()
    code_size = min_code_size + 1
    prev: int | None = None
    while len(out) < n_pixels:
        code = br.read(code_size)
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("bad initial LZW code")
            out += table[code]  # type: ignore[operator]
        else:
            if code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(table[prev] + entry[:1])  # type: ignore[operator]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]  # type: ignore[operator]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW code")
            out += entry  # type: ignore[arg-type]
        prev = code
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels])


def _read_color_table(data: bytes, off: int, packed: int, flag_bit: int) -> tuple[np.ndarray | None, int]:
    if packed & flag_bit:
        n = 2 << (packed & 0x07)
        tbl = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        return tbl, off + 3 * n
    return None, off


def parse_gif_frames(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode every full-frame image: ([frame RGB arrays], [delay_ms]).
    Raises ValueError on non-GIF / unsupported (interlaced, partial-frame)
    payloads — callers sniff-don't-trust."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    global_tbl, off = _read_color_table(data, 13, packed, 0x80)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay_ms = 0
    while off < len(data):
        block = data[off]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[off + 1]
            off += 2
            if label == 0xF9 and data[off] == 4:
                delay_ms = struct.unpack_from("<H", data, off + 2)[0] * 10
            while data[off] != 0:  # skip sub-blocks
                off += 1 + data[off]
            off += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unsupported GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack_from("<HHHH", data, off + 1)
        ipacked = data[off + 9]
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("partial-frame GIF composition unsupported")
        tbl, noff = _read_color_table(data, off + 10, ipacked, 0x80)
        if tbl is None:
            tbl = global_tbl
        if tbl is None:
            raise ValueError("GIF image without a color table")
        off = noff
        min_code = data[off]
        off += 1
        lzw = bytearray()
        while data[off] != 0:
            ln = data[off]
            lzw += data[off + 1 : off + 1 + ln]
            off += 1 + ln
        off += 1
        idx = np.frombuffer(_lzw_decode(min_code, bytes(lzw), w * h), dtype=np.uint8)
        if idx.size != w * h:
            raise ValueError("short GIF pixel data")
        frames.append(tbl[idx.reshape(h, w)])
        delays.append(delay_ms)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def parse_gif(data: bytes) -> np.ndarray:
    """First frame as an (h, w, 3) uint8 RGB array."""
    return parse_gif_frames(data)[0][0]


def _lzw_encode_fixed(indices: bytes, min_code_size: int) -> bytes:
    """Fixed-code-size LZW: emit CLEAR often enough that the decoder's
    table never grows past the initial code width — larger output, but
    valid LZW that any conformant decoder (including _lzw_decode) accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    room = (1 << code_size) - clear - 3  # symbols before the table would widen
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    since_clear = 0
    for b in indices:
        if since_clear >= room:
            emit(clear)
            since_clear = 0
        emit(b)
        since_clear += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray, delays_ms: list[int] | None = None
) -> bytes:
    """Encode RGB frame(s) as a GIF with a per-image 256-entry local color
    table built from each frame's distinct colors (≤ 256 per frame
    required — fine for synthetic/test media)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w, _ = frames[0].shape
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0))
    for fi, arr in enumerate(frames):
        if arr.shape != (h, w, 3):
            raise ValueError("all frames must share one geometry")
        flat = arr.reshape(-1, 3)
        colors, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_gif supports <= 256 colors per frame")
        size_bits = max(1, int(len(colors) - 1).bit_length())
        n_entries = 1 << size_bits
        tbl = np.zeros((n_entries, 3), dtype=np.uint8)
        tbl[: len(colors)] = colors
        if delays_ms is not None:
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, 0, delays_ms[fi] // 10, 0, 0
            )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | (size_bits - 1))
        out += tbl.tobytes()
        min_code = max(2, size_bits)
        out.append(min_code)
        lzw = _lzw_encode_fixed(inv.astype(np.uint8).tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
