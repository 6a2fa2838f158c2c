"""Pure-stdlib MJPEG-in-AVI container codec for the multimodal
frame-sampling kernel — the video companion of operators/{jpeg,png,wav}.py.

Motion-JPEG AVI is the one mainstream video container that needs no
inter-frame codec: each '##dc'/'##db' chunk in the 'movi' list is a
standalone JFIF image, so RIFF chunk-walking (stdlib struct) + the
in-tree baseline-JPEG decoder gives REAL frame extraction with no video
libs. Inter-frame codecs (H.264/VP9/AV1) remain declared stubs — they
require real decoder libraries by nature.

The parser is lenient (streams written by odd muxers often are): it
walks LIST trees, takes dwMicroSecPerFrame from the first 'avih' header
it sees (default 33 333 µs ≈ 30 fps when absent), and collects every
video-data chunk in order. The writer emits a minimal spec-shaped file
(hdrl with avih + one 'vids'/'MJPG' stream, movi, idx1) for tests and
demos."""

from __future__ import annotations

import struct

AVI_DEFAULT_US_PER_FRAME = 33_333


def _is_video_data(fourcc: bytes) -> bool:
    return (
        len(fourcc) == 4
        and fourcc[:2].isdigit()
        and fourcc[2:] in (b"dc", b"db", b"DC", b"DB")
    )


def parse_mjpeg_avi(payload: bytes) -> tuple[list[bytes], int]:
    """→ (frames as standalone JPEG payloads, frame interval in ms)."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    us_per_frame = AVI_DEFAULT_US_PER_FRAME
    seen_avih = False

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal us_per_frame, seen_avih
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST" and size >= 4:
                walk(buf, body_start + 4, body_end)  # skip the list type
            elif cid == b"avih" and not seen_avih and size >= 4:
                (uspf,) = struct.unpack("<I", buf[body_start : body_start + 4])
                if uspf > 0:
                    us_per_frame = uspf
                seen_avih = True
            elif _is_video_data(cid) and size > 0:
                frames.append(bytes(buf[body_start:body_end]))
            pos = body_start + size + (size & 1)  # word-aligned

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, max(1, us_per_frame // 1000)


def encode_mjpeg_avi(
    frames: list[bytes], fps: int = 10, width: int = 0, height: int = 0
) -> bytes:
    """Minimal spec-shaped MJPEG AVI (hdrl: avih + vids/MJPG strl; movi;
    idx1) — deterministic, for in-tree tests and demos."""
    if not frames:
        raise ValueError("need at least one frame")
    uspf = max(1, 1_000_000 // fps)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        uspf, 0, 0, 0x10, len(frames), 0, 1, max(map(len, frames)),
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        max(map(len, frames)), 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", 0, 0, 0, 0, 0
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list-type start)
    entries = []
    off = 4
    for f in frames:
        entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
