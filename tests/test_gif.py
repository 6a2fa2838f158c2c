"""GIF codec — operators/gif.py (LZW decode, fixed-code encode,
multi-frame)."""

from __future__ import annotations

import numpy as np
import pytest

from graph_stream_zoomer_spark.operators.gif import (
    encode_gif,
    parse_gif,
    parse_gif_frames,
)


def _img(seed: int, h: int = 9, w: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(5, 3), dtype=np.uint8)
    return palette[rng.randint(0, 5, size=(h, w))]


def test_gif_single_frame_roundtrip():
    img = _img(1)
    assert (parse_gif(encode_gif(img)) == img).all()


def test_gif_roundtrip_exercises_lzw_reclear():
    # > (2^min_code - 3) pixels per run forces periodic CLEAR codes in the
    # fixed-code encoder; a 64x64 5-color image crosses that many times
    img = _img(2, h=64, w=64)
    assert (parse_gif(encode_gif(img)) == img).all()


def test_gif_animated_frames_and_delays():
    frames = [_img(s) for s in range(4)]
    data = encode_gif(frames, delays_ms=[100, 200, 300, 400])
    back, delays = parse_gif_frames(data)
    assert delays == [100, 200, 300, 400]
    assert len(back) == 4 and all((b == f).all() for b, f in zip(back, frames))


def test_gif_rejects_junk_and_unsupported():
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"GIF90a-not-really" + b"\x00" * 40)
    img = _img(3)
    data = bytearray(encode_gif(img))
    # flip the interlace bit in the image descriptor packed byte
    idx = data.index(0x2C, 13)
    data[idx + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        parse_gif(bytes(data))
