"""Pure-numpy baseline JPEG (JFIF) codec — no imaging libraries.

Sandbox-real decode for the dominant image format (the PPM kernels'
pattern, extended): ``parse_jpeg`` decodes baseline sequential DCT JFIF
payloads (SOF0, 8-bit, Huffman, arbitrary sampling factors, restart
markers) to an (h, w, 3) uint8 RGB array; ``encode_jpeg`` emits a
deterministic baseline 4:4:4 JFIF stream using the standard Annex K
quantization and Huffman tables, so the pair round-trips in-tree without
any external fixture.

Everything here is from the public JPEG spec (ITU-T T.81): Annex K tables,
canonical Huffman code construction, zigzag order, level-shifted 8×8
DCT-II with orthonormal scaling, byte stuffing (0xFF 0x00). The entropy
coder is scalar Python (fine for the mapInPandas decode path, where
per-payload Python is already the declared sandbox trade — production
deployments swap in libjpeg via PIL); the DCT/IDCT, color transforms and
upsampling are vectorized numpy over all blocks at once.

In the multimodal operators this backs ``_decode_kernel``/``_resize_kernel``
for payloads sniffing as JPEG (SOI marker 0xFFD8), exactly as parse_ppm
backs the P6 path (operators/multimodal.py). Reference parity note: the
reference repo has no media pipeline at all — this module exists for the
training-data-pipeline surface of the brief.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 — standard luminance / chrominance quantization
# tables (quality 50 base, natural order).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order: _ZIGZAG[k] = flat index (row*8+col) of the k-th
# coefficient in scan order
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 — standard Huffman tables as (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the bit-serial decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# orthonormal 8-point DCT-II matrix (C @ block @ C.T == JPEG forward DCT
# after the level shift)
def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x.reshape(-1, 1)
    m = np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m * 0.5


_DCT = _dct_matrix()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (n, 8, 8) block stack."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _planes_of(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Deterministic baseline JFIF encoder: 4:4:4, Annex K Huffman tables,
    IJG-scaled Annex K quant tables."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(rgb)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    qt = [_scaled_quant(_QUANT_LUMA, quality), _scaled_quant(_QUANT_CHROMA, quality)]
    enc_dc = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # forward DCT + quantize every block of every component up front
    comp_zz = []
    for ci in range(3):
        blocks = _blocks_of(padded[..., ci] - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qt[0 if ci == 0 else 1]
        quant = np.round(coef / q).astype(np.int32)
        comp_zz.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = comp_zz[0].shape[0]
    for b in range(n_blocks):  # 4:4:4 → MCU = one block per component
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            zz = comp_zz[ci][b]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            cat = _category(diff)
            code, ln = enc_dc[tsel][cat]
            bw.write(code, ln)
            if cat:
                bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[tsel][0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = enc_ac[tsel][(run << 4) | cat]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                code, ln = enc_ac[tsel][0x00]  # EOB
                bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for tid, q in enumerate(qt):
        out += seg(0xDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])  # 1x1 sampling
    out += seg(0xC0, sof)
    for tclass, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for cid in (1, 2, 3):
        tsel = 0 if cid == 1 else 1
        sos += bytes([cid, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad past end (spec allows)
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                    break
                else:  # real marker (EOI / next segment): stop feeding
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:  # pad (end of scan)
                self.acc = (self.acc << (n - self.nbits))
                self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, cat: int) -> int:
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF payload to (h, w, 3) uint8 RGB
    (grayscale decodes to 3 identical channels). Raises ValueError on
    non-JPEG or unsupported (progressive/arithmetic/12-bit) streams."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    i = 2
    data = payload
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported (baseline)")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qt[tid] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            j = 0
            while j < len(seg):
                tclass, tid = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                (huff_dc if tclass == 0 else huff_ac)[tid] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tables >> 4, tables & 0xF)
            scan_start = i + 2 + seg_len
            return _decode_scan(
                data, scan_start, h, w, comps, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn/COM/etc.: skip
        i += 2 + seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(
    data, scan_start, h, w, comps, sel, qt, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    if not comps or h == 0 or w == 0:
        raise ValueError("missing SOF before SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data[scan_start:])
    pred = {c["id"]: 0 for c in comps}
    # per component: coefficient buffer (blocks_y, blocks_x, 8, 8)
    bufs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 8, 8), dtype=np.float64)
        for c in comps
    }
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                for c in comps:
                    pred[c["id"]] = 0
            for c in comps:
                dc_t, ac_t = sel[c["id"]]
                dtab, atab = huff_dc[dc_t], huff_ac[ac_t]
                q = qt[c["q"]].reshape(-1)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = br.huff(dtab)
                        diff = _extend(br.bits(cat), cat)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            sym = br.huff(atab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        # zz is in scan (zigzag) order; dequantize after
                        # restoring natural order
                        block = (zz[_UNZIGZAG] * q).reshape(8, 8).astype(np.float64)
                        bufs[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = block
            mcu_count += 1

    planes = []
    for c in comps:
        blocks = bufs[c["id"]].reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        plane = _planes_of(pix, ph, pw)
        # nearest-neighbor upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
