"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — no codec libs.

Correctness-grade single-component (grayscale) baseline sequential DCT
codec per ITU T.81: 8x8 blocks, level shift, orthonormal 2-D DCT via
matrix multiply, Annex K luminance quantization (quality-scaled with
the libjpeg convention), zig-zag, differential-DC + run-length-AC
entropy coding with the Annex K.3 standard Huffman tables, 0xFF byte
stuffing, and the full segment structure (SOI/APP0/DQT/SOF0/DHT/SOS/
EOI).  The DECODER is table-driven — it reads DQT/DHT/SOF0 from the
stream rather than assuming this encoder's tables — so any baseline
grayscale JPEG with standard markers decodes; progressive (SOF2),
arithmetic coding and multi-component scans raise ValueError.

This replaces the former `_fake_decode` for `image/jpeg` payloads in
pipelines/multimodal.py.  At 100 TB a real deployment swaps in
libjpeg-turbo behind the same actor signature; the Ray-side plumbing
is identical.  Per-symbol Huffman coding is Python (entropy coding is
inherently sequential); the DCT/quantization runs one tensor op over
all blocks.
"""

from __future__ import annotations

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode"]

# --- Annex K tables ------------------------------------------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

# zig-zag scan order: ZIGZAG[i] = flat index (row*8+col) of the i-th
# coefficient in scan order
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# standard Huffman tables (T.81 K.3.1/K.3.2): (bits[1..16], values)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix M: dct2(B) = M @ B @ M.T."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) \
        * np.sqrt(2.0 / 8.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def _quality_table(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex K table (jcparam.c
    convention: scale = 5000/q below 50, 200-2q above)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _build_code_table(bits, vals):
    """(bits, vals) → {symbol: (code, length)} by T.81 C.2 canonical
    code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits, vals):
    """(bits, vals) → {(length, code): symbol} for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:        # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) — T.81 F.1.2.1 (negative values store
    value-1 in category-many low bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def jpeg_encode(pixels: np.ndarray, quality: int = 85) -> bytes:
    """Grayscale (h, w) uint8 → baseline JFIF bytes.  RGB input is
    converted with the BT.601 luma weights first."""
    px = np.asarray(pixels)
    if px.ndim == 3:
        px = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
              + 0.114 * px[:, :, 2])
    h, w = px.shape
    qt = _quality_table(quality)

    # pad to 8x8 multiples by edge replication, split into blocks
    ph, pw = -h % 8, -w % 8
    padded = np.pad(px.astype(np.float64), ((0, ph), (0, pw)), mode="edge")
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    quant = np.round(coef / qt).astype(np.int64)
    scan = quant.reshape(-1, 64)[:, ZIGZAG]       # zig-zag order

    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for row in scan:
        diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        cat, bits = _magnitude(diff)
        c, ln = dc_codes[cat]
        bw.write(c, ln)
        if cat:
            bw.write(bits, cat)
        run = 0
        last_nz = int(np.max(np.nonzero(row)[0])) if row.any() else 0
        for i in range(1, 64):
            v = int(row[i])
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]            # ZRL
                bw.write(c, ln)
                run -= 16
            cat, bits = _magnitude(v)
            c, ln = ac_codes[(run << 4) | cat]
            bw.write(c, ln)
            bw.write(bits, cat)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]                # EOB
            bw.write(c, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xFF\xD8")                              # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00])                            # DQT id 0
               + bytes(qt.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big")        # SOF0
               + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)      # DHT DC 0
               + bytes(DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)      # DHT AC 0
               + bytes(AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))           # SOS
    out += bw.out
    out += b"\xFF\xD9"                                        # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) \
                        or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy stream")
                self.pos += 1                      # skip stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline grayscale JFIF bytes → (h, w) uint8.  Table-driven: DQT /
    DHT / SOF0 are read from the stream.  Raises ValueError on
    progressive / arithmetic / multi-component streams."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = 0
    dc_id = ac_id = 0
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                         # EOI
            break
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + ln]
        if marker == 0xDB:                         # DQT (possibly several)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(body[b + 1:b + 65], np.uint8) \
                    .astype(np.int32)[UNZIGZAG].reshape(8, 8)
                qtables[tid] = tab
                b += 65
        elif marker == 0xC0:                       # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError("only single-component (grayscale) "
                                 "baseline JPEG supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:                       # DHT (possibly several)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = tuple(body[b + 1:b + 17])
                n = sum(bits)
                vals = tuple(body[b + 17:b + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xDA:                       # SOS
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id = body[2] >> 4
            ac_id = body[2] & 0xF
            data_start = pos + ln
            break
        pos += ln
    if data_start is None or h is None:
        raise ValueError("missing SOS/SOF0")
    qt = qtables[comp_q]
    dc_tab = htables[(0, dc_id)]
    ac_tab = htables[(1, ac_id)]

    hb, wb = (h + 7) // 8, (w + 7) // 8
    # entropy data runs until the EOI marker
    end = payload.rfind(b"\xFF\xD9")
    br = _BitReader(payload[data_start:end if end > 0 else len(payload)])
    scan = np.zeros((hb * wb, 64), np.int64)
    prev_dc = 0
    for n in range(hb * wb):
        cat = _read_symbol(br, dc_tab)
        prev_dc += _extend(br.read_bits(cat), cat)
        scan[n, 0] = prev_dc
        i = 1
        while i < 64:
            sym = _read_symbol(br, ac_tab)
            if sym == 0x00:                        # EOB
                break
            run, cat = sym >> 4, sym & 0xF
            if cat == 0:
                if run != 15:
                    raise ValueError("invalid AC symbol")
                i += 16                            # ZRL
                continue
            i += run
            if i >= 64:
                raise ValueError("AC run overflows block")
            scan[n, i] = _extend(br.read_bits(cat), cat)
            i += 1
    coef = np.zeros((hb * wb, 64), np.int64)
    coef[:, ZIGZAG] = scan
    coef = coef.reshape(-1, 8, 8) * qt
    blocks = np.einsum("ji,njk,kl->nil", _DCT, coef.astype(np.float64),
                       _DCT) + 128.0
    img = blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(hb * 8, wb * 8)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]
