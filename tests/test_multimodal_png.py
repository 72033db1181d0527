"""Real PNG codec (stdlib zlib): round trips, filter coverage, palette,
and BMP/PNG feature agreement through the actor-pool stage."""

import numpy as np
import pytest

from lucene_kmp_ray.pipelines.multimodal import (
    ImageFeatureExtractor,
    _image_decode,
    _png_decode,
    _png_encode,
    synthesize_bmp_table,
    synthesize_png_table,
)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip(channels):
    rng = np.random.default_rng(channels)
    px = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    enc = _png_encode(px if channels > 1 else px[:, :, 0])
    assert (_png_decode(enc) == px).all()


def test_all_filters_decode():
    import struct
    import zlib
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    h, w, c = px.shape
    out = b""
    prev = np.zeros(w * c, np.int32)
    for y, ft in zip(range(h), [0, 1, 2, 3, 4, 1, 3, 4]):
        row = px[y].reshape(-1).astype(np.int32)
        f = row.copy()
        if ft == 1:
            for x in range(w * c - 1, c - 1, -1):
                f[x] = (f[x] - row[x - c]) & 0xFF
        elif ft == 2:
            f = (row - prev) & 0xFF
        elif ft == 3:
            for x in range(w * c):
                left = row[x - c] if x >= c else 0
                f[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            for x in range(w * c):
                a = row[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else cc)
                f[x] = (row[x] - pred) & 0xFF
        out += bytes([ft]) + bytes(f.astype(np.uint8))
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(out)) + chunk(b"IEND", b""))
    assert (_png_decode(payload) == px).all()


def test_palette_png():
    import struct
    import zlib
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    h, w = idx.shape

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte.tobytes())
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (_png_decode(payload) == plte[idx]).all()


def test_magic_dispatch():
    px = np.zeros((4, 4, 3), np.uint8)
    assert (_image_decode(_png_encode(px)) == px).all()
    with pytest.raises(ValueError):
        _image_decode(b"JUNKJUNKJUNK")


def test_bmp_png_feature_agreement():
    ex = ImageFeatureExtractor()
    fb = ex(synthesize_bmp_table(6)).to_pydict()
    fp = ex(synthesize_png_table(6)).to_pydict()
    assert fb["mean_rgb"] == fp["mean_rgb"]
    assert fb["luminance_hist"] == fp["luminance_hist"]
