"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed metadata.
REAL decoders (no external libraries): WAV audio (stdlib ``wave``),
24-bit BMP (numpy), 8-bit PNG — gray/RGB/palette/RGBA, all five
scanline filters — via stdlib ``zlib``, and baseline grayscale JPEG
(pipelines/jpegcodec.py: numpy DCT + table-driven Huffman decode).
Video codecs remain deterministic declared fakes
(``_fake_decode``/``_fake_resize``) because no video libraries exist in
this container; the Ray-side plumbing (schema, small batches for large
payloads, actor-pool stage shape, output layout) is real and tested
either way."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # 'image' | 'audio' | 'video'
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB: deterministic stand-in for a real decoder. Produces an 8-dim
    'feature' from the payload bytes via md5 — stable for tests. A real
    deployment replaces this with PIL.Image.open / soundfile / pyav and
    raises on corrupt payloads the same way."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real decoder stubbed out")
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0


class MediaFeatureExtractor:
    """Actor-pool stage: 'model' loaded once per actor, small batches
    because payloads are large (map_batches(..., batch_size=32))."""

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim  # real init: load model weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_decode(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


def synthesize_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
                for _ in range(n)]
    types = ["image", "audio", "video"]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


def extract_features(ds, concurrency: int = 2):
    """ds of MEDIA_SCHEMA rows → (media_id, media_type, feature) rows."""
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=32, concurrency=concurrency)


def _fake_resize(payload: bytes, w: int, h: int,
                 out_w: int, out_h: int) -> bytes:
    """STUB resize: deterministic byte transform standing in for a real
    PIL resize (payload → md5-chained bytes of the target size's scale,
    stable for tests). A real deployment decodes, resizes, re-encodes."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload; real codec stubbed out")
    seed = hashlib.md5(payload + bytes([out_w % 256, out_h % 256])).digest()
    reps = max(1, (out_w * out_h) // (16 * 8))
    return (seed * reps)[: out_w * out_h // 8 or len(seed)]


class MediaResizer:
    """Actor-pool resize stage (image thumbnailing shape): out payload +
    updated dimensions; batches stay SMALL because payloads are large —
    the batch_size × concurrency × payload product must fit the worker
    heap (SURVEY §4 memory note)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h  # real init: codec/context setup once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [_fake_resize(p, w, h, self.out_w, self.out_h)
                   for p, w, h in zip(batch["payload"].to_pylist(),
                                      batch["width"].to_pylist(),
                                      batch["height"].to_pylist())]
        n = batch.num_rows
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "payload": pa.array(resized, pa.binary()),
            "width": pa.array([self.out_w] * n, pa.int32()),
            "height": pa.array([self.out_h] * n, pa.int32()),
            "duration_ms": batch["duration_ms"],
        })


class FrameSampler:
    """Actor-pool frame-sampling stage (video → frames-at-interval shape):
    one input row explodes to ceil(duration/interval) frame rows — the
    flat_map shape of a video pipeline; frame 'decode' is the declared
    stub. Output rows are MEDIA_SCHEMA-like with media_type='image' and a
    frame_index column."""

    def __init__(self, interval_ms: int = 1000):
        self.interval_ms = interval_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_index": [], "payload": []}
        for mid, mtype, payload, dur in zip(
                batch["media_id"].to_pylist(),
                batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(),
                batch["duration_ms"].to_pylist()):
            if mtype != "video":
                continue
            n_frames = max(1, int(dur) // self.interval_ms)
            for fi in range(n_frames):
                out["media_id"].append(mid)
                out["frame_index"].append(fi)
                out["payload"].append(
                    hashlib.md5(payload + fi.to_bytes(4, "little")).digest())
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "frame_index": pa.array(out["frame_index"], pa.int64()),
            "payload": pa.array(out["payload"], pa.binary()),
        })


def resize_media(ds, out_w: int = 32, out_h: int = 32, concurrency: int = 2):
    return ds.map_batches(MediaResizer, fn_constructor_args=(out_w, out_h),
                          batch_format="pyarrow", batch_size=16,
                          concurrency=concurrency)


def sample_frames(ds, interval_ms: int = 1000, concurrency: int = 2):
    return ds.map_batches(FrameSampler, fn_constructor_args=(interval_ms,),
                          batch_format="pyarrow", batch_size=16,
                          concurrency=concurrency)


# ---------------- REAL audio decode (stdlib wave — no external libs) -----
def synthesize_wav_table(n: int = 32, sample_rate: int = 8000,
                         seconds: float = 0.25) -> pa.Table:
    """Deterministic REAL WAV payloads (stdlib ``wave`` writer): doc i is a
    16-bit mono sine at a doc-dependent frequency with doc-dependent
    amplitude — decodable by any WAV reader, no external data."""
    import io
    import wave

    payloads = []
    freqs = []
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    for i in range(n):
        f = 200.0 + 37.0 * (i % 20)
        amp = 0.2 + 0.7 * ((i % 7) / 7.0)
        sig = (amp * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)
        bio = io.BytesIO()
        with wave.open(bio, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(sig.tobytes())
        payloads.append(bio.getvalue())
        freqs.append(f)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["audio"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([0] * n, pa.int32()),
        "height": pa.array([0] * n, pa.int32()),
        "duration_ms": pa.array([int(seconds * 1000)] * n, pa.int32()),
    })


class AudioFeatureExtractor:
    """Actor-pool stage with a REAL decoder: stdlib ``wave`` parses the
    payload, numpy computes the features (duration, RMS, zero-crossing
    rate, dominant frequency via FFT) — the audio analog of a model
    featurizer, setup once per actor, vectorized per clip. Small batches:
    payloads are the large side (SURVEY §4 memory)."""

    def __init__(self, batch_fft: bool = True):
        self.batch_fft = batch_fft  # real init: load model weights here

    @staticmethod
    def _features(payload: bytes) -> tuple[float, float, float, float]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            frames = w.readframes(w.getnframes())
        sig = np.frombuffer(frames, dtype=np.int16).astype(np.float64)
        if len(sig) == 0:
            return 0.0, 0.0, 0.0, 0.0
        dur = len(sig) / sr
        rms = float(np.sqrt(np.mean(sig ** 2)) / 32767.0)
        zcr = float(np.mean(np.signbit(sig[1:]) != np.signbit(sig[:-1])))
        spec = np.abs(np.fft.rfft(sig))
        dom = float(np.argmax(spec) * sr / len(sig))
        return dur, rms, zcr, dom

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "media_id": batch["media_id"],
            "duration_s": pa.array([f[0] for f in feats], pa.float64()),
            "rms": pa.array([round(f[1], 6) for f in feats], pa.float64()),
            "zero_crossing_rate": pa.array([round(f[2], 6) for f in feats],
                                           pa.float64()),
            "dominant_hz": pa.array([round(f[3], 2) for f in feats],
                                    pa.float64()),
        })


def audio_features(ds, concurrency: int = 2):
    """WAV rows → (media_id, duration_s, rms, zero_crossing_rate,
    dominant_hz) via the real stdlib decoder."""
    return ds.map_batches(AudioFeatureExtractor, batch_format="pyarrow",
                          batch_size=16, concurrency=concurrency)


# ---------------- REAL image decode (uncompressed 24-bit BMP) ------------
def _bmp_encode(pixels: np.ndarray) -> bytes:
    """Write a real uncompressed 24-bit BMP (BITMAPINFOHEADER): rows
    bottom-up, BGR, 4-byte padded — parseable by any image viewer."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = (b"BM" + (54 + img_size).to_bytes(4, "little") + b"\x00" * 4 +
              (54).to_bytes(4, "little") +
              (40).to_bytes(4, "little") +
              w.to_bytes(4, "little") + h.to_bytes(4, "little") +
              (1).to_bytes(2, "little") + (24).to_bytes(2, "little") +
              b"\x00" * 4 + img_size.to_bytes(4, "little") + b"\x00" * 16)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # BGR, flip
    return header + rows.tobytes()


def _bmp_decode(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP → (h, w, 3) RGB uint8 array — a
    REAL image decode in pure numpy (no codec libraries needed for this
    format; PNG and baseline grayscale JPEG are real too — see
    ``_png_decode`` / ``pipelines/jpegcodec.py``; video remains the one
    declared stub in this container)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little")
    h = int.from_bytes(payload[22:26], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=row_bytes * h, offset=off)
    rows = raw.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR → top-down RGB


def synthesize_bmp_table(n: int = 24, w: int = 32, h: int = 24) -> pa.Table:
    """Deterministic real BMP images: doc i is a two-band gradient whose
    mean color is a pure function of i (verifiable post-decode)."""
    payloads = []
    for i in range(n):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = (10 * i) % 256                 # red level by id
        px[:, :, 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        px[: h // 2, :, 2] = 200                     # top band blue
        payloads.append(_bmp_encode(px))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([w] * n, pa.int32()),
        "height": pa.array([h] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


class ImageFeatureExtractor:
    """Actor-pool stage with the real BMP decoder: mean RGB, luminance
    mean/std, and an 8-bin luminance histogram per image."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, lum_mu, lum_sd, hists = [], [], [], []
        for p in batch["payload"].to_pylist():
            px = _image_decode(p)[:, :, :3].astype(np.float64)
            means.append([round(float(v), 3) for v in
                          px.reshape(-1, 3).mean(axis=0)])
            lum = px @ np.array([0.299, 0.587, 0.114])
            lum_mu.append(round(float(lum.mean()), 3))
            lum_sd.append(round(float(lum.std()), 3))
            hist, _ = np.histogram(lum, bins=8, range=(0, 256))
            hists.append([int(x) for x in hist])
        return pa.table({
            "media_id": batch["media_id"],
            "mean_rgb": pa.array(means, pa.list_(pa.float64())),
            "luminance_mean": pa.array(lum_mu, pa.float64()),
            "luminance_std": pa.array(lum_sd, pa.float64()),
            "luminance_hist": pa.array(hists, pa.list_(pa.int64())),
        })


def image_features(ds, concurrency: int = 2):
    return ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                          batch_size=16, concurrency=concurrency)


# ---------------- REAL image decode #2: PNG (stdlib zlib) -----------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_encode(pixels: np.ndarray) -> bytes:
    """Write a real PNG (bit depth 8, grayscale/RGB/RGBA by channel
    count, filter 0 scanlines, one zlib IDAT) — decodable by any PNG
    reader. Pure stdlib: zlib + struct."""
    import struct
    import zlib

    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].astype(np.uint8).tobytes()
                   for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _png_decode(payload: bytes) -> np.ndarray:
    """Parse a PNG → (h, w, c) uint8 array: bit depth 8, color types
    0 (gray), 2 (RGB), 3 (palette), 6 (RGBA), non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth) — a REAL decode in
    stdlib zlib + numpy. Baseline grayscale JPEG is real as well
    (``pipelines/jpegcodec.py``); interlaced/16-bit PNGs, color JPEG
    and video remain out of scope in this container (declared stubs)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = b""
    plte = None
    w = h = color_type = bit_depth = interlace = None
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        if ftype == 0:    # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 1:  # Sub (sequential left dependency)
            cur = line.astype(np.int32).copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line.astype(np.int32).copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif ftype == 4:  # Paeth
            cur = line.astype(np.int32).copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    px = out.reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def _image_decode(payload: bytes) -> np.ndarray:
    """Magic-dispatched REAL image decode (PNG, 24-bit BMP, or baseline
    grayscale JPEG — gray expands to (h, w, 3) so downstream feature
    stages see one shape)."""
    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    if payload[:2] == b"BM":
        return _bmp_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import jpeg_decode
        gray = jpeg_decode(payload)
        return np.repeat(gray[:, :, None], 3, axis=2)
    raise ValueError("unsupported image container")


def synthesize_png_table(n: int = 24, w: int = 32, h: int = 24) -> pa.Table:
    """Deterministic real PNG images (gradient + id-keyed red level),
    same pixel recipe as synthesize_bmp_table so features agree."""
    payloads = []
    for i in range(n):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = (10 * i) % 256
        px[:, :, 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        px[: h // 2, :, 2] = 200
        payloads.append(_png_encode(px))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([w] * n, pa.int32()),
        "height": pa.array([h] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


def synthesize_jpeg_table(n: int = 24, w: int = 32, h: int = 24) -> pa.Table:
    """Deterministic REAL baseline JPEGs (same pixel recipe as the
    BMP/PNG tables, luma-converted by the encoder) — exercises the
    numpy JFIF codec end-to-end in the image feature pipeline."""
    from .jpegcodec import jpeg_encode
    payloads = []
    for i in range(n):
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = (10 * i) % 256
        px[:, :, 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        px[: h // 2, :, 2] = 200
        payloads.append(jpeg_encode(px, quality=90))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([w] * n, pa.int32()),
        "height": pa.array([h] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })
