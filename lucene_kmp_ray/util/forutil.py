"""Delta + FOR (Frame-of-Reference) bit-packing for posting lists.

Semantics follow the reference's Lucene101 postings layout
(``/root/reference/core/.../codecs/lucene101/ForUtil.kt:121`` — 128-int
blocks, per-block bit width; ``ForDeltaUtil.kt`` — delta+FOR for docIDs;
skip/impact metadata every block, ``Lucene101PostingsWriter.kt:96-107``).
The byte layout here is our own (numpy little-endian bit packing); scores
depend on the decoded *values*, which round-trip exactly.

Stream layout per encoded column: for each 128-value block (tail may be
short) one header byte = bit width ``w``, then ``ceil(nvals*w/8)`` payload
bytes with values packed LSB-first. ``w == 0`` means all values are 0 and
there is no payload. Decoding needs only the total value count.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # ForUtil.kt:121

__all__ = ["BLOCK_SIZE", "pack_ints", "unpack_ints", "encode_blocks",
           "decode_blocks", "delta_encode", "delta_decode"]


def pack_ints(vals: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into `width` bits each, LSB-first."""
    n = len(vals)
    if width == 0 or n == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & 1).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_ints(buf: memoryview | bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_ints → int64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little", count=n * width)
    weights = (np.int64(1) << np.arange(width, dtype=np.int64))
    return bits.reshape(n, width).astype(np.int64) @ weights


def _width_of(block_max: int) -> int:
    return int(block_max).bit_length()


def _bit_length_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=True)
    out = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.int64(1) << s)
        out[mask] += s
        v[mask] >>= s
    out[v > 0] += 1
    return out


def encode_blocks(vals: np.ndarray) -> bytes:
    """FOR-encode an int array into self-describing 128-value blocks.

    Vectorized across blocks: blocks sharing a bit width are packed with a
    single ``np.packbits`` call and scattered into the output stream by
    fancy indexing — no per-block Python work.
    """
    v = np.asarray(vals, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    if v.min() < 0:
        raise ValueError("FOR encoding requires non-negative values")
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    padded = np.zeros(nblocks * BLOCK_SIZE, dtype=np.uint64)
    padded[:n] = v.astype(np.uint64)
    resh = padded.reshape(nblocks, BLOCK_SIZE)
    widths = _bit_length_np(resh.max(axis=1))
    counts = np.full(nblocks, BLOCK_SIZE, dtype=np.int64)
    counts[-1] = n - (nblocks - 1) * BLOCK_SIZE
    payload = (counts * widths + 7) // 8
    # stream offsets: 1 header byte + payload per block
    ends = np.cumsum(1 + payload)
    starts = ends - (1 + payload)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    out[starts] = widths.astype(np.uint8)
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.flatnonzero(widths == w)
        rows = resh[idx]  # (k, 128)
        bits = ((rows[:, :, None] >> np.arange(w, dtype=np.uint64)) & 1) \
            .astype(np.uint8)
        packed = np.packbits(bits.reshape(len(idx), BLOCK_SIZE * int(w)),
                             axis=1, bitorder="little")  # (k, 16*w)
        # scatter each block's true payload bytes after its header byte
        take = payload[idx]  # tail block may take fewer bytes
        dest = (starts[idx] + 1)[:, None] + np.arange(packed.shape[1])
        mask = np.arange(packed.shape[1])[None, :] < take[:, None]
        out[dest[mask]] = packed[mask]
    return out.tobytes()


def decode_blocks(buf: bytes | memoryview, n: int) -> np.ndarray:
    """Decode encode_blocks output given the total value count.

    Vectorized across blocks (mirror of the encoder): the per-block Python
    work is only header parsing; all full blocks sharing a bit width unpack
    with a single ``np.unpackbits`` + matmul, scattered back by fancy
    indexing. The short tail block decodes alone.
    """
    if n == 0:
        return np.empty(0, dtype=np.int64)
    mv = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    tail_cnt = n - (nblocks - 1) * BLOCK_SIZE
    widths = np.empty(nblocks, dtype=np.int64)
    starts = np.empty(nblocks, dtype=np.int64)
    pos = 0
    for b in range(nblocks - 1):
        w = mv[pos]
        widths[b] = w
        starts[b] = pos + 1
        pos += 1 + (BLOCK_SIZE * int(w)) // 8  # full block: 128*w bits exact
    w = mv[pos]
    widths[-1] = w
    starts[-1] = pos + 1

    out = np.zeros(n, dtype=np.int64)
    full_w = widths[:-1]
    for wv in np.unique(full_w):
        if wv == 0:
            continue
        idx = np.flatnonzero(full_w == wv)
        pbytes = (BLOCK_SIZE * int(wv)) // 8
        gather = starts[idx][:, None] + np.arange(pbytes)
        raw = mv[gather]  # (k, pbytes)
        bits = np.unpackbits(raw, axis=1, bitorder="little")
        vals = bits.reshape(len(idx), BLOCK_SIZE, int(wv)).astype(np.int64) \
            @ (np.int64(1) << np.arange(int(wv), dtype=np.int64))
        dest = idx[:, None] * BLOCK_SIZE + np.arange(BLOCK_SIZE)
        out[dest.ravel()] = vals.ravel()
    # tail block
    tw = int(widths[-1])
    if tw:
        tb = (tail_cnt * tw + 7) // 8
        s = int(starts[-1])
        out[(nblocks - 1) * BLOCK_SIZE:] = unpack_ints(
            mv[s:s + tb].tobytes(), tail_cnt, tw)
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value kept absolute, then gaps (input must be ascending)."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    d = np.empty_like(v)
    if len(v):
        d[0] = v[0]
        np.subtract(v[1:], v[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))
