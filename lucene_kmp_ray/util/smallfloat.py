"""SmallFloat: lossy, order-preserving int->byte encodings for norms.

Bit-exact re-implementation of the reference's norm codec
(``/root/reference/core/.../util/SmallFloat.kt:87-148``): a positive int is
kept to 4 significant bits ("int4"), and ``int_to_byte4`` additionally spends
the unused byte values on exact small ints (values < 24 are exact).

Both scalar and vectorized (numpy) forms are provided; the vectorized forms
are what the indexing hot path uses. Properties (unit-tested):

- round-trip ``byte4_to_int(int_to_byte4(x)) <= x`` and is the largest
  representable value <= x  (used by the SQL oracle: encode == argmax of the
  decode table under <=).
- both maps are monotonic.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "int_to_byte4_np",
    "byte4_to_int_np",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
]


def long_to_int4(i: int) -> int:
    """Float-like encoding for positive longs preserving order + 4 sig bits."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit most-significant bit
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a positive int to an unsigned byte (0..255), lossy above 23."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) encoded with int_to_byte4."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


def _bit_length_np(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (no float log2 inaccuracy)."""
    v = v.astype(np.int64, copy=True)
    out = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = v >= (1 << s)
        out[mask] += s
        v[mask] >>= s
    out[v > 0] += 1
    return out


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 → uint8 array."""
    v = np.asarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("Only supports positive values")
    out = np.empty(v.shape, dtype=np.int64)
    small = v < NUM_FREE_VALUES
    out[small] = v[small]
    big = ~small
    if big.any():
        i = v[big] - NUM_FREE_VALUES
        nbits = _bit_length_np(i)
        sub = nbits < 4
        enc = np.empty(i.shape, dtype=np.int64)
        enc[sub] = i[sub]
        norm = ~sub
        shift = nbits[norm] - 4
        enc[norm] = ((i[norm] >> shift) & 0x07) | ((shift + 1) << 3)
        out[big] = NUM_FREE_VALUES + enc
    return out.astype(np.uint8)


def byte4_to_int_np(values: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int → int64 array."""
    b = np.asarray(values).astype(np.int64) & 0xFF
    return LENGTH_TABLE_INT[b]


# Decode table: LENGTH_TABLE[i] = byte4_to_int(i), float32 per the reference
# (BM25Similarity.kt:252-260). Integer version for lookups/SQL oracles.
LENGTH_TABLE_INT = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)
LENGTH_TABLE = LENGTH_TABLE_INT.astype(np.float32)
