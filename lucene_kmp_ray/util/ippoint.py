"""InetAddressPoint: sortable 128-bit IP encoding + query ranges.

Mirrors the reference's ``document/InetAddressPoint.kt`` — IPv4
addresses index as RFC 4291 IPv4-mapped IPv6 (InetAddressPoint.kt:140-153
``encode``: 10 zero bytes, 2×0xFF, then the 4 IPv4 bytes), so one
16-byte big-endian key covers both families and unsigned lexicographic
byte order equals numeric IP order. Queries reduce to inclusive ranges
over that key: exact = [v, v] (:175), CIDR prefix = host bits zeroed /
filled (:187-208 ``newPrefixQuery``), range = [lo, hi] (:230-236).

The sortable form used in Ray pipelines is the 32-char lowercase hex
of the 16 bytes (lexicographic order identical to byte order), which a
SQL oracle reproduces with integer arithmetic + lpad(to_hex(...)).
"""

from __future__ import annotations

import ipaddress

import numpy as np

BYTES = 16
_V4_PREFIX = b"\x00" * 10 + b"\xff\xff"

MIN_VALUE = b"\x00" * BYTES
MAX_VALUE = b"\xff" * BYTES


def encode(value: str | ipaddress.IPv4Address | ipaddress.IPv6Address
           ) -> bytes:
    """16-byte sortable encoding (InetAddressPoint.kt:140-153): IPv4 →
    IPv4-mapped IPv6; IPv6 verbatim."""
    ip = ipaddress.ip_address(value)
    raw = ip.packed
    if len(raw) == 4:
        return _V4_PREFIX + raw
    return raw


def decode(value: bytes) -> str:
    """Encoded bytes → canonical host address string
    (InetAddressPoint.kt:155-163; IPv4-mapped forms decode back to the
    dotted-quad like java.net.InetAddress.getByAddress does)."""
    if len(value) != BYTES:
        raise ValueError("encoded bytes are of incorrect length")
    if value[:12] == _V4_PREFIX:
        return str(ipaddress.IPv4Address(value[12:]))
    return str(ipaddress.IPv6Address(value))


def next_up(value: bytes) -> bytes:
    """The immediately greater address (InetAddressPoint.kt:107-118)."""
    if value == MAX_VALUE:
        raise OverflowError("there is no greater InetAddress")
    i = int.from_bytes(value, "big") + 1
    return i.to_bytes(BYTES, "big")


def next_down(value: bytes) -> bytes:
    """The immediately smaller address (InetAddressPoint.kt:125-136)."""
    if value == MIN_VALUE:
        raise OverflowError("there is no smaller InetAddress")
    i = int.from_bytes(value, "big") - 1
    return i.to_bytes(BYTES, "big")


def prefix_range(value: str, prefix_length: int) -> tuple[bytes, bytes]:
    """CIDR prefix → inclusive [lower, upper] encoded range
    (InetAddressPoint.kt:187-208): zero the host bits for the lower
    bound, fill them for the upper. ``prefix_length`` counts bits of
    the ADDRESS's own width (32 for IPv4, 128 for IPv6), exactly like
    the reference, which masks the raw address before mapping."""
    ip = ipaddress.ip_address(value)
    raw = bytearray(ip.packed)
    nbits = 8 * len(raw)
    if not 0 <= prefix_length <= nbits:
        raise ValueError(f"illegal prefixLength '{prefix_length}'. "
                         f"Must be 0-{nbits}")
    lower, upper = bytearray(raw), bytearray(raw)
    for i in range(prefix_length, nbits):
        m = 1 << (7 - (i & 7))
        lower[i >> 3] &= ~m
        upper[i >> 3] |= m
    to16 = (lambda b: _V4_PREFIX + bytes(b)) if len(raw) == 4 \
        else bytes
    return to16(lower), to16(upper)


def range_hex(lo: str, hi: str) -> tuple[str, str]:
    """Inclusive [lo, hi] host addresses → sortable hex bounds."""
    return encode(lo).hex(), encode(hi).hex()


def encode_v4_ints(ipv4_ints: np.ndarray) -> np.ndarray:
    """Vectorized encode for uint32 IPv4 integers → object array of
    32-char sortable hex keys ('00000000000000000000ffff' + 8 hex
    digits) — one digit matrix, no per-row formatting."""
    v = np.asarray(ipv4_ints, dtype=np.uint64)
    n = len(v)
    hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
    out = np.empty((n, 8), dtype=np.uint8)
    for k in range(8):
        out[:, k] = hexd[(v >> np.uint64(28 - 4 * k)) & np.uint64(0xF)]
    prefix = _V4_PREFIX.hex()
    flat = out.tobytes()
    return np.array([prefix + flat[i * 8:(i + 1) * 8].decode()
                     for i in range(n)], dtype=object)
