"""Payload token filters (analysis/common/payloads ports).

A payload is per-position opaque bytes attached to a token
(PayloadAttribute). In the engine's list model a payload-carrying
stream is a list of ``(term, payload: bytes | None)`` pairs; the
postings layout stores payloads alongside positions when a pipeline
asks for them (the ``.pay`` file role is a list<binary> column).

- ``encode_float`` / ``decode_float`` / ``encode_int`` / ``decode_int``
  [ref: payloads/PayloadHelper.kt — big-endian, bit-identical]
- ``delimited_payload_filter`` [ref: payloads/DelimitedPayloadTokenFilter
  .kt: 'term|payload' split at the FIRST delimiter; encoder = identity /
  float / integer (IdentityEncoder.kt, FloatEncoder.kt,
  IntegerEncoder.kt)]
- ``numeric_payload_filter`` [ref: payloads/NumericPayloadTokenFilter
  .kt: attach one float payload to every token of a given type]
- ``token_offset_payload_filter`` [ref: payloads/
  TokenOffsetPayloadTokenFilter.kt: payload = encodeInt(start) +
  encodeInt(end)]
- ``type_as_payload_filter`` [ref: payloads/TypeAsPayloadTokenFilter
  .kt: payload = the token type's UTF-8 bytes when non-empty]
"""

from __future__ import annotations

import struct


def encode_float(payload: float) -> bytes:
    """PayloadHelper.encodeFloat — big-endian IEEE-754 float32."""
    return struct.pack(">f", payload)


def decode_float(data: bytes, offset: int = 0) -> float:
    return struct.unpack_from(">f", data, offset)[0]


def encode_int(payload: int) -> bytes:
    """PayloadHelper.encodeInt — big-endian int32."""
    return struct.pack(">i", payload)


def decode_int(data: bytes, offset: int = 0) -> int:
    return struct.unpack_from(">i", data, offset)[0]


def identity_encoder(s: str) -> bytes:
    """IdentityEncoder: the chars' UTF-8 bytes."""
    return s.encode("utf-8")


def float_encoder(s: str) -> bytes:
    """FloatEncoder: parse then encodeFloat."""
    return encode_float(float(s))


def integer_encoder(s: str) -> bytes:
    """IntegerEncoder: parse then encodeInt."""
    return encode_int(int(s))


def delimited_payload_filter(tokens: list[str], delimiter: str = "|",
                             encoder=identity_encoder
                             ) -> list[tuple[str, bytes | None]]:
    """'term|payload' -> (term, encoded payload); tokens without the
    delimiter carry None (the reference leaves PayloadAttribute unset).
    The FIRST delimiter occurrence splits, like the reference's
    forward buffer scan."""
    out: list[tuple[str, bytes | None]] = []
    for t in tokens:
        i = t.find(delimiter)
        if i < 0:
            out.append((t, None))
        else:
            out.append((t[:i], encoder(t[i + 1:])))
    return out


def numeric_payload_filter(token_types: list[tuple[str, str]],
                           payload: float, type_match: str
                           ) -> list[tuple[str, str, bytes | None]]:
    """(term, type) -> (term, type, encodeFloat(payload) when the type
    matches, else None)."""
    enc = encode_float(payload)
    return [(t, typ, enc if typ == type_match else None)
            for t, typ in token_types]


def token_offset_payload_filter(tokens_with_offsets
                                ) -> list[tuple[str, bytes]]:
    """(term, start, end) -> (term, encodeInt(start)+encodeInt(end))."""
    return [(t, encode_int(start) + encode_int(end))
            for t, start, end in tokens_with_offsets]


def type_as_payload_filter(token_types: list[tuple[str, str]]
                           ) -> list[tuple[str, bytes | None]]:
    """(term, type) -> (term, type bytes) for non-empty types."""
    return [(t, typ.encode("utf-8") if typ else None)
            for t, typ in token_types]


def whitespace_offsets(text: str) -> list[tuple[str, int, int]]:
    """Whitespace tokens with (start, end) char offsets — the
    whitespaceMockTokenizer shape the payload tests drive."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        if i >= n:
            break
        j = i
        while j < n and not text[j].isspace():
            j += 1
        out.append((text[i:j], i, j))
        i = j
    return out
