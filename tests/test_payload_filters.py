"""Reference vectors for the payload token filters.

Vectors from TestDelimitedPayloadTokenFilter.kt (identity / float /
integer encoders), TestNumericPayloadTokenFilter.kt,
TestTokenOffsetPayloadTokenFilter.kt and TestTypeAsPayloadTokenFilter
.kt — the analysis/common payloads package's live tests.
"""

import struct

from lucene_kmp_ray.analysis.payloads import (
    decode_float, decode_int, delimited_payload_filter, encode_float,
    encode_int, float_encoder, integer_encoder, numeric_payload_filter,
    token_offset_payload_filter, type_as_payload_filter,
    whitespace_offsets)


def test_payload_helper_roundtrip():
    # big-endian, bit-identical to PayloadHelper.kt
    assert encode_float(1.0) == b"\x3f\x80\x00\x00"
    assert encode_int(1) == b"\x00\x00\x00\x01"
    for f in (1.0, 2.0, 3.5, 0.5, 5.0, 99.3, 83.7):
        assert decode_float(encode_float(f)) == struct.unpack(
            ">f", struct.pack(">f", f))[0]
    for i in (1, 2, 3, 5, 99, 83, -7, 1 << 30):
        assert decode_int(encode_int(i)) == i


def test_delimited_identity():
    test = ("The quick|JJ red|JJ fox|NN jumped|VB over the lazy|JJ "
            "brown|JJ dogs|NN")
    out = delimited_payload_filter(test.split())
    assert out == [
        ("The", None), ("quick", b"JJ"), ("red", b"JJ"), ("fox", b"NN"),
        ("jumped", b"VB"), ("over", None), ("the", None),
        ("lazy", b"JJ"), ("brown", b"JJ"), ("dogs", b"NN")]


def test_delimited_float():
    test = ("The quick|1.0 red|2.0 fox|3.5 jumped|0.5 over the lazy|5 "
            "brown|99.3 dogs|83.7")
    out = delimited_payload_filter(test.split(), encoder=float_encoder)
    exp = [("The", None), ("quick", 1.0), ("red", 2.0), ("fox", 3.5),
           ("jumped", 0.5), ("over", None), ("the", None), ("lazy", 5.0),
           ("brown", 99.3), ("dogs", 83.7)]
    for (t, pay), (et, ev) in zip(out, exp):
        assert t == et
        if ev is None:
            assert pay is None
        else:
            assert pay == encode_float(ev)


def test_delimited_int():
    test = "The quick|1 red|2 fox|3 jumped over the lazy|5 brown|99 dogs|83"
    out = delimited_payload_filter(test.split(),
                                   encoder=integer_encoder)
    exp = [("The", None), ("quick", 1), ("red", 2), ("fox", 3),
           ("jumped", None), ("over", None), ("the", None), ("lazy", 5),
           ("brown", 99), ("dogs", 83)]
    for (t, pay), (et, ev) in zip(out, exp):
        assert t == et
        assert pay == (None if ev is None else encode_int(ev))


def test_numeric_payload():
    toks = "The quick red fox jumped over the lazy brown dogs".split()
    tt = [(t, "D" if t == "dogs" else "word") for t in toks]
    out = numeric_payload_filter(tt, 3.0, "D")
    seen_dogs = False
    for t, typ, pay in out:
        if t == "dogs":
            seen_dogs = True
            assert typ == "D" and pay is not None
            assert decode_float(pay) == 3.0
        else:
            assert typ == "word" and pay is None
    assert seen_dogs


def test_token_offset_payload():
    text = "The quick red fox jumped over the lazy brown dogs"
    toks = whitespace_offsets(text)
    out = token_offset_payload_filter(toks)
    assert len(out) == 10
    for (t, pay), (et, start, end) in zip(out, toks):
        assert t == et
        assert decode_int(pay, 0) == start
        assert decode_int(pay, 4) == end
    # spot the reference geometry: "The" at (0, 3), "quick" at (4, 9)
    assert toks[0][1:] == (0, 3) and toks[1][1:] == (4, 9)


def test_type_as_payload():
    toks = "The quick red fox jumped over the lazy brown dogs".split()
    tt = [(t, "D" if t == "dogs" else "word") for t in toks]
    out = type_as_payload_filter(tt)
    for (t, pay), (et, typ) in zip(out, tt):
        assert t == et and pay == typ.encode()
    assert type_as_payload_filter([("x", "")]) == [("x", None)]
