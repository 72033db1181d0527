"""InetAddressPoint vectors (ref: document/InetAddressPoint.kt and
TestInetAddressPoint.kt — encode/prefix/range semantics)."""

import numpy as np
import pytest

from lucene_kmp_ray.util.ippoint import (MAX_VALUE, MIN_VALUE, decode,
                                         encode, encode_v4_ints,
                                         next_down, next_up,
                                         prefix_range, range_hex)


def test_encode_ipv4_mapped():
    # InetAddressPoint.kt:140-153: IPv4 -> RFC 4291 IPv4-mapped IPv6
    assert encode("1.2.3.4") == b"\x00" * 10 + b"\xff\xff\x01\x02\x03\x04"
    assert decode(encode("1.2.3.4")) == "1.2.3.4"


def test_encode_ipv6_verbatim():
    e = encode("fec0::f66d")
    assert len(e) == 16 and e[0] == 0xFE and e[1] == 0xC0
    assert decode(e) == "fec0::f66d"


def test_sort_order_is_numeric():
    ips = ["1.2.3.3", "1.2.3.4", "1.2.3.5", "9.0.0.0", "10.0.0.1",
           "255.255.255.255"]
    encs = [encode(ip) for ip in ips]
    assert encs == sorted(encs)
    hexs = [e.hex() for e in encs]
    assert hexs == sorted(hexs)


def test_next_up_down():
    # TestInetAddressPoint nextUp/nextDown semantics
    assert decode(next_up(encode("1.2.3.4"))) == "1.2.3.5"
    assert decode(next_down(encode("1.2.3.4"))) == "1.2.3.3"
    assert decode(next_up(encode("1.2.3.255"))) == "1.2.4.0"
    with pytest.raises(OverflowError):
        next_up(MAX_VALUE)
    with pytest.raises(OverflowError):
        next_down(MIN_VALUE)


def test_prefix_query_range():
    # InetAddressPoint.kt:187-208: newPrefixQuery("1.2.3.4", 24)
    # == range [1.2.3.0, 1.2.3.255] (TestInetAddressPoint.kt:120-123)
    lo, hi = prefix_range("1.2.3.4", 24)
    assert decode(lo) == "1.2.3.0" and decode(hi) == "1.2.3.255"
    lo, hi = prefix_range("10.64.0.0", 10)
    assert decode(lo) == "10.64.0.0" and decode(hi) == "10.127.255.255"
    lo, hi = prefix_range("1.2.3.4", 32)      # exact
    assert decode(lo) == decode(hi) == "1.2.3.4"
    lo, hi = prefix_range("1.2.3.4", 0)       # everything v4
    assert decode(lo) == "0.0.0.0" and decode(hi) == "255.255.255.255"
    with pytest.raises(ValueError):
        prefix_range("1.2.3.4", 33)


def test_prefix_query_range_v6():
    lo, hi = prefix_range("fec0::f66d", 64)
    assert lo.hex().startswith("fec0000000000000")
    assert hi.hex() == "fec0000000000000ffffffffffffffff"


def test_range_hex_matches_encode():
    lo, hi = range_hex("10.32.0.0", "10.159.255.255")
    assert lo == encode("10.32.0.0").hex()
    assert hi == encode("10.159.255.255").hex()


def test_encode_v4_ints_vectorized():
    ints = np.array([0, 1, 0x01020304, 0xFFFFFFFF], dtype=np.uint64)
    hexs = encode_v4_ints(ints)
    assert hexs[2] == encode("1.2.3.4").hex()
    assert hexs[0] == encode("0.0.0.0").hex()
    assert hexs[3] == encode("255.255.255.255").hex()
    assert all(len(h) == 32 for h in hexs)
