"""Property tests for DateTools and InetAddressPoint (hypothesis):
round-trip and order-preservation laws the reference guarantees
(DateTools.kt class doc: 'lexicographic sorting orders them by date';
InetAddressPoint.kt: unsigned byte order = numeric IP order)."""

import ipaddress

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_kmp_ray.util.datetools import (Resolution, round_ms,
                                           string_to_time, time_to_string,
                                           times_to_strings)
from lucene_kmp_ray.util.ippoint import (decode, encode, next_down,
                                         next_up, prefix_range)

# epoch-ms range 1900..2100 (numpy datetime64 handles wider; the
# sortable form is 4-digit-year like the reference)
MS = st.integers(min_value=-2208988800000, max_value=4102444800000)
RES = st.sampled_from(list(Resolution))


@settings(max_examples=300, deadline=None)
@given(MS, RES)
def test_round_trip_is_round(ms, res):
    # stringToTime(timeToString(t, r)) == round(t, r), and rounding is
    # idempotent
    s = time_to_string(ms, res)
    back = string_to_time(s)
    assert back == round_ms(ms, res)
    assert round_ms(back, res) == back
    assert back <= ms


@settings(max_examples=200, deadline=None)
@given(MS, MS, RES)
def test_string_order_is_time_order(a, b, res):
    # lexicographic order of the sortable strings == chronological
    # order of the rounded times
    sa, sb = time_to_string(a, res), time_to_string(b, res)
    ra, rb = round_ms(a, res), round_ms(b, res)
    assert (sa < sb) == (ra < rb) and (sa == sb) == (ra == rb)


@settings(max_examples=50, deadline=None)
@given(st.lists(MS, min_size=1, max_size=40), RES)
def test_vectorized_equals_scalar(times, res):
    arr = np.array(times, dtype=np.int64)
    assert list(times_to_strings(arr, res)) == \
        [time_to_string(int(t), res) for t in times]


IPV4 = st.integers(min_value=0, max_value=2**32 - 1).map(
    lambda v: str(ipaddress.IPv4Address(v)))
IPV6 = st.integers(min_value=0, max_value=2**128 - 1).map(
    lambda v: str(ipaddress.IPv6Address(v)))


@settings(max_examples=300, deadline=None)
@given(st.one_of(IPV4, IPV6))
def test_ip_encode_decode_roundtrip(ip):
    assert decode(encode(ip)) == ip


@settings(max_examples=300, deadline=None)
@given(IPV4, IPV4)
def test_ip_order_preserved(a, b):
    ia, ib = int(ipaddress.IPv4Address(a)), int(ipaddress.IPv4Address(b))
    ea, eb = encode(a), encode(b)
    assert (ea < eb) == (ia < ib)
    assert (ea.hex() < eb.hex()) == (ia < ib)


@settings(max_examples=200, deadline=None)
@given(IPV4, st.integers(min_value=0, max_value=32))
def test_prefix_range_contains_address(ip, plen):
    lo, hi = prefix_range(ip, plen)
    e = encode(ip)
    assert lo <= e <= hi
    # the range is exactly the 2^(32-plen) mapped-v4 block
    span = int.from_bytes(hi, "big") - int.from_bytes(lo, "big") + 1
    assert span == 1 << (32 - plen)


@settings(max_examples=200, deadline=None)
@given(IPV4)
def test_next_up_down_inverse(ip):
    e = encode(ip)
    if e != encode("255.255.255.255"):
        assert next_down(next_up(e)) == e
    if e != encode("0.0.0.0"):
        # IPv4-mapped: next_down of .0.0.0.0 leaves the v4 block, which
        # still round-trips through the 128-bit space
        assert next_up(next_down(e)) == e
