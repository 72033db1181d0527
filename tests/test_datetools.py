"""DateTools vectors from the reference's TestDateTools.kt
(ref: core/src/commonTest/.../document/TestDateTools.kt:22-110)."""

import numpy as np
import pytest

from lucene_kmp_ray.util.datetools import (Resolution, round_ms,
                                           string_to_time,
                                           time_to_string,
                                           times_to_strings)


def _ms(iso: str) -> int:
    return int(np.datetime64(iso, "ms").astype(np.int64))


def test_string_to_time_epoch():
    # TestDateTools.kt:37-38
    assert string_to_time("197001010000") == 0
    # :40-41
    assert string_to_time("198002021105") == _ms("1980-02-02T11:05")


@pytest.mark.parametrize("s,iso", [
    ("2004", "2004-01-01T00:00:00.000"),          # :49-50
    ("200402", "2004-02-01T00:00:00.000"),        # :53-54
    ("20040203", "2004-02-03T00:00:00.000"),      # :57-58
    ("2004020322", "2004-02-03T22:00:00.000"),    # :61-62
    ("200402032208", "2004-02-03T22:08:00.000"),  # :65-66
    ("20040203220856", "2004-02-03T22:08:56.000"),        # :69-70
    ("20040203220856333", "2004-02-03T22:08:56.333"),     # :73-74
    ("19610305230951444", "1961-03-05T23:09:51.444"),     # :78-79
    ("1961030523", "1961-03-05T23:00:00.000"),    # :82-83
])
def test_string_round_trip(s, iso):
    ms = string_to_time(s)
    assert ms == _ms(iso)
    res = {4: Resolution.YEAR, 6: Resolution.MONTH, 8: Resolution.DAY,
           10: Resolution.HOUR, 12: Resolution.MINUTE,
           14: Resolution.SECOND, 17: Resolution.MILLISECOND}[len(s)]
    assert time_to_string(ms, res) == s


def test_time_to_string_epoch():
    # TestDateTools.kt:86-91
    assert time_to_string(0, Resolution.MILLISECOND) == "19700101000000000"
    assert time_to_string(_ms("1970-01-01T01:02:03.000"),
                          Resolution.MILLISECOND) == "19700101010203000"


def test_round():
    # TestDateTools.kt:98-110
    t = _ms("2004-02-03T22:08:56.333")
    assert round_ms(t, Resolution.YEAR) == _ms("2004-01-01T00:00")
    assert round_ms(t, Resolution.MONTH) == _ms("2004-02-01T00:00")
    assert round_ms(t, Resolution.DAY) == _ms("2004-02-03T00:00")
    assert round_ms(t, Resolution.HOUR) == _ms("2004-02-03T22:00")
    assert round_ms(t, Resolution.MINUTE) == _ms("2004-02-03T22:08")
    assert round_ms(t, Resolution.SECOND) == _ms("2004-02-03T22:08:56")
    assert round_ms(t, Resolution.MILLISECOND) == t


def test_string_to_time_clamps():
    # DateTools.kt:76-82: month/day clamp, day coerced to daysInMonth
    assert string_to_time("20040001") == _ms("2004-01-01")   # month 0 -> 1
    assert string_to_time("20041301") == _ms("2004-12-01")   # month 13 -> 12
    assert string_to_time("20040230") == _ms("2004-02-29")   # leap clamp
    assert string_to_time("20030230") == _ms("2003-02-28")


def test_vectorized_matches_scalar():
    ts = np.array([0, _ms("1999-12-31T23:59:59.999"),
                   _ms("2024-02-29T12:00:00.001"),
                   _ms("1961-03-05T23:09:51.444")], dtype=np.int64)
    for res in Resolution:
        vec = times_to_strings(ts, res)
        assert list(vec) == [time_to_string(int(t), res) for t in ts]


def test_bad_lengths():
    for s in ("200", "200402032208563334"):
        with pytest.raises(ValueError):
            string_to_time(s)
