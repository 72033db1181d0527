"""DateTools: sortable date strings with limited resolution.

Mirrors the reference's ``document/DateTools.kt`` — dates render as
zero-padded ``yyyyMMddHHmmssSSS`` prefixes (GMT), so lexicographic
order equals chronological order and a prefix IS the date rounded to
that resolution (DateTools.kt:53-57 ``timeToString`` = full sortable
string truncated to ``resolution.formatLen``; :129-142 ``round``
zeroes every finer component; :69-85 ``stringToTime`` zero-extends and
clamps month/day like the reference parser).

Scalar API (``time_to_string`` / ``string_to_time`` / ``round_ms``)
plus a vectorized ``times_to_strings`` for Arrow timestamp columns
inside ``map_batches`` — pure numpy datetime64 field extraction, no
per-row Python.
"""

from __future__ import annotations

from enum import Enum

import numpy as np


class Resolution(Enum):
    """Time granularity (DateTools.kt:193-216): value = prefix length
    of the 17-char sortable form."""
    YEAR = 4
    MONTH = 6
    DAY = 8
    HOUR = 10
    MINUTE = 12
    SECOND = 14
    MILLISECOND = 17

    @property
    def format_len(self) -> int:
        return self.value


def _fields_from_ms(ms: np.ndarray):
    """int64 epoch-millis → (Y, M, D, h, m, s, ms) int64 arrays via
    numpy datetime64 unit truncation (proleptic Gregorian, UTC — same
    calendar as the reference's kotlinx LocalDateTime)."""
    t = ms.astype("datetime64[ms]")
    Y = t.astype("datetime64[Y]")
    Mo = t.astype("datetime64[M]")
    D = t.astype("datetime64[D]")
    h = t.astype("datetime64[h]")
    mi = t.astype("datetime64[m]")
    s = t.astype("datetime64[s]")
    year = Y.astype(np.int64) + 1970
    month = (Mo - Y).astype(np.int64) + 1
    day = (D - Mo).astype(np.int64) + 1
    hour = (t.astype("datetime64[h]") - D).astype(np.int64)
    minute = (mi - h).astype(np.int64)
    sec = (s - mi).astype(np.int64)
    milli = (t - s).astype(np.int64)
    return year, month, day, hour, minute, sec, milli


_WIDTHS = (4, 2, 2, 2, 2, 2, 3)
_ASCII0 = ord("0")


def times_to_strings(ms: np.ndarray, resolution: Resolution) -> np.ndarray:
    """Vectorized timeToString over an int64 epoch-millis array →
    object array of sortable prefix strings. Built as one fixed-width
    uint8 digit matrix (no per-row formatting)."""
    ms = np.asarray(ms, dtype=np.int64)
    n = len(ms)
    fields = _fields_from_ms(ms)
    w = resolution.format_len
    out = np.empty((n, 17), dtype=np.uint8)
    col = 0
    for val, width in zip(fields, _WIDTHS):
        v = val.copy()
        for k in range(width - 1, -1, -1):
            out[:, col + k] = (v % 10) + _ASCII0
            v //= 10
        col += width
    flat = out[:, :w].tobytes()
    return np.array([flat[i * w:(i + 1) * w].decode()
                     for i in range(n)], dtype=object)


def time_to_string(ms: int, resolution: Resolution) -> str:
    """DateTools.timeToString (DateTools.kt:53-57)."""
    return times_to_strings(np.array([ms], dtype=np.int64), resolution)[0]


_DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _days_in_month(year: int, month: int) -> int:
    if month == 2 and (year % 4 == 0 and (year % 100 != 0
                                          or year % 400 == 0)):
        return 29
    return _DAYS_IN_MONTH[month - 1]


def string_to_time(date_string: str) -> int:
    """DateTools.stringToTime (DateTools.kt:69-85): zero-extend to 17
    chars, clamp month to 1..12 and day to 1..daysInMonth, → epoch ms."""
    n = len(date_string)
    if not 4 <= n <= 17:
        raise ValueError(f"Invalid date string length: {n}")
    full = date_string + "0" * (17 - n)
    y = int(full[0:4])
    mo = min(max(int(full[4:6]), 1), 12)
    d = max(int(full[6:8]), 1)
    h, mi, s, msec = (int(full[8:10]), int(full[10:12]),
                      int(full[12:14]), int(full[14:17]))
    d = min(d, _days_in_month(y, mo))
    base = np.datetime64(f"{y:04d}-{mo:02d}-{d:02d}", "ms")
    return int(base.astype(np.int64)
               + h * 3_600_000 + mi * 60_000 + s * 1_000 + msec)


def round_ms(ms: int, resolution: Resolution) -> int:
    """DateTools.round (DateTools.kt:129-142): zero every component
    finer than ``resolution`` (month/day floor to 1)."""
    return string_to_time(time_to_string(ms, resolution))
