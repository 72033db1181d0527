#!/usr/bin/env python
"""One-shot converter: smartcn coredict.mem -> repo word/frequency table.

The reference distributes the public smartcn core word dictionary
(Lucene's ICTCLAS-derived ``coredict.mem``) under ``gradle/smartcn``.
The file is a Java ObjectOutputStream containing four arrays (exactly
what the reference's generator reads —
``gradle/generateChineseDicData.gradle.kts:46-52``):

  short[]      wordIndexTable     (hash slot -> word list index)
  char[]       charIndexTable     (hash slot -> first char)
  char[][][]   wordItemCharArrayTable  (suffixes grouped by first char;
                                   suffix excludes the first char, "" =
                                   the single-char word itself)
  int[][]      wordItemFrequencyTable

This script implements the minimal Java-serialization subset needed
(primitive / nested arrays, null elements, back-references) and re-keys
entries by actual first char, emitting a flat (word, freq) table — the
open-addressing hash plumbing is not preserved.

``bigramdict.mem`` is NOT in the distribution, so bigram frequencies
are unavailable (the segmenter runs the exact smoothing formula with an
empty bigram table, documented in analysis/chinese.py).

Output (committed): lucene_kmp_ray/analysis/data/smartcn_words.npz
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/gradle/smartcn/coredict.mem"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_kmp_ray", "analysis", "data")

TC_NULL, TC_REFERENCE, TC_CLASSDESC, TC_ARRAY, TC_ENDBLOCKDATA = \
    0x70, 0x71, 0x72, 0x75, 0x78
BASE_HANDLE = 0x7E0000


class JavaArrayReader:
    """Just enough java.io serialization to read (nested) arrays."""

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.handles: list = []
        magic, version = self._unpack(">HH")
        assert magic == 0xACED and version == 5, (magic, version)

    def _unpack(self, fmt: str):
        vals = struct.unpack_from(fmt, self.d, self.p)
        self.p += struct.calcsize(fmt)
        return vals

    def _utf(self) -> str:
        (n,) = self._unpack(">H")
        s = self.d[self.p:self.p + n].decode("utf-8")
        self.p += n
        return s

    def _class_desc(self) -> str:
        (tc,) = self._unpack(">B")
        if tc == TC_REFERENCE:
            (h,) = self._unpack(">i")
            return self.handles[h - BASE_HANDLE]
        assert tc == TC_CLASSDESC, hex(tc)
        name = self._utf()
        self._unpack(">q")   # serialVersionUID
        self.handles.append(name)
        self._unpack(">B")   # flags
        (nfields,) = self._unpack(">H")
        assert nfields == 0  # arrays have no declared fields
        (end,) = self._unpack(">B")
        assert end == TC_ENDBLOCKDATA
        (sup,) = self._unpack(">B")
        assert sup == TC_NULL
        return name

    def read_object(self):
        (tc,) = self._unpack(">B")
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            (h,) = self._unpack(">i")
            return self.handles[h - BASE_HANDLE]
        assert tc == TC_ARRAY, hex(tc)
        name = self._class_desc()
        self.handles.append(None)  # placeholder for the array handle
        slot = len(self.handles) - 1
        (n,) = self._unpack(">i")
        elem = name[1:]  # strip leading '['
        if elem == "S":
            out = list(self._unpack(f">{n}h"))
        elif elem == "C":
            out = "".join(chr(c) for c in self._unpack(f">{n}H"))
        elif elem == "I":
            out = list(self._unpack(f">{n}i"))
        elif elem == "J":
            out = list(self._unpack(f">{n}q"))
        else:  # object array: recurse per element
            out = [self.read_object() for _ in range(n)]
        self.handles[slot] = out
        return out


def main() -> None:
    with open(SRC, "rb") as f:
        r = JavaArrayReader(f.read())
    word_index = r.read_object()     # short[]
    char_index = r.read_object()     # char[] (as str)
    word_items = r.read_object()     # char[][][] (str leaves)
    word_freqs = r.read_object()     # int[][]

    words, freqs = [], []
    for hi, c in enumerate(char_index):
        if c == "\x00":
            continue
        li = word_index[hi]
        sufs = word_items[li]
        frs = word_freqs[li]
        if sufs is None:
            continue
        for j, suf in enumerate(sufs):
            if suf is None:
                continue
            words.append(c + suf)
            freqs.append(frs[j] if frs is not None else 0)

    os.makedirs(DST, exist_ok=True)
    np.savez_compressed(
        os.path.join(DST, "smartcn_words.npz"),
        words=np.asarray(words),
        freqs=np.asarray(freqs, dtype=np.int64),
    )
    print(f"words={len(words)}")
    d = dict(zip(words, freqs))
    for k in ["始##始", "末##末", "未##串", "未##数", "中国", "大学"]:
        print(k, d.get(k))


if __name__ == "__main__":
    main()
