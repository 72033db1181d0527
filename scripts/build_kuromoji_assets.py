#!/usr/bin/env python
"""One-shot converter: kuromoji binary dictionary assets -> repo data files.

The reference distribution ships the public mecab-ipadic-derived runtime
assets (Lucene kuromoji ``.dat`` build, see
``analysis/kuromoji/.../dict/DictionaryConstants.kt``) under
``gradle/kuromoji``.  mecab-ipadic itself is public data (Nara Institute
of Science and Technology licence).  This script decodes the four
runtime-relevant files and re-encodes them compactly for
``lucene_kmp_ray.analysis.japanese``:

- ``CharacterDefinition.dat``  (header ``kuromoji_cd``): char -> class map
  (65536 bytes) + per-class invoke/group bits
  [ref: analysis/common/.../morph/CharacterDefinition.kt:24-38]
- ``ConnectionCosts.dat``      (header ``kuromoji_cc``): zigzag-vint
  delta-encoded (backward x forward) int16 bigram cost matrix
  [ref: analysis/common/.../morph/ConnectionCosts.kt:23-47]
- ``UnknownDictionary$buffer/$posDict/$targetMap.dat``: per-character-class
  unknown-word entries (leftId/rightId = short>>3, wordCost = short at +2)
  [ref: analysis/kuromoji/.../dict/TokenInfoMorphData.kt:53-63,
        analysis/common/.../morph/BinaryDictionary.kt:32-77]
- ``TokenInfoDictionary$posDict.dat``: id -> (POS, inflType, inflForm)
  strings; used to assign authentic IPADIC left/right connection ids to
  the curated known-word lexicon (the reference distribution does not
  include ``TokenInfoDictionary$buffer.dat``, so per-word costs are not
  recoverable and the lexicon carries its own cost model).

Output (committed):
  lucene_kmp_ray/analysis/data/kuromoji_runtime.npz
  lucene_kmp_ray/analysis/data/kuromoji_pos_ids.json
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gradle/kuromoji"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_kmp_ray", "analysis", "data")

CODEC_MAGIC = 0x3FD76C17


class Reader:
    """Minimal Lucene DataInput over bytes (VInt / ZInt / string / BE int)."""

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0

    def read_byte(self) -> int:
        b = self.d[self.p]
        self.p += 1
        return b

    def read_bytes(self, n: int) -> bytes:
        out = self.d[self.p:self.p + n]
        self.p += n
        return out

    def read_be_int(self) -> int:
        (v,) = struct.unpack_from(">i", self.d, self.p)
        self.p += 4
        return v

    def read_vint(self) -> int:
        shift = 0
        out = 0
        while True:
            b = self.read_byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def read_zint(self) -> int:
        v = self.read_vint()
        return (v >> 1) ^ -(v & 1)  # zigzag decode

    def read_string(self) -> str:
        n = self.read_vint()
        return self.read_bytes(n).decode("utf-8")

    def check_header(self, codec: str, version: int) -> None:
        magic = self.read_be_int()
        assert magic == CODEC_MAGIC, hex(magic)
        actual = self.read_string()
        assert actual == codec, actual
        v = self.read_be_int()
        assert v == version, v


def load(name: str) -> Reader:
    with open(os.path.join(SRC, name), "rb") as f:
        return Reader(f.read())


def char_def():
    r = load("CharacterDefinition.dat")
    r.check_header("kuromoji_cd", 1)
    cat = np.frombuffer(r.read_bytes(0x10000), dtype=np.uint8).copy()
    invoke = np.zeros(12, dtype=bool)
    group = np.zeros(12, dtype=bool)
    for i in range(12):
        b = r.read_byte()
        invoke[i] = bool(b & 0x01)
        group[i] = bool(b & 0x02)
    return cat, invoke, group


def conn_costs():
    r = load("ConnectionCosts.dat")
    r.check_header("kuromoji_cc", 1)
    fwd = r.read_vint()
    bwd = r.read_vint()
    out = np.empty((bwd, fwd), dtype=np.int16)
    accum = 0
    flat = out.reshape(-1)
    for i in range(bwd * fwd):
        accum += r.read_zint()
        flat[i] = accum
    return out  # cost(forwardId, backwardId) = out[backwardId, forwardId]


def pos_dict(name: str):
    r = load(name)
    r.check_header("kuromoji_dict_pos", 1)
    n = r.read_vint()
    entries = []
    for _ in range(n):
        pos = r.read_string()
        infl_type = r.read_string()
        infl_form = r.read_string()
        entries.append([pos, infl_type, infl_form])
    return entries


def target_map(name: str):
    r = load(name)
    r.check_header("kuromoji_dict_map", 1)
    tmap = np.zeros(r.read_vint(), dtype=np.int64)
    offsets = np.zeros(r.read_vint(), dtype=np.int64)
    accum = 0
    source = 0
    for ofs in range(len(tmap)):
        v = r.read_vint()
        if v & 1:
            offsets[source] = ofs
            source += 1
        accum += v >> 1
        tmap[ofs] = accum
    assert source + 1 == len(offsets)
    offsets[source] = len(tmap)
    return tmap, offsets


def unk_buffer():
    r = load("UnknownDictionary$buffer.dat")
    r.check_header("kuromoji_dict", 1)
    size = r.read_vint()
    return r.read_bytes(size)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    cat, invoke, group = char_def()
    costs = conn_costs()

    unk_pos = pos_dict("UnknownDictionary$posDict.dat")
    unk_tmap, unk_offsets = target_map("UnknownDictionary$targetMap.dat")
    buf = unk_buffer()

    # Unknown entries are word-id = byte offset into the buffer:
    # short@id = leftId<<3|flags, short@id+2 = wordCost (big-endian shorts,
    # Lucene ByteBuffer default order).
    def short_at(off: int) -> int:
        return struct.unpack_from(">h", buf, off)[0]

    n_classes = len(unk_offsets) - 1
    unk_word_ids = []     # flattened word ids per class
    unk_class_off = [0]
    unk_left = []
    unk_cost = []
    unk_pos_of_word = []
    for cls in range(n_classes):
        for i in range(unk_offsets[cls], unk_offsets[cls + 1]):
            wid = int(unk_tmap[i])
            left = (short_at(wid) & 0xFFFF) >> 3
            unk_word_ids.append(wid)
            unk_left.append(left)
            unk_cost.append(short_at(wid + 2))
            unk_pos_of_word.append(unk_pos[left][0])
        unk_class_off.append(len(unk_word_ids))

    np.savez_compressed(
        os.path.join(DST, "kuromoji_runtime.npz"),
        char_category=cat,
        invoke=invoke,
        group=group,
        conn_costs=costs,
        unk_class_offsets=np.asarray(unk_class_off, dtype=np.int32),
        unk_word_ids=np.asarray(unk_word_ids, dtype=np.int32),
        unk_left_ids=np.asarray(unk_left, dtype=np.int32),
        unk_word_costs=np.asarray(unk_cost, dtype=np.int32),
    )
    with open(os.path.join(DST, "kuromoji_unk_pos.json"), "w") as f:
        json.dump(unk_pos_of_word, f, ensure_ascii=False)

    token_pos = pos_dict("TokenInfoDictionary$posDict.dat")
    with open(os.path.join(DST, "kuromoji_pos_ids.json"), "w") as f:
        json.dump(token_pos, f, ensure_ascii=False, indent=0)

    print(f"classes={n_classes} unk_entries={len(unk_word_ids)} "
          f"costs={costs.shape} pos_ids={len(token_pos)}")


if __name__ == "__main__":
    main()
