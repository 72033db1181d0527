#!/usr/bin/env python
"""One-shot converter: nori (Korean) binary dictionary assets -> repo data.

The reference distributes the public mecab-ko-dic-derived runtime assets
under ``gradle/nori`` (headers ``ko_cd`` / ``ko_dict*``, see
``analysis/nori/.../dict/DictionaryConstants.kt``). Unlike kuromoji it
ships NO ConnectionCosts.dat and no TokenInfoDictionary buffer/FST, so
only the character definition and the unknown-word dictionary are
recoverable; the known-word lexicon and bigram costs cannot be (the
Korean analyzer documents this and runs with a curated lexicon and a
zero connection matrix).

Decoded layouts [ref: analysis/nori/.../dict/TokenInfoMorphData.kt:32-47]:
  leftId  = short@wid >> 2      posType = short@wid & 3
  rightId = short@wid+2 >> 2    wordCost = short@wid+4
  leftPOS = posDict[leftId], posDict = byte ordinal into POS.Tag.values()

Output (committed): lucene_kmp_ray/analysis/data/nori_runtime.npz
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from build_kuromoji_assets import Reader  # noqa: E402  (same codec)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gradle/nori"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_kmp_ray", "analysis", "data")

# POS.Tag.values() order [ref: analysis/nori/.../ko/POS.kt:23-119]
POS_TAGS = [
    "EP", "EF", "EC", "ETN", "ETM", "IC", "JKS", "JKC", "JKG", "JKO",
    "JKB", "JKV", "JKQ", "JX", "JC", "MAG", "MAJ", "MM", "NNG", "NNP",
    "NNB", "NNBC", "NP", "NR", "SF", "SH", "SL", "SN", "SP", "SSC",
    "SSO", "SC", "SY", "SE", "VA", "VCN", "VCP", "VV", "VX", "XPN",
    "XR", "XSA", "XSN", "XSV", "UNKNOWN", "UNA", "NA", "VSV",
]

N_CLASSES = 14  # NGRAM..HANJANUMERIC [ref: ko/dict/CharacterDefinition.kt]


def load(name: str) -> Reader:
    with open(os.path.join(SRC, name), "rb") as f:
        return Reader(f.read())


def main() -> None:
    r = load("CharacterDefinition.dat")
    r.check_header("ko_cd", 1)
    cat = np.frombuffer(r.read_bytes(0x10000), dtype=np.uint8).copy()
    invoke = np.zeros(N_CLASSES, dtype=bool)
    group = np.zeros(N_CLASSES, dtype=bool)
    for i in range(N_CLASSES):
        b = r.read_byte()
        invoke[i] = bool(b & 0x01)
        group[i] = bool(b & 0x02)

    r = load("UnknownDictionary$posDict.dat")
    r.check_header("ko_dict_pos", 1)
    n = r.read_vint()
    pos_of_left = [POS_TAGS[r.read_byte()] for _ in range(n)]

    r = load("UnknownDictionary$targetMap.dat")
    r.check_header("ko_dict_map", 1)
    tmap = np.zeros(r.read_vint(), dtype=np.int64)
    offsets = np.zeros(r.read_vint(), dtype=np.int64)
    accum = source = 0
    for ofs in range(len(tmap)):
        v = r.read_vint()
        if v & 1:
            offsets[source] = ofs
            source += 1
        accum += v >> 1
        tmap[ofs] = accum
    offsets[source] = len(tmap)

    r = load("UnknownDictionary$buffer.dat")
    r.check_header("ko_dict", 1)
    buf = r.read_bytes(r.read_vint())

    def short_at(off: int) -> int:
        return struct.unpack_from(">h", buf, off)[0]

    n_classes = len(offsets) - 1
    class_off = [0]
    unk_cost, unk_tag = [], []
    for cls in range(n_classes):
        for i in range(offsets[cls], offsets[cls + 1]):
            wid = int(tmap[i])
            left = (short_at(wid) & 0xFFFF) >> 2
            unk_cost.append(short_at(wid + 4))
            unk_tag.append(pos_of_left[left])
        class_off.append(len(unk_cost))

    np.savez_compressed(
        os.path.join(DST, "nori_runtime.npz"),
        char_category=cat,
        invoke=invoke,
        group=group,
        unk_class_offsets=np.asarray(class_off, dtype=np.int32),
        unk_word_costs=np.asarray(unk_cost, dtype=np.int32),
        unk_pos_tags=np.asarray(unk_tag),
    )
    print(f"classes={n_classes} unk={len(unk_cost)} tags={unk_tag}")
    print("invoke:", invoke.tolist())
    print("group:", group.tolist())


if __name__ == "__main__":
    main()
