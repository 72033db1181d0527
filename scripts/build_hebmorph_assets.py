#!/usr/bin/env python
"""One-shot converter: hspell data files -> compact HebMorph dictionary.

The reference distributes the public hspell Hebrew dictionary (AGPL
hspell project data; the reference's hebmorph module builds its runtime
dictionary from these exact files via
``gradle/generateHebMorphData.gradle.kts``) under
``gradle/hebmorph/hspell-data-files``:

- ``hebrew.wgz``           gzip, prefix-compressed word list in
                           ISO-8859-8 (digits = chars to drop from the
                           previous word before appending)
- ``hebrew.wgz.prefixes``  gzip, one prefix-hint byte per word
- ``hebrew.wgz.desc``      gzip, per word: 2-char base-26 indexes into
                           the dmasks table (from dmask.c), 0/\\n ends
- ``hebrew.wgz.stems``     gzip, per word: 3-char base-94 indexes of
                           the lemma word, 0/\\n ends
- ``hebrew.wgz.sizes``     line 2: "<?> <word count>"
- ``dmask.c``              the dmasks[] table
- ``prefix_noH.gz``        "prefix#mask" lines (legal prefix -> mask)

Per-lemma prefix specifier derived from the dmask exactly as the
reference's generator does (dmaskToPrefix / descFlagOrdinal).

Output (committed): lucene_kmp_ray/analysis/data/hebmorph.npz
"""

from __future__ import annotations

import gzip
import json
import os
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/gradle/hebmorph/hspell-data-files"
DST = os.path.join(os.path.dirname(__file__), "..",
                   "lucene_kmp_ray", "analysis", "data")

# [ref: generateHebMorphData.gradle.kts:322-339]
D_NOUN, D_VERB, D_ADJ, D_TYPEMASK = 1, 2, 3, 3
D_INFINITIVE, D_BINFINITIVE, D_PRESENT, D_IMPERATIVE = 256, 1536, 768, 1280
D_TENSEMASK, D_OMASK, D_OSMICHUT, D_SPECNOUN = 1792, 129024, 131072, 262144
PS_B, PS_L, PS_VERB, PS_NONDEF, PS_IMPER, PS_ALL = 1, 2, 4, 8, 16, 127


def dmask_to_prefix(dmask: int) -> int:
    if (dmask & D_TYPEMASK) == D_VERB:
        t = dmask & D_TENSEMASK
        if t == D_IMPERATIVE:
            spec = PS_IMPER
        elif t != D_PRESENT:
            spec = PS_VERB
        elif (dmask & D_OSMICHUT) or (dmask & D_OMASK):
            spec = PS_NONDEF
        else:
            spec = PS_ALL
        if t == D_INFINITIVE:
            spec = PS_L
        elif t == D_BINFINITIVE:
            spec = PS_B
    elif (dmask & D_TYPEMASK) in (D_NOUN, D_ADJ):
        if (dmask & D_OSMICHUT) or (dmask & D_OMASK) \
                or (dmask & D_SPECNOUN):
            spec = PS_NONDEF
        else:
            spec = PS_ALL
    else:
        spec = PS_ALL
    return spec


def iso8859_to_unicode(c: int) -> str:
    if 0xE0 <= c <= 0xFA:
        return chr(c + 0x4F0)
    if c <= 0xBE:
        return chr(c)
    return " "


def read_word_count() -> int:
    with open(os.path.join(SRC, "hebrew.wgz.sizes")) as f:
        lines = f.read().splitlines()
    return int(lines[1].split(" ")[1]) - 1


def read_words(n: int) -> list[str]:
    out: list[str] = []
    buf: list[str] = []
    with gzip.open(os.path.join(SRC, "hebrew.wgz"), "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        c = data[i]
        if 0x30 <= c <= 0x39:  # digit: emit word, drop suffix chars
            if len(out) < n:
                out.append("".join(buf))
            drop = 0
            while i < len(data) and 0x30 <= data[i] <= 0x39:
                drop = drop * 10 + (data[i] - 0x30)
                i += 1
            del buf[len(buf) - drop:]
            if i >= len(data):
                break
            c = data[i]
        buf.append(iso8859_to_unicode(c))
        i += 1
    while len(out) < n:
        out.append("".join(buf))
        break
    assert len(out) == n, (len(out), n)
    return out


def read_dmasks() -> list[int]:
    vals = []
    started = False
    with open(os.path.join(SRC, "dmask.c")) as f:
        for line in f:
            if not started:
                if "dmasks[]" in line:
                    started = True
                continue
            tok = line.strip().rstrip(",")
            if tok.isdigit():
                vals.append(int(tok))
    return vals


def read_desc_rows(dmasks: list[int]) -> list[list[int]]:
    rows, cur, buf = [], [], []
    with gzip.open(os.path.join(SRC, "hebrew.wgz.desc"), "rb") as f:
        data = f.read()
    for b in data:
        if b in (0, 0x0A):
            rows.append(cur)
            cur, buf = [], []
            continue
        buf.append(b)
        if len(buf) == 2:
            cur.append(dmasks[(buf[0] - 65) + (buf[1] - 65) * 26])
            buf = []
    return rows


def read_stem_rows() -> list[list[int]]:
    rows, cur, buf = [], [], []
    with gzip.open(os.path.join(SRC, "hebrew.wgz.stems"), "rb") as f:
        data = f.read()
    for b in data:
        if b in (0, 0x0A):
            rows.append(cur)
            cur, buf = [], []
            continue
        buf.append(b)
        if len(buf) == 3:
            cur.append((buf[0] - 33) + (buf[1] - 33) * 94
                       + (buf[2] - 33) * 94 * 94)
            buf = []
    return rows


def main() -> None:
    n = read_word_count()
    words = read_words(n)
    with gzip.open(os.path.join(SRC, "hebrew.wgz.prefixes"), "rb") as f:
        hints = list(f.read()[:n])
    dmasks = read_dmasks()
    desc_rows = read_desc_rows(dmasks)
    stem_rows = read_stem_rows()

    prefixes: dict[str, int] = {}
    with gzip.open(os.path.join(SRC, "prefix_noH.gz"), "rt",
                   encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            pre, mask = line.split("#")
            prefixes[pre] = int(mask)

    # flatten per-word lemma lists; lemma = -1 encodes the generator's
    # "שונות" (misc) null lemma
    entry_off = [0]
    lemma_idx, lemma_desc, lemma_pref = [], [], []
    misc = None
    for i, w in enumerate(words):
        if w == "שונות":
            misc = i
            break
    for i in range(n):
        desc = desc_rows[i]
        stems = stem_rows[i]
        assert len(desc) == len(stems), (i, words[i])
        for d, s in zip(desc, stems):
            lemma_idx.append(-1 if (s == misc and s != i) else s)
            lemma_desc.append(d & 3)
            lemma_pref.append(dmask_to_prefix(d))
        entry_off.append(len(lemma_idx))

    np.savez_compressed(
        os.path.join(DST, "hebmorph.npz"),
        words=np.asarray(words),
        prefix_hints=np.asarray(hints, dtype=np.int32),
        entry_offsets=np.asarray(entry_off, dtype=np.int64),
        lemma_idx=np.asarray(lemma_idx, dtype=np.int32),
        lemma_desc=np.asarray(lemma_desc, dtype=np.int8),
        lemma_pref=np.asarray(lemma_pref, dtype=np.int32),
    )
    with open(os.path.join(DST, "hebmorph_prefixes.json"), "w") as f:
        json.dump(prefixes, f, ensure_ascii=False)
    print(f"words={n} lemmas={len(lemma_idx)} prefixes={len(prefixes)}")
    print("sample:", words[100], "->",
          [words[lemma_idx[j]] if lemma_idx[j] >= 0 else None
           for j in range(entry_off[100], entry_off[101])])


if __name__ == "__main__":
    main()
