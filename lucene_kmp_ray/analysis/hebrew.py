"""Hebrew analysis via the HebMorph/hspell dictionary.

Faithful port of the reference's hebmorph module semantics:

- ``Lemmatizer.lemmatize`` [ref: analysis/hebmorph/.../he/Lemmatizer.kt:
  28-60]: direct dictionary lookup emits every lemma; then legal
  prefixes (from the hspell prefix table) are stripped
  character-by-character while the remaining word is looked up — a hit
  counts only when the entry's allowed-prefix mask AND the per-lemma
  prefix specifier both admit the stripped prefix. A geresh-final word
  retries without the quote.
- ``HebrewIndexingAnalyzer`` chain [ref: he/HebrewAnalyzer.kt:119-130]:
  StandardTokenizer -> NiqqudFilter (strip Hebrew points U+05B0-05C7)
  -> ASCIIFolding -> LowerCase -> lemmatize Hebrew tokens. This port
  emits the DISTINCT lemmas for recognized words and the surface form
  otherwise (the reference's '$'-suffixed exact-form duplicate channel,
  AddSuffixTokenFilter, is an exact-match query feature and is
  deliberately not modeled — HebrewQueryLightAnalyzer's
  IgnoreOriginalTokenFilter shape).

The dictionary (``data/hebmorph.npz``: 338,465 words / 460,585 lemma
links / 241 legal prefixes) is decoded from the public hspell data
files the reference distributes — see
``scripts/build_hebmorph_assets.py``."""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

_NIQQUD = {chr(c) for c in range(0x05B0, 0x05C8)}


def strip_niqqud(s: str) -> str:
    return "".join(c for c in s if c not in _NIQQUD)


def is_hebrew_word(s: str) -> bool:
    return any("א" <= c <= "ת" for c in s)


class _Dict:
    def __init__(self):
        d = np.load(os.path.join(_DATA_DIR, "hebmorph.npz"),
                    allow_pickle=False)
        words = [str(w) for w in d["words"]]
        self.words = words
        self.index = {w: i for i, w in enumerate(words)}
        self.hints = d["prefix_hints"]
        self.off = d["entry_offsets"]
        self.lemma_idx = d["lemma_idx"]
        self.lemma_pref = d["lemma_pref"]
        with open(os.path.join(_DATA_DIR, "hebmorph_prefixes.json")) as f:
            self.prefixes = json.load(f)
        self.max_prefix = max(len(p) for p in self.prefixes)

    def lemmas_of(self, i: int, prefix_mask: int | None = None):
        out = []
        for j in range(self.off[i], self.off[i + 1]):
            if prefix_mask is not None \
                    and not (int(self.lemma_pref[j]) & prefix_mask):
                continue
            li = int(self.lemma_idx[j])
            out.append(self.words[li] if li >= 0 else None)
        return out


@lru_cache(maxsize=1)
def _dict() -> _Dict:
    return _Dict()


def lemmatize(word: str) -> list[str]:
    """All lemmas per Lemmatizer.kt (surface used for null lemmas);
    [] when unrecognized."""
    d = _dict()
    out: list[str | None] = []
    i = d.index.get(word)
    if i is not None:
        out.extend(d.lemmas_of(i))
    elif word.endswith("'"):
        i = d.index.get(word[:-1])
        if i is not None:
            out.extend(d.lemmas_of(i))
    for plen in range(1, len(word)):
        if len(word) - plen < 2:
            break
        mask = d.prefixes.get(word[:plen])
        if mask is None:
            break
        i = d.index.get(word[plen:])
        if i is not None and (int(d.hints[i]) & mask):
            out.extend(d.lemmas_of(i, prefix_mask=mask))
    # distinct, null -> surface
    seen, res = set(), []
    for m in out:
        m = m if m is not None else word
        if m not in seen:
            seen.add(m)
            res.append(m)
    return res


_ASCII_FOLD = None


def _ascii_fold(s: str) -> str:
    global _ASCII_FOLD
    if s.isascii():
        return s
    import unicodedata
    d = unicodedata.normalize("NFKD", s)
    return "".join(c for c in d if not unicodedata.combining(c))


class HebrewAnalyzer:
    """HebrewIndexingAnalyzer-shaped chain; callable text -> tokens."""

    name = "hebrew"

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(strip_niqqud(text)):
            if is_hebrew_word(t):
                lem = lemmatize(t)
                out.extend(lem if lem else [t])
            else:
                out.append(_ascii_fold(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow as pa

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            toks = self(text or "")
            flat.extend(toks)
            doc_of_l.extend([i] * len(toks))
            pos_l.extend(range(len(toks)))
            doc_lengths[i] = len(toks)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
