"""ClassicAnalyzer — the pre-UAX#29 StandardTokenizer grammar.

[ref: analysis/common/.../classic/ClassicTokenizer.kt /
ClassicTokenizerImpl.kt (jflex grammar) / ClassicFilter.kt /
ClassicAnalyzer.kt]

Token types, longest-match with jflex rule-order tie-breaks:
ALPHANUM, APOSTROPHE (O'Reilly, don't), ACRONYM (U.S.A.), COMPANY
(AT&T, Excite@Home), EMAIL, HOST (www.nutch.org), NUM (alnum runs
joined by -/._, valid when every junction touches a digit-bearing
segment: 1-2-3, a1-b-c3, 216.239.63.104), CJ (one token per
kana/han character; Hangul is a regular letter run). ClassicFilter
strips acronym dots and the trailing possessive 's; the analyzer
lowercases and applies the standard English stop set.

Conformance: tests/test_classic_analyzer.py carries the reference's
own TestClassicAnalyzer vectors."""

from __future__ import annotations

import re

MAX_TOKEN_LENGTH = 255

_EMAIL = re.compile(
    r"[0-9A-Za-z]+(?:[._-][0-9A-Za-z]+)*@[0-9A-Za-z]+"
    r"(?:[.-][0-9A-Za-z]+)+")
_ACRONYM = re.compile(r"[A-Za-z]\.(?:[A-Za-z]\.)+")
_COMPANY = re.compile(r"[A-Za-z]+(?:[&@][A-Za-z]+)+")
_APOS = re.compile(r"[^\W_0-9]+(?:'[^\W_0-9]+)+", re.UNICODE)
_HOST = re.compile(r"[0-9A-Za-z]+(?:\.[0-9A-Za-z-]+)+")
_NUMCAND = re.compile(r"[0-9A-Za-z]+(?:[-._/][0-9A-Za-z]+)+")
_ALNUM = re.compile(r"[^\W_]+", re.UNICODE)
_HAS_DIGIT = re.compile(r"[0-9]")
# CJ: kana + han ideographs — one token per character (Hangul excluded:
# classic treats Korean as regular letter runs)
_CJ = re.compile(r"[぀-ヿㇰ-ㇿ㌀-㍿"
                 r"㐀-䶿一-鿿豈-﫿]")

ACRONYM_T, APOSTROPHE_T, WORD_T = "<ACRONYM>", "<APOSTROPHE>", "<ALPHANUM>"


def _num_valid(s: str) -> bool:
    segs = re.split(r"[-._/]", s)
    for a, b in zip(segs, segs[1:]):
        if not (_HAS_DIGIT.search(a) or _HAS_DIGIT.search(b)):
            return False
    return True


def classic_tokenize(text: str) -> list[tuple[str, str]]:
    """(token, type) pairs per the classic grammar."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if _CJ.match(ch):
            out.append((ch, "<CJ>"))
            i += 1
            continue
        if not _ALNUM.match(ch):
            i += 1
            continue
        # candidates in jflex priority order (earlier wins ties);
        # longest match wins overall
        cands = []
        for pat, typ in ((_APOS, APOSTROPHE_T), (_ACRONYM, ACRONYM_T),
                         (_COMPANY, "<COMPANY>"), (_EMAIL, "<EMAIL>"),
                         (_HOST, "<HOST>"), (_NUMCAND, "<NUM>"),
                         (_ALNUM, WORD_T)):
            m = pat.match(text, i)
            if m:
                tok = m.group(0)
                if typ == "<NUM>" and not _num_valid(tok):
                    continue
                cands.append((len(tok), typ, tok))
        if not cands:
            i += 1
            continue
        best_len = max(c[0] for c in cands)
        _, typ, tok = next(c for c in cands if c[0] == best_len)
        if len(tok) <= MAX_TOKEN_LENGTH:
            out.append((tok, typ))
        i += len(tok)
    return out


def classic_filter(tok: str, typ: str) -> str:
    """[ref: classic/ClassicFilter.kt]: acronym dots removed,
    trailing possessive 's stripped from APOSTROPHE tokens."""
    if typ == ACRONYM_T:
        return tok.replace(".", "")
    if typ == APOSTROPHE_T and (tok.endswith("'s") or tok.endswith("'S")):
        return tok[:-2]
    return tok


class ClassicAnalyzer:
    """ClassicTokenizer -> ClassicFilter -> LowerCase -> Stop."""

    name = "classic"

    def __init__(self, stop_words=None, max_token_length: int = None):
        if stop_words is None:
            from .standard import ENGLISH_STOP_WORDS
            stop_words = ENGLISH_STOP_WORDS
        self.stop = frozenset(stop_words)
        self.max_len = max_token_length or MAX_TOKEN_LENGTH

    def __call__(self, text: str) -> list[str]:
        out = []
        for tok, typ in classic_tokenize(text):
            if len(tok) > self.max_len:
                continue
            t = classic_filter(tok, typ).lower()
            if t and t not in self.stop:
                out.append(t)
        return out

    def analyze_flat(self, texts):
        import numpy as np
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
