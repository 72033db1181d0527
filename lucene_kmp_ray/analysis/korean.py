"""Korean morphological analysis (nori semantics) on a compact dictionary.

Faithful port of the reference's Korean lattice tokenizer semantics:

- ``KoreanTokenizer`` / ``ko.Viterbi``
  [ref: analysis/nori/.../ko/KoreanTokenizer.kt,
        analysis/nori/.../ko/Viterbi.kt:115-272,
        analysis/common/.../morph/Viterbi.kt:50-330]:
  Viterbi over a character lattice with per-class unknown words
  (mecab-ko-dic char.def), whitespace skipping with a +3000 space
  penalty when a particle/ending/suffix follows a space, and
  dictionary-driven decompounding: COMPOUND entries emit right-aligned
  morpheme tokens, INFLECT entries emit morphemes sharing the token's
  offsets; DISCARD mode (the analyzer default) drops the compound
  surface itself.
- ``KoreanAnalyzer`` chain [ref: ko/KoreanAnalyzer.kt:20-26]:
  KoreanTokenizer(DISCARD) -> KoreanPartOfSpeechStopFilter(default
  stop tags) -> KoreanReadingFormFilter -> LowerCaseFilter.

Runtime data (``analysis/data/nori_runtime.npz``) is decoded from the
public mecab-ko-dic-derived assets the reference distributes (character
definition + unknown-word dictionary) — see
``scripts/build_nori_assets.py``. The reference distribution ships
NEITHER the known-word dictionary payload nor ConnectionCosts.dat for
Korean, so this module runs the lattice with a curated compact lexicon
(``nori_lexicon.tsv``: surface, POS tag, POS type, decompound
expression, cost) and a zero bigram-cost matrix — word costs plus the
space penalty drive path choice. Segmentation is validated against the
reference's own test vectors (TestKoreanAnalyzer.kt,
TestKoreanTokenizer.kt) in ``tests/test_korean_analyzer.py``; sentences
relying on mecab-ko-dic entries outside the compact lexicon fall back
to grouped unknown-word tokens.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

from .japanese import _is_punct, _Position

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

KNOWN, UNKNOWN, USER = 0, 1, 2
MORPHEME, COMPOUND, INFLECT = "M", "C", "I"
_USER_WORD_COST = -100000

MAX_UNKNOWN_WORD_LENGTH = 1024

# [ref: ko/Viterbi.kt computeSpacePenalty]
SPACE_PENALTY = 3000
_SPACE_PENALTY_TAGS = frozenset(
    "EP EF EC ETN ETM JKS JKC JKG JKO JKB JKV JKQ JX JC "
    "VCP XSA XSN XSV".split())

# [ref: ko/KoreanPartOfSpeechStopFilter.kt DEFAULT_STOP_TAGS]
KO_STOP_TAGS = frozenset(
    "EP EF EC ETN ETM IC JKS JKC JKG JKO JKB JKV JKQ JX JC "
    "MAG MAJ MM SP SSC SSO SC SE XPN XSA XSN XSV UNA NA VSV".split())


def _is_space(ch: str) -> bool:
    import unicodedata
    return unicodedata.category(ch) == "Zs"


class _Runtime:
    def __init__(self):
        d = np.load(os.path.join(_DATA_DIR, "nori_runtime.npz"))
        self.char_cat = d["char_category"]
        self.invoke = d["invoke"]
        self.group = d["group"]
        self.unk_class_off = d["unk_class_offsets"]
        self.unk_cost = d["unk_word_costs"]
        self.unk_tag = [str(t) for t in d["unk_pos_tags"]]

        surfaces: dict[str, list[int]] = {}
        cost, tag, ptype, morphs, reading = [], [], [], [], []
        with open(os.path.join(_DATA_DIR, "nori_lexicon.tsv"),
                  encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                # surface, tag, pos_type, expression, cost[, reading]
                fields = line.split("\t")
                surface, tg, pt, expr, c = fields[:5]
                rd = fields[5] if len(fields) > 5 and fields[5] else None
                wid = len(cost)
                cost.append(int(c))
                tag.append(tg)
                ptype.append(pt or MORPHEME)
                if expr:
                    ms = []
                    for part in expr.split("+"):
                        s, _, t = part.partition("/")
                        ms.append((s, t))
                    morphs.append(ms)
                else:
                    morphs.append(None)
                reading.append(rd)
                surfaces.setdefault(surface, []).append(wid)
        self.lex_cost = cost
        self.lex_tag = tag
        self.lex_type = ptype
        self.lex_morphs = morphs
        self.lex_reading = reading
        self.surfaces = surfaces
        prefixes = set()
        for s in surfaces:
            for i in range(1, len(s)):
                prefixes.add(s[:i])
        self.prefixes = prefixes
        self.max_len = max((len(s) for s in surfaces), default=0)

    def char_class(self, ch: str) -> int:
        o = ord(ch)
        return int(self.char_cat[o]) if o < 0x10000 else 1  # DEFAULT


@lru_cache(maxsize=1)
def _runtime() -> _Runtime:
    return _Runtime()


class KoToken:
    __slots__ = ("surface", "start", "end", "tag", "reading")

    def __init__(self, surface, start, end, tag, reading=None):
        self.surface = surface
        self.start = start
        self.end = end
        self.tag = tag
        self.reading = reading

    def __repr__(self):  # pragma: no cover
        return f"KoToken({self.surface!r},{self.start},{self.end},{self.tag})"


class KoreanTokenizer:
    """Lattice tokenizer with dictionary decompounding.

    mode: "discard" (analyzer default — compounds replaced by their
    morphemes), "none" (compound surface kept whole), or "mixed"
    (both). output_unknown_unigrams splits unknown tokens into single
    characters (KoreanTokenizer ctor flag).
    """

    def __init__(self, mode: str = "discard",
                 discard_punctuation: bool = True,
                 output_unknown_unigrams: bool = False,
                 user_dict: str | None = None):
        self.rt = _runtime()
        self.mode = mode
        self.discard_punctuation = discard_punctuation
        self.output_unknown_unigrams = output_unknown_unigrams
        # [ref: ko/dict/UserDictionary.kt] space-separated lines:
        # "surface [seg1 seg2 ...]" — NNG tag, COMPOUND when segmented
        self.user_entries = []
        self.user_surfaces: dict[str, int] = {}
        user_prefixes: set[str] = set()
        if user_dict:
            for raw in user_dict.splitlines():
                line = raw.split("#")[0].strip()
                if not line:
                    continue
                parts = line.split()
                surface = parts[0]
                segs = parts[1:]
                if segs and "".join(segs) != surface:
                    raise ValueError(f"user dict mismatch: {raw}")
                morphs = [(p, "NNG") for p in segs] if segs else None
                self.user_surfaces[surface] = len(self.user_entries)
                self.user_entries.append((surface, morphs))
                for i in range(1, len(surface)):
                    user_prefixes.add(surface[:i])
        self.user_prefixes = user_prefixes
        self.user_max_len = max((len(s) for s in self.user_surfaces),
                                default=0)

    def _wcost(self, wid: int, typ: int) -> int:
        if typ == USER:
            return _USER_WORD_COST
        return (self.rt.lex_cost[wid] if typ == KNOWN
                else int(self.rt.unk_cost[wid]))

    def _tag(self, wid: int, typ: int) -> str:
        if typ == USER:
            return "NNG"
        return (self.rt.lex_tag[wid] if typ == KNOWN
                else self.rt.unk_tag[wid])

    def _space_penalty(self, wid: int, typ: int, num_spaces: int) -> int:
        if num_spaces > 0 and self._tag(wid, typ) in _SPACE_PENALTY_TAGS:
            return SPACE_PENALTY
        return 0

    def _add(self, positions, from_pos: _Position, word_pos: int,
             end_pos: int, wid: int, typ: int) -> None:
        # zero connection matrix: min over incoming arcs is just min cost
        num_spaces = word_pos - from_pos.pos
        least_cost, least_idx = 2**62, -1
        for idx in range(from_pos.count):
            c = from_pos.costs[idx]
            if c < least_cost:
                least_cost, least_idx = c, idx
        least_cost += (self._wcost(wid, typ)
                       + self._space_penalty(wid, typ, num_spaces))
        p = positions.get(end_pos)
        if p is None:
            p = positions[end_pos] = _Position(end_pos)
        p.add(least_cost, 0, from_pos.pos, word_pos, least_idx, wid, typ)

    def tokenize(self, text: str) -> list[KoToken]:
        if not text:
            return []
        rt = self.rt
        n = len(text)
        cc = rt.char_cat
        ctypes = [int(cc[o]) if (o := ord(ch)) < 0x10000 else 1
                  for ch in text]
        positions: dict[int, _Position] = {}
        positions[0] = _Position(0)
        positions[0].add(0, 0, -1, -1, -1, -1, -1)  # BOS

        unknown_word_end = -1
        pos = 0
        while pos < n:
            pos_data = positions.get(pos)
            if pos_data is None or pos_data.count == 0:
                pos += 1
                continue

            # skip whitespace to the word start; numSpaces feeds the
            # space penalty [ref: morph/Viterbi.kt enableSpacePenaltyFactor]
            ws = pos
            while ws < n and _is_space(text[ws]):
                ws += 1
            if ws >= n:
                # trailing spaces: bridge the path to EOS
                self._bridge_spaces(positions, pos_data, n)
                break

            any_matches = False
            if self.user_max_len:
                limit = min(n, ws + self.user_max_len)
                end = ws
                while end < limit:
                    frag = text[ws:end + 1]
                    uid = self.user_surfaces.get(frag)
                    if uid is not None:
                        self._add(positions, pos_data, ws, end + 1, uid,
                                  USER)
                        any_matches = True
                    elif frag not in self.user_prefixes:
                        break
                    end += 1
            if not any_matches:
                limit = min(n, ws + rt.max_len)
                end = ws
                while end < limit:
                    frag = text[ws:end + 1]
                    wids = rt.surfaces.get(frag)
                    if wids is not None:
                        for wid in wids:
                            self._add(positions, pos_data, ws, end + 1,
                                      wid, KNOWN)
                            any_matches = True
                    elif frag not in rt.prefixes:
                        break
                    end += 1

            if unknown_word_end <= ws:
                first = text[ws]
                cls = ctypes[ws]
                if not any_matches or rt.invoke[cls]:
                    is_punct = _is_punct(first)
                    if not rt.group[cls]:
                        ulen = 1
                    else:
                        ulen = 1
                        ahead = ws + 1
                        while (ulen < MAX_UNKNOWN_WORD_LENGTH and ahead < n
                               and ctypes[ahead] == cls
                               and _is_punct(text[ahead]) == is_punct):
                            ulen += 1
                            ahead += 1
                    lo = int(rt.unk_class_off[cls])
                    hi = int(rt.unk_class_off[cls + 1])
                    for wid in range(lo, hi):
                        self._add(positions, pos_data, ws, ws + ulen, wid,
                                  UNKNOWN)
                    unknown_word_end = ws + ulen
            pos += 1

        end_pos_data = positions.get(n)
        if end_pos_data is None or end_pos_data.count == 0:
            return []
        least_cost, least_idx = 2**62, -1
        for idx in range(end_pos_data.count):
            if end_pos_data.costs[idx] < least_cost:
                least_cost, least_idx = end_pos_data.costs[idx], idx
        pending = self._backtrace(positions, text, end_pos_data, least_idx)
        pending.reverse()
        return pending

    def _bridge_spaces(self, positions, pos_data: _Position, n: int):
        """Carry the best path over trailing whitespace to EOS."""
        least_cost, least_idx = 2**62, -1
        for idx in range(pos_data.count):
            if pos_data.costs[idx] < least_cost:
                least_cost, least_idx = pos_data.costs[idx], idx
        p = positions.get(n)
        if p is None:
            p = positions[n] = _Position(n)
        # zero-length "word": backPos = the pre-space node, surface empty
        p.add(least_cost, 0, pos_data.pos, pos_data.pos, least_idx, -1, -1)

    def _backtrace(self, positions, text, end_pos_data: _Position,
                   from_idx: int) -> list[KoToken]:
        # [ref: ko/Viterbi.kt backtrace]
        rt = self.rt
        pending: list[KoToken] = []
        pos = end_pos_data.pos
        best_idx = from_idx
        while pos > 0:
            pos_data = positions[pos]
            back_pos = pos_data.backPos[best_idx]
            back_word_pos = pos_data.backWordPos[best_idx]
            back_type = pos_data.backType[best_idx]
            back_id = pos_data.backID[best_idx]
            next_best_idx = pos_data.backIndex[best_idx]

            if back_id == -1:  # trailing-space bridge: nothing to emit
                pos = back_pos
                best_idx = next_best_idx
                continue

            length = pos - back_word_pos
            surface = text[back_word_pos:back_word_pos + length]

            if back_type == USER:
                _, morphs = self.user_entries[back_id]
                if morphs is None or self.mode == "none":
                    pending.append(KoToken(
                        surface, back_word_pos, back_word_pos + length,
                        "NNG"))
                else:
                    end_off = back_word_pos + length
                    for m_surface, m_tag in reversed(morphs):
                        pending.append(KoToken(
                            m_surface, end_off - len(m_surface), end_off,
                            m_tag))
                        end_off -= len(m_surface)
                    if self.mode == "mixed":
                        pending.append(KoToken(
                            surface, back_word_pos,
                            back_word_pos + length, "NNG"))
            elif (self.discard_punctuation and length > 0
                    and _is_punct(surface[0])):
                pass  # punctuation dropped
            elif self.output_unknown_unigrams and back_type == UNKNOWN:
                for i in range(length - 1, -1, -1):
                    pending.append(KoToken(
                        surface[i], back_word_pos + i, back_word_pos + i + 1,
                        self._tag(back_id, back_type)))
            elif (back_type == UNKNOWN
                  or rt.lex_type[back_id] == MORPHEME
                  or self.mode == "none"):
                reading = (rt.lex_reading[back_id]
                           if back_type == KNOWN else None)
                pending.append(KoToken(
                    surface, back_word_pos, back_word_pos + length,
                    self._tag(back_id, back_type), reading))
            else:
                morphs = rt.lex_morphs[back_id]
                if morphs is None:
                    pending.append(KoToken(
                        surface, back_word_pos, back_word_pos + length,
                        self._tag(back_id, back_type)))
                else:
                    is_compound = rt.lex_type[back_id] == COMPOUND
                    end_off = back_word_pos + length
                    for m_surface, m_tag in reversed(morphs):
                        if is_compound:
                            tok = KoToken(m_surface,
                                          end_off - len(m_surface),
                                          end_off, m_tag)
                            end_off -= len(m_surface)
                        else:  # INFLECT: morphemes share the token offsets
                            tok = KoToken(m_surface, back_word_pos,
                                          back_word_pos + length, m_tag)
                        pending.append(tok)
                    if self.mode == "mixed":
                        pending.append(KoToken(
                            surface, back_word_pos, back_word_pos + length,
                            self._tag(back_id, back_type)))
            pos = back_pos
            best_idx = next_best_idx
        return pending


class KoreanAnalyzer:
    """Full nori chain; callable ``text -> list[str]``.
    [ref: ko/KoreanAnalyzer.kt createComponents]"""

    def __init__(self, mode: str = "discard", stop_tags=KO_STOP_TAGS):
        self.tokenizer = KoreanTokenizer(mode=mode)
        self.stop_tags = stop_tags

    def analyze_tokens(self, text: str):
        out = []
        pos_inc = 1
        for tok in self.tokenizer.tokenize(text):
            if tok.tag in self.stop_tags:   # KoreanPartOfSpeechStopFilter
                pos_inc += 1
                continue
            term = tok.reading or tok.surface  # KoreanReadingFormFilter
            out.append((term.lower(), tok.start, tok.end, pos_inc))
            pos_inc = 1
        return out

    def __call__(self, text: str) -> list[str]:
        return [t for t, _, _, _ in self.analyze_tokens(text)]

    def analyze_flat(self, texts):
        """Vectorized indexing interface (same contract as the other
        chains). Pure-ASCII fast path: letters group as one SL (foreign)
        token per run, digits as SN runs, punctuation dropped — i.e. the
        same class-run reduction as the Japanese chain (ALPHA/NUMERIC
        group=true, SL/SN not in the stop tags), swept in
        tests/test_korean_analyzer.py."""
        import re

        import pyarrow as pa

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        ascii_runs = re.compile(r"[A-Za-z]+|[0-9]+")
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            text = text or ""
            if text.isascii():
                toks = [m.lower() for m in ascii_runs.findall(text)]
            else:
                toks = self(text)
            flat.extend(toks)
            doc_of_l.extend([i] * len(toks))
            pos_l.extend(range(len(toks)))
            doc_lengths[i] = len(toks)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))


# ---------------------------------------------------------------------------
# KoreanNumberFilter [ref: ko/KoreanNumberFilter.kt] — same recursive-
# descent composition as the Japanese filter with Hangul numerals and
# powers; reuses the shared parser with Korean tables.
# ---------------------------------------------------------------------------

_KO_DIGITS = {"영": 0, "일": 1, "이": 2, "삼": 3, "사": 4, "오": 5,
              "육": 6, "칠": 7, "팔": 8, "구": 9}
_KO_EXPONENTS = {"십": 1, "백": 2, "천": 3, "만": 4, "억": 8, "조": 12,
                 "경": 16, "해": 20}


def _ko_is_arabic(c: str) -> bool:
    return "0" <= c <= "9" or "０" <= c <= "９"


def _ko_is_numeral_char(c: str) -> bool:
    return (_ko_is_arabic(c) or c in _KO_DIGITS
            or _KO_EXPONENTS.get(c, 0) > 0)


def ko_is_numeral(s: str) -> bool:
    return bool(s) and all(_ko_is_numeral_char(c) for c in s)


def ko_is_numeral_punctuation(s: str) -> bool:
    return bool(s) and all(c in ".．,，" for c in s)


def ko_normalize_number(s: str) -> str:
    """[ref: KoreanNumberFilter.normalizeNumber]"""
    from decimal import Decimal, InvalidOperation

    def basic(b):
        out = []
        while b[0] < len(s_loc):
            c = s_loc[b[0]]
            if _ko_is_arabic(c):
                out.append(str(ord(c) - (ord("0") if "0" <= c <= "9"
                                         else ord("０"))))
            elif c in _KO_DIGITS:
                out.append(str(_KO_DIGITS[c]))
            elif c in ".．":
                out.append(".")
            elif c in ",，":
                pass
            else:
                break
            b[0] += 1
        return Decimal("".join(out)) if out else None

    def kexp(b, lo, hi):
        if b[0] >= len(s_loc):
            return None
        power = _KO_EXPONENTS.get(s_loc[b[0]], 0)
        if lo <= power <= hi:
            b[0] += 1
            return Decimal(10) ** power
        return None

    def medium_pair(b):
        first = basic(b)
        second = kexp(b, 1, 3)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    def medium(b):
        total = Decimal(0)
        r = medium_pair(b)
        if r is None:
            return None
        while r is not None:
            total += r
            r = medium_pair(b)
        return total

    def large_pair(b):
        first = medium(b)
        second = kexp(b, 4, 99)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    s_loc = s
    try:
        b = [0]
        total = Decimal(0)
        r = large_pair(b)
        if r is None:
            return s
        while r is not None:
            total += r
            r = large_pair(b)
        return format(total.normalize(), "f")
    except (InvalidOperation, OverflowError, ValueError):
        return s


def ko_number_filter(tokens: list) -> list:
    """Token-stream composition, same rule as the Japanese filter."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if not ko_is_numeral(t.surface):
            out.append(t)
            i += 1
            continue
        start, end = t.start, t.end
        parts = []
        j = i
        while j < n and (ko_is_numeral(tokens[j].surface)
                         or (j > i and ko_is_numeral_punctuation(
                             tokens[j].surface))):
            parts.append(tokens[j].surface)
            end = tokens[j].end
            j += 1
        out.append(KoToken(ko_normalize_number("".join(parts)),
                           start, end, t.tag))
        i = j
    return out
