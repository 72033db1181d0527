"""WordDelimiterGraphFilter: split tokens at delimiters / case changes /
letter-digit transitions, with optional catenation and possessive stemming.

Reference semantics (ported exactly, then vectorized per *unique* token):

- ``WordDelimiterIterator`` (``analysis/common/.../miscellaneous/
  WordDelimiterIterator.kt:163-306``): subword scan with bounds trimming,
  ``isBreak`` transition rules (same-type never breaks; UPPER→lower never
  breaks, so "ABCDef" stays whole while "camelCase" splits; lower→UPPER
  breaks when SPLIT_ON_CASE_CHANGE; letter↔digit breaks when
  SPLIT_ON_NUMERICS), English possessive skipping
  (``endsWithPossessive``, WordDelimiterIterator.kt:299-306).
- ``WordDelimiterGraphFilter.bufferWordParts``
  (``WordDelimiterGraphFilter.kt:306-344``): emission of original
  (PRESERVE_ORIGINAL, position 0 of the token), generated parts
  (sequential word positions), and catenation runs (at their first
  subword's position); all-delimiter tokens are dropped (they still
  consume one position — "LUCENE / SOLR" gives SOLR posIncr 2, verified
  against ``TestWordDelimiterGraphFilter.kt:328-340``).
- Character typing: the <256 table mirrors
  ``WordDelimiterIterator.DEFAULT_WORD_DELIM_TABLE`` (Character.isLowerCase
  / UPPERCASE_LETTER / isDigit, WordDelimiterIterator.kt:44-62); ≥256 uses
  the ``getType`` category mapping (WordDelimiterIterator.kt:71-87).

The analyzer chain here is the classic Solr pairing: whitespace tokenizer
→ WordDelimiterGraphFilter → LowerCaseFilter (the UAX#29 StandardTokenizer
would already split at the delimiters WDGF exists to handle).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LOWER = 1
UPPER = 2
DIGIT = 4
SUBWORD_DELIM = 8
ALPHA = LOWER | UPPER

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

DEFAULT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS |
                 SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
                 STEM_ENGLISH_POSSESSIVE)

_CAT_MAP = {
    "Lu": UPPER, "Ll": LOWER,
    "Lt": ALPHA, "Lm": ALPHA, "Lo": ALPHA,
    "Mn": ALPHA, "Me": ALPHA, "Mc": ALPHA,
    "Nd": DIGIT, "Nl": DIGIT, "No": DIGIT,
    "Cs": ALPHA | DIGIT,
}


def _char_type(ch: str) -> int:
    cp = ord(ch)
    cat = unicodedata.category(ch)
    if cp < 256:
        # DEFAULT_WORD_DELIM_TABLE: isLowerCase / UPPERCASE_LETTER / isDigit
        if cat == "Ll" or cp in (0xAA, 0xBA):  # Other_Lowercase in Latin-1
            return LOWER
        if cat == "Lu":
            return UPPER
        if cat == "Nd":
            return DIGIT
        return SUBWORD_DELIM
    return _CAT_MAP.get(cat, SUBWORD_DELIM)


def _subword_type(t: int) -> int:
    return ALPHA if t in (LOWER, UPPER) else t


class WordDelimiterFilter:
    """Per-token part generator (the graph filter minus the token stream).

    ``parts(token)`` → ``(list[(term, rel_pos)], span)``: the emitted terms
    with their position offsets relative to the token's base position, and
    how many positions the token consumes in the stream.
    """

    def __init__(self, flags: int = DEFAULT_FLAGS,
                 protected: frozenset[str] = frozenset()):
        self.flags = flags
        self.protected = frozenset(protected)
        self._cache: dict[str, tuple[list[tuple[str, int]], int]] = {}

    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    # -- WordDelimiterIterator port ------------------------------------
    def _ends_with_poss(self, text: str, ct: list[int], pos: int,
                        end_bounds: int) -> bool:
        return (self._has(STEM_ENGLISH_POSSESSIVE) and pos > 2 and
                text[pos - 2] == "'" and text[pos - 1] in "sS" and
                (ct[pos - 3] & ALPHA) != 0 and
                (pos == end_bounds or ct[pos] == SUBWORD_DELIM))

    def _is_break(self, last: int, t: int) -> bool:
        if (t & last) != 0:
            return False
        if not self._has(SPLIT_ON_CASE_CHANGE) and (last & ALPHA) and \
                (t & ALPHA):
            return False
        if (last & UPPER) and (t & ALPHA):
            return False  # UPPER→alpha never breaks ("ABCDef" is whole)
        if not self._has(SPLIT_ON_NUMERICS) and (
                ((last & ALPHA) and (t & DIGIT)) or
                ((last & DIGIT) and (t & ALPHA))):
            return False
        return True

    def _subwords(self, text: str, ct: list[int]
                  ) -> tuple[list[tuple[int, int]], int, int, bool]:
        """All subword slices + (start_bounds, end_bounds, final_poss)."""
        n = len(text)
        sb, eb = 0, n
        while sb < n and ct[sb] == SUBWORD_DELIM:
            sb += 1
        while eb > sb and ct[eb - 1] == SUBWORD_DELIM:
            eb -= 1
        final_poss = self._ends_with_poss(text, ct, eb, eb)
        out: list[tuple[int, int]] = []
        current, skip_poss = sb, False
        while True:
            if skip_poss:
                current += 2
                skip_poss = False
            last = 0
            while current < eb and ct[current] == SUBWORD_DELIM:
                current += 1
            if current >= eb:
                break
            last = ct[current]
            end = current + 1
            while end < eb:
                t = ct[end]
                if self._is_break(last, t):
                    break
                last = t
                end += 1
            out.append((current, end))
            if end < eb - 1 and self._ends_with_poss(text, ct, end + 2, eb):
                skip_poss = True
            current = end
        return out, sb, eb, final_poss

    # -- bufferWordParts port ------------------------------------------
    def _compute_parts(self, text: str
                       ) -> tuple[list[tuple[str, int]], int]:
        n = len(text)
        if n == 0:
            return [], 0
        ct = [_char_type(c) for c in text]
        subs, sb, eb, final_poss = self._subwords(text, ct)
        if not subs:  # all delimiters
            if self._has(PRESERVE_ORIGINAL):
                return [(text, 0)], 1
            return [], 1
        s0, e0 = subs[0]
        if (s0 == 0 and e0 == n) or text in self.protected:
            return [(text, 0)], 1  # pass-through (incrementToken fast path)

        single_word = (s0 == sb and
                       e0 == (eb - 2 if final_poss else eb))
        parts: list[tuple[str, int]] = []
        word_pos = 0
        if self._has(PRESERVE_ORIGINAL):
            parts.append((text, 0))
        if single_word:
            parts.append((text[s0:e0], word_pos))
            word_pos += 1
        else:
            concat: dict | None = None
            concat_all: dict | None = None
            last_concat_count = 0

            def should_generate(wt: int) -> bool:
                return ((self._has(GENERATE_WORD_PARTS) and (wt & ALPHA)) or
                        (self._has(GENERATE_NUMBER_PARTS) and (wt & DIGIT)))

            def flush(c: dict) -> None:
                nonlocal word_pos, last_concat_count
                if word_pos == c["start_pos"]:
                    word_pos += 1
                last_concat_count = c["count"]
                if c["count"] != 1 or not should_generate(c["type"]):
                    parts.append(("".join(c["terms"]), c["start_pos"]))

            for s, e in subs:
                wt = _subword_type(ct[s])
                if concat is not None and (concat["type"] & wt) == 0:
                    flush(concat)
                    concat = None
                want_cat = ((self._has(CATENATE_WORDS) and (wt & ALPHA)) or
                            (self._has(CATENATE_NUMBERS) and (wt & DIGIT)))
                if want_cat:
                    if concat is None:
                        concat = {"type": wt, "start_pos": word_pos,
                                  "terms": [], "count": 0}
                    concat["terms"].append(text[s:e])
                    concat["count"] += 1
                if self._has(CATENATE_ALL):
                    if concat_all is None:
                        concat_all = {"type": wt, "start_pos": word_pos,
                                      "terms": [], "count": 0}
                    concat_all["terms"].append(text[s:e])
                    concat_all["count"] += 1
                if should_generate(wt):
                    parts.append((text[s:e], word_pos))
                    word_pos += 1
            if concat is not None and concat["count"]:
                flush(concat)
            if concat_all is not None and concat_all["count"]:
                if concat_all["count"] > last_concat_count:
                    if word_pos == concat_all["start_pos"]:
                        word_pos += 1
                    parts.append(("".join(concat_all["terms"]),
                                  concat_all["start_pos"]))
        if self._has(PRESERVE_ORIGINAL) and word_pos == 0:
            word_pos = 1
        parts.sort(key=lambda p: p[1])
        return parts, word_pos

    def parts(self, token: str) -> tuple[list[tuple[str, int]], int]:
        hit = self._cache.get(token)
        if hit is None:
            hit = self._compute_parts(token)
            if len(self._cache) < 1_000_000:
                self._cache[token] = hit
        return hit


class WordDelimiterAnalyzer:
    """whitespace tokenizer → WordDelimiterGraphFilter → LowerCaseFilter."""

    def __init__(self, flags: int = DEFAULT_FLAGS,
                 protected: frozenset[str] = frozenset(),
                 lowercase: bool = True):
        self.filter = WordDelimiterFilter(flags, protected)
        self.lowercase = lowercase
        self.name = f"worddelim_{flags}"

    def __call__(self, text: str) -> list[str]:
        out: list[str] = []
        for tok in text.split():
            for term, _ in self.filter.parts(tok)[0]:
                out.append(term.lower() if self.lowercase else term)
        return out

    def analyze_flat(self, texts):
        if isinstance(texts, list):
            texts = pa.array(texts, pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        split = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        # utf8_split_whitespace emits empty strings around runs; drop them
        flat_all = pc.list_flatten(split)
        tok_doc_all = pc.list_parent_indices(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
        flat = flat_all.filter(pa.array(nonempty))
        tok_doc = tok_doc_all[nonempty]
        if len(flat) == 0:
            return (np.zeros(n_docs, np.int64), pa.array([], pa.string()),
                    np.empty(0, np.int64), np.empty(0, np.int64))

        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64)
        vocab = dict_arr.dictionary.to_pylist()
        uparts = [self.filter.parts(t) for t in vocab]
        k_u = np.array([len(p[0]) for p in uparts], np.int64)
        span_u = np.array([p[1] for p in uparts], np.int64)
        terms_u: list[str] = []
        rel_list: list[int] = []
        for plist, _ in uparts:
            for term, rel in plist:
                terms_u.append(term.lower() if self.lowercase else term)
                rel_list.append(rel)
        rel_u = np.array(rel_list, np.int64)
        off_u = np.cumsum(k_u) - k_u

        tok_k = k_u[codes]
        tok_span = span_u[codes]
        # base position of each source token within its doc
        cs = np.cumsum(tok_span) - tok_span
        first_idx = np.searchsorted(tok_doc, np.arange(n_docs))
        # docs with no tokens point past the end; guard with clip
        doc_base = cs[np.clip(first_idx, 0, len(cs) - 1)]
        base = cs - doc_base[tok_doc]

        total = int(tok_k.sum())
        emit_tok = np.repeat(np.arange(len(codes)), tok_k)
        within = np.arange(total, dtype=np.int64) - \
            np.repeat(np.cumsum(tok_k) - tok_k, tok_k)
        src = off_u[codes[emit_tok]] + within
        flat_terms = pa.array(np.asarray(terms_u, dtype=object)[src],
                              pa.string()) if total else \
            pa.array([], pa.string())
        pos = base[emit_tok] + rel_u[src]
        doc_of = tok_doc[emit_tok]
        order = np.lexsort((pos, doc_of))
        flat_terms = flat_terms.take(pa.array(order))
        doc_of, pos = doc_of[order], pos[order]
        lengths = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        return lengths, flat_terms, doc_of, pos
