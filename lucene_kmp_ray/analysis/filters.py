"""Misc token filters in the pluggable analyzer slot: ASCIIFolding,
Shingle, SynonymGraph (single-token subset).

Reference semantics:

- ``ASCIIFoldingFilter`` (``analysis/common/.../miscellaneous/
  ASCIIFoldingFilter.kt``): fold Unicode Latin variants to their ASCII
  equivalents. Re-expressed as NFKD-decompose + strip combining marks,
  plus a supplement table for the non-decomposable mappings the
  reference's big switch carries (æ→ae, ø→o, ß→ss, œ→oe, đ→d, þ→th,
  typographic quotes/dashes). Characters with no ASCII mapping pass
  through unchanged, as in the reference.
- ``ShingleFilter`` (``analysis/common/.../shingle/ShingleFilter.kt``,
  defaults min=max=2, separator " ", outputUnigrams=true): per input
  token emit the unigram then every shingle of sizes min..max STARTING at
  it (posIncr 0 — shingles share the first token's position; vectors
  from ``TestShingleAnalyzerWrapper.kt:144``).
- ``SynonymGraphFilter`` (``analysis/common/.../synonym/
  SynonymGraphFilter.kt``): SINGLE-TOKEN rules only (a → b, c injected
  at the SAME position, posIncr=0, original kept when keep_orig) — the
  posLength>1 multi-word graph side is out of scope and documented.
  Injected tokens count toward the norm length exactly as the
  reference's FieldInvertState.length counts every emitted token.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa

from .standard import StandardAnalyzer

_SUPPLEMENT = {
    "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "ß": "ss", "œ": "oe",
    "Œ": "OE", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D", "þ": "th",
    "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H", "ı": "i",
    "ŋ": "n", "Ŋ": "N", "’": "'", "‘": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"', "‐": "-", "‑": "-", "–": "-",
    "—": "-",
}


def fold_to_ascii(s: str) -> str:
    """ASCIIFoldingFilter fold for one token."""
    if s.isascii():
        return s
    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sup = _SUPPLEMENT.get(ch)
        if sup is not None:
            out.append(sup)
            continue
        d = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in d if not unicodedata.combining(c))
        out.append(kept if kept and kept.isascii() else ch)
    return "".join(out)


def _fold_flat(flat: pa.Array) -> pa.Array:
    """Fold a flat token array per UNIQUE token (dictionary encode)."""
    dict_arr = flat.dictionary_encode()
    folded = pa.array([fold_to_ascii(t) for t in
                       dict_arr.dictionary.to_pylist()], pa.string())
    return pa.DictionaryArray.from_arrays(dict_arr.indices, folded) \
        .cast(pa.string())


class ASCIIFoldingAnalyzer:
    """base analyzer → ASCIIFoldingFilter."""

    def __init__(self, base=None):
        self.base = base or StandardAnalyzer()
        self.name = f"asciifold_{self.base.name}"

    def __call__(self, text: str) -> list[str]:
        return [fold_to_ascii(t) for t in self.base(text)]

    def analyze_flat(self, texts):
        dl, flat, doc_of, pos = self.base.analyze_flat(texts)
        if len(flat) == 0:
            return dl, flat, doc_of, pos
        return dl, _fold_flat(flat), doc_of, pos


class ShingleAnalyzer:
    """base analyzer → ShingleFilter(min_n, max_n)."""

    def __init__(self, base=None, min_n: int = 2, max_n: int = 2,
                 output_unigrams: bool = True, sep: str = " "):
        if not 2 <= min_n <= max_n:
            raise ValueError("need 2 <= min_n <= max_n")
        self.base = base or StandardAnalyzer()
        self.min_n, self.max_n = min_n, max_n
        self.output_unigrams = output_unigrams
        self.sep = sep
        self.name = f"shingle_{min_n}_{max_n}_{self.base.name}"

    def __call__(self, text: str) -> list[str]:
        toks = self.base(text)
        out: list[str] = []
        for i, t in enumerate(toks):
            if self.output_unigrams:
                out.append(t)
            for n in range(self.min_n, self.max_n + 1):
                if i + n <= len(toks):
                    out.append(self.sep.join(toks[i:i + n]))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc
        dl, flat, doc_of, pos = self.base.analyze_flat(texts)
        n = len(flat)
        if n == 0:
            return dl, flat, doc_of, pos
        parts = [(flat, doc_of, pos)] if self.output_unigrams else []
        for size in range(self.min_n, self.max_n + 1):
            m = n - (size - 1)
            if m <= 0:
                continue
            valid = doc_of[:m] == doc_of[size - 1:]
            # shingles join only tokens at CONSECUTIVE positions of one
            # doc (the base stream has no gaps for StandardAnalyzer; a
            # stop-filtered base would need the filler-token rule)
            valid &= (pos[size - 1:] - pos[:m]) == (size - 1)
            joined = pc.binary_join_element_wise(
                *[flat.slice(i, m) for i in range(size)], self.sep)
            vmask = pa.array(valid)
            parts.append((joined.filter(vmask), doc_of[:m][valid],
                          pos[:m][valid]))
        flat2 = pa.concat_arrays(
            [p[0].combine_chunks() if isinstance(p[0], pa.ChunkedArray)
             else p[0] for p in parts])
        doc2 = np.concatenate([p[1] for p in parts])
        pos2 = np.concatenate([p[2] for p in parts])
        order = np.lexsort((pos2, doc2))
        flat2 = flat2.take(pa.array(order))
        doc2, pos2 = doc2[order], pos2[order]
        norm_lengths = np.bincount(doc2, minlength=len(dl)).astype(np.int64)
        return norm_lengths, flat2, doc2, pos2


class SynonymAnalyzer:
    """base analyzer → SynonymGraphFilter (single-token rules): each rule
    ``term -> (syn, ...)`` injects the synonyms at the SAME position."""

    def __init__(self, synonyms: dict[str, tuple[str, ...]], base=None,
                 keep_orig: bool = True):
        self.base = base or StandardAnalyzer()
        self.synonyms = {k: tuple(v) for k, v in synonyms.items()}
        self.keep_orig = keep_orig
        self.name = f"synonym_{self.base.name}"

    def __call__(self, text: str) -> list[str]:
        out: list[str] = []
        for t in self.base(text):
            syns = self.synonyms.get(t)
            if syns is None:
                out.append(t)
            else:
                if self.keep_orig:
                    out.append(t)
                out.extend(syns)
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc
        dl, flat, doc_of, pos = self.base.analyze_flat(texts)
        n = len(flat)
        if n == 0 or not self.synonyms:
            return dl, flat, doc_of, pos
        keys = pa.array(sorted(self.synonyms), pa.string())
        hit = pc.is_in(flat, value_set=keys).to_numpy(zero_copy_only=False)
        if not hit.any():
            return dl, flat, doc_of, pos
        parts_tok: list[pa.Array] = []
        parts_doc: list[np.ndarray] = []
        parts_pos: list[np.ndarray] = []
        if self.keep_orig:
            parts_tok.append(flat.combine_chunks() if
                             isinstance(flat, pa.ChunkedArray) else flat)
            parts_doc.append(doc_of)
            parts_pos.append(pos)
        else:
            keep = pa.array(~hit)
            parts_tok.append(flat.filter(keep).combine_chunks())
            parts_doc.append(doc_of[~hit])
            parts_pos.append(pos[~hit])
        for term, syns in self.synonyms.items():
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            d, p = doc_of[m], pos[m]
            for s in syns:  # injected at the SAME position (posIncr 0)
                parts_tok.append(pa.array([s] * len(d), pa.string()))
                parts_doc.append(d)
                parts_pos.append(p)
        flat2 = pa.concat_arrays(parts_tok)
        doc2 = np.concatenate(parts_doc)
        pos2 = np.concatenate(parts_pos)
        order = np.lexsort((pos2, doc2))
        flat2 = flat2.take(pa.array(order))
        doc2, pos2 = doc2[order], pos2[order]
        norm_lengths = np.bincount(doc2, minlength=len(dl)).astype(np.int64)
        return norm_lengths, flat2, doc2, pos2


class CommonGramsAnalyzer:
    """base analyzer → CommonGramsFilter: alongside every unigram, a
    '_'-joined bigram is emitted (at the LEFT token's position,
    positionLength 2) whenever either side is a common word — the
    reference's stop-word-preserving phrase-speedup filter
    (``analysis/common/.../commongrams/CommonGramsFilter.kt``; common
    words stay in the stream, unlike StopFilter)."""

    SEPARATOR = "_"

    def __init__(self, base=None, common_words=None):
        from .standard import ENGLISH_STOP_WORDS, StandardAnalyzer
        self.base = base or StandardAnalyzer()
        self.common = frozenset(common_words
                                if common_words is not None
                                else ENGLISH_STOP_WORDS)
        self.name = f"commongrams_{self.base.name}"

    def __call__(self, text: str) -> list[str]:
        toks = self.base(text)
        out: list[str] = []
        for i, t in enumerate(toks):
            if i > 0 and (toks[i - 1] in self.common
                          or t in self.common):
                out.append(toks[i - 1] + self.SEPARATOR + t)
            out.append(t)
        return out

    def analyze_flat(self, texts):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        dl, flat, doc_of, pos = self.base.analyze_flat(texts)
        n = len(flat)
        if n == 0:
            return dl, flat, doc_of, pos
        same_doc = doc_of[1:] == doc_of[:-1]
        is_common = pc.is_in(flat, value_set=pa.array(
            sorted(self.common), pa.string())).to_numpy(
                zero_copy_only=False)
        gram_at = same_doc & (is_common[:-1] | is_common[1:])
        left = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n),
            self.SEPARATOR)
        g_idx = np.flatnonzero(gram_at)
        grams = left.take(pa.array(g_idx))
        # grams sit at the LEFT token's position
        out_flat = pa.concat_arrays([flat.combine_chunks()
                                     if isinstance(flat, pa.ChunkedArray)
                                     else flat, grams])
        out_doc = np.concatenate([doc_of, doc_of[g_idx]])
        out_pos = np.concatenate([pos, pos[g_idx]])
        order = np.lexsort((out_pos, out_doc))
        out_flat = out_flat.take(pa.array(order))
        new_dl = dl + np.bincount(doc_of[g_idx], minlength=len(dl))
        return (new_dl.astype(np.int64), out_flat,
                out_doc[order], out_pos[order])


def common_grams_query_filter(tokens: list[str], common_words,
                              separator: str = "_") -> list[str]:
    """CommonGramsQueryFilter [ref: commongrams/CommonGramsQueryFilter
    .kt]: the query-side of CommonGrams — output bigrams whenever
    possible; a unigram survives only when it is NOT followed by its
    own bigram and is not the trailing member of the final bigram
    (TestCommonGramsFilter.testCommonGramsQueryFilter's full s/n
    vector table: "the fox" -> [the_fox]; "the quick brown" ->
    [the_quick, quick, brown]; "n s n" -> [n_s, s_n])."""
    cw = frozenset(common_words)
    n = len(tokens)
    out: list[str] = []
    for i, t in enumerate(tokens):
        gram_after = i + 1 < n and (t in cw or tokens[i + 1] in cw)
        gram_before = i > 0 and (tokens[i - 1] in cw or t in cw)
        if not gram_after and not (i == n - 1 and gram_before):
            out.append(t)
        if gram_after:
            out.append(t + separator + tokens[i + 1])
    return out


class CommonGramsQueryAnalyzer:
    """base analyzer → CommonGramsFilter → CommonGramsQueryFilter (the
    query-time pairing of CommonGramsAnalyzer)."""

    def __init__(self, base=None, common_words=None):
        from .standard import ENGLISH_STOP_WORDS, StandardAnalyzer
        self.base = base or StandardAnalyzer()
        self.common = frozenset(common_words
                                if common_words is not None
                                else ENGLISH_STOP_WORDS)
        self.name = f"commongrams_query_{self.base.name}"

    def __call__(self, text: str) -> list[str]:
        return common_grams_query_filter(self.base(text), self.common)


class PatternTokenizerAnalyzer:
    """PatternTokenizer (``analysis/common/.../pattern/
    PatternTokenizer.kt``): group 0 → tokens are the regex MATCHES,
    group -1 → the text is SPLIT on matches (empty pieces dropped).
    An optional lowercase mirrors the usual PatternAnalyzer wiring."""

    def __init__(self, pattern: str, group: int = -1,
                 lowercase: bool = True):
        import re
        if group not in (-1, 0):
            raise ValueError("PatternTokenizer supports group 0 or -1")
        self.pattern = re.compile(pattern)
        self.group = group
        self.lowercase = lowercase
        self.name = f"pattern_{group}_{pattern!r}"

    def __call__(self, text: str) -> list[str]:
        if self.group == 0:
            toks = [m.group(0) for m in self.pattern.finditer(text)
                    if m.group(0)]
        else:
            toks = [t for t in self.pattern.split(text) if t]
        if self.lowercase:
            import pyarrow as pa
            import pyarrow.compute as pc
            if toks:
                toks = pc.utf8_lower(
                    pa.array(toks, pa.string())).to_pylist()
        return toks

    def analyze_flat(self, texts):
        import numpy as np
        import pyarrow as pa
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        for i, t in enumerate(texts):
            toks = self(t or "")
            flat.extend(toks)
            doc_lengths[i] = len(toks)
        doc_of = np.repeat(np.arange(len(doc_lengths), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        return (doc_lengths, pa.array(flat, pa.string()), doc_of,
                positions)


class ReverseStringAnalyzer:
    """base analyzer → ReverseStringFilter (``analysis/common/.../
    reverse/ReverseStringFilter.kt``): every token reversed, with an
    optional marker char APPENDED before reversal (so it leads the
    emitted term) — the classic leading-wildcard acceleration trick
    (index reversed terms, rewrite ``*suffix`` to a reversed-field
    prefix query)."""

    def __init__(self, base=None, marker: str | None = None):
        from .standard import StandardAnalyzer
        if marker is not None and len(marker) != 1:
            raise ValueError("marker must be one char")
        self.base = base or StandardAnalyzer()
        self.marker = marker
        self.name = f"reverse_{self.base.name}"

    def _rev(self, t: str) -> str:
        if self.marker is not None:
            t = t + self.marker
        return t[::-1]

    def __call__(self, text: str) -> list[str]:
        return [self._rev(t) for t in self.base(text)]

    def analyze_flat(self, texts):
        import pyarrow as pa
        dl, flat, doc_of, pos = self.base.analyze_flat(texts)
        if len(flat) == 0:
            return dl, flat, doc_of, pos
        dict_arr = flat.dictionary_encode()
        rev = pa.array([self._rev(t) for t in
                        dict_arr.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict_arr.indices, rev) \
            .cast(pa.string())
        return dl, flat, doc_of, pos
