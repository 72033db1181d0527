"""StandardAnalyzer-equivalent tokenization.

The reference chain is StandardTokenizer (UAX#29 word break) → LowerCaseFilter
→ StopFilter with an EMPTY default stop set
(``/root/reference/core/.../analysis/standard/StandardAnalyzer.kt:16,37,47-55``),
max token length 255 with over-long tokens split
(``StandardAnalyzer.kt:67``, ``StandardTokenizer.kt:105``).

We implement the UAX#29 word-break rules with a grammar that is forward-only
(no lookarounds), hence expressible identically in Python ``re`` and in
DuckDB's RE2, so the driver's SQL oracle reproduces tokenization exactly:

    Lrun  := L M* ( (MidLetter|MidNumLet|SQ) M* L M* )*
    Drun  := D M* ( (MidNum|MidNumLet|SQ)   M* D M* )*
    Urun  := ExtendNumLet M*
    token := ( Lrun | Drun | Urun )+

where L = letters (incl. Nl/No), D = decimal digits (Nd), M = combining
marks (UAX#29 Extend, WB4-transparent around joiners). This encodes the
full Mid* rule set of ``StandardTokenizerImpl.kt:11-32``: WB6/7 (MidLetter
``:`` and MidNumLet ``.``/``’`` and Single_Quote ``'`` join LETTERS on both
sides), WB11/12 (MidNum ``,``/``;`` and MidNumLet/SQ join NUMERICS on both
sides), WB5/8/9/10 (letter/digit runs concatenate directly — the ``+``),
WB13a/b (ExtendNumLet ``_`` bridges any runs). So ``can't``, ``A:B``,
``example.com``, ``3.14``, ``1,000`` and ``216.239.63.104`` are single
tokens while ``A::B``, ``1,,2``, ``A.:B`` and ``R2.D2`` split — conformance
vectors from ``TestStandardAnalyzer.kt`` testMid (line 397) are asserted in
tests/test_analysis.py.

CJK segmentation follows the reference's StandardTokenizer grammar
(``StandardTokenizerImpl.kt:11-32`` token types; conformance vectors from
``TestStandardAnalyzer.kt`` testChinese/testJapanese/testKorean):

- Han ideographs and Hiragana emit ONE TOKEN PER CHARACTER
  (<IDEOGRAPHIC>/<HIRAGANA> — "我是中国人" → 我 是 中 国 人,
  "仮名遣い" → 仮 名 遣 い);
- Katakana and Hangul emit RUNS ("カタカナ" → カタカナ,
  "훈민정음" → 훈민정음).

Both the numpy scanner and the regex/SQL fallbacks implement this by the
same rule (the fallbacks space-isolate CJK first, then run the word regex —
semantically identical, asserted in tests). Combining marks (Mn/Mc —
Thai/Lao vowels and tone marks, Cyrillic accents, Arabic harakat, the
LUCENE-1545 'moͤchte' case) EXTEND the preceding token per UAX#29's Extend
rule: they continue word runs, Katakana/Hangul runs and even per-char CJK
singles ("壹゙" stays one token, testCombiningMarks) but never start a
token. Emoji tokenize per the <EMOJI> grammar (regional-indicator pairs,
keycaps, pictograph ZWJ/modifier/VS16 chains — reference vectors
asserted). Remaining deviation from full UAX#29 (documented): Format (Cf)
characters — ZWNJ, soft hyphen — are treated as separators rather than
WB4-transparent; web text that survives HTML extraction essentially never
carries them mid-word. Tokens are lowercased after segmentation (no-op for
CJK/emoji).

The query side MUST use the same functions (QueryBuilder semantics,
``/root/reference/core/.../util/QueryBuilder.kt:45``).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.kt:67

_MARKS_CLASS: str | None = None


def _marks_class() -> str:
    """Regex character class of the BMP combining marks (Mn/Mc) — the
    UAX#29 Extend set this engine honors. Generated once per process from
    unicodedata so the Python regex agrees with RE2's Mn/Mc properties."""
    global _MARKS_CLASS
    if _MARKS_CLASS is None:
        import unicodedata
        ranges = []
        lo = None
        prev = None
        for c in range(0x10000):
            if unicodedata.category(chr(c)) in ("Mn", "Mc"):
                if lo is None:
                    lo = c
                prev = c
            elif lo is not None:
                ranges.append((lo, prev))
                lo = None
        if lo is not None:
            ranges.append((lo, prev))
        _MARKS_CLASS = "".join(f"\\u{a:04X}-\\u{b:04X}" if b > a
                               else f"\\u{a:04X}" for a, b in ranges)
    return _MARKS_CLASS


# Emoji segmentation (the <EMOJI> token type, StandardTokenizerImpl
# grammar; conformance vectors TestStandardAnalyzer.kt:444-505): regional
# indicator PAIRS, keycap sequences, and pictograph ZWJ chains with skin
# modifiers / VS16 / tag sequences. BMP pictographs force the scanner's
# slow path (astral ones do already), so all paths agree.
EMOJI_PICT_BMP = ((0x2600, 0x27BF), (0x2B00, 0x2BFF))
EMOJI_PICT_ASTRAL = ((0x1F000, 0x1FAFF),)
EMOJI_MOD = ((0x1F3FB, 0x1F3FF),)       # skin tones
EMOJI_TAGS = ((0xE0020, 0xE007F),)      # tag sequences (flag of Scotland)
EMOJI_RI = ((0x1F1E6, 0x1F1FF),)        # regional indicators


def _emoji_pattern(re2: bool = False) -> str:
    r = _ranges_re2 if re2 else lambda rs: _ranges_re(
        tuple((a, b) for a, b in rs if b < 0x10000),
        tuple((a, b) for a, b in rs if b >= 0x10000))
    pict = r(EMOJI_PICT_BMP + EMOJI_PICT_ASTRAL)
    mod = r(EMOJI_MOD)
    tags = r(EMOJI_TAGS)
    ri = r(EMOJI_RI)
    vs = "\\x{FE0F}" if re2 else "\\uFE0F"
    zwj = "\\x{200D}" if re2 else "\\u200D"
    keycap_mark = "\\x{20E3}" if re2 else "\\u20E3"
    elem = f"[{pict}](?:[{mod}]|{vs})*(?:[{tags}]+)?"
    return (f"[{ri}][{ri}]"
            f"|[0-9#*]{vs}?{keycap_mark}"
            f"|{elem}(?:{zwj}{elem})*")


# UAX#29 WordBreak property sets (Unicode 9, the version the reference's
# JFlex-generated StandardTokenizerImpl targets; WordBreakProperty.txt):
SINGLE_QUOTE = (0x0027,)                       # WB: Single_Quote
MIDNUMLET = (0x002E, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E)
MIDLETTER = (0x003A, 0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55,
             0xFF1A)
MIDNUM = (0x002C, 0x003B, 0x037E, 0x060C, 0x060D, 0x066C, 0x07F8,
          0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B)
EXTENDNUMLET = (0x005F, 0x203F, 0x2040, 0x2054, 0xFE33, 0xFE34, 0xFE4D,
                0xFE4E, 0xFE4F, 0xFF3F)


def _chars_class(cps, re2: bool = False) -> str:
    if re2:
        return "".join(f"\\x{{{c:04X}}}" for c in cps)
    return "".join(f"\\u{c:04X}" for c in cps)


_PY_TOKEN_RE_CACHE: "re.Pattern | None" = None


def _word_pattern(re2: bool = False) -> str:
    """The forward-only UAX#29 word grammar (module docstring): letter
    runs joined by MidLetter/MidNumLet/SQ, digit runs joined by
    MidNum/MidNumLet/SQ, ExtendNumLet bridges, marks WB4-transparent.
    Emitted in Python-`re` or RE2 syntax from the SAME tables so the
    engine and the DuckDB oracle agree by construction."""
    cc = lambda cps: _chars_class(cps, re2)
    if re2:
        L = r"[\pL\p{Nl}\p{No}]"          # == Python [^\W\d_]
        D = r"\p{Nd}"                     # == Python \d
        M = r"\pM*"
    else:
        m = _marks_class()
        L = r"[^\W\d_]"
        D = r"\d"
        M = f"[{m}]*"
    lj = f"[{cc(MIDLETTER + MIDNUMLET + SINGLE_QUOTE)}]"
    dj = f"[{cc(MIDNUM + MIDNUMLET + SINGLE_QUOTE)}]"
    enl = f"[{cc(EXTENDNUMLET)}]"
    lrun = f"{L}{M}(?:{lj}{M}{L}{M})*"
    drun = f"{D}{M}(?:{dj}{M}{D}{M})*"
    urun = f"{enl}{M}"
    return f"(?:{lrun}|{drun}|{urun})+"


def _py_token_re() -> "re.Pattern":
    global _PY_TOKEN_RE_CACHE
    if _PY_TOKEN_RE_CACHE is None:
        _PY_TOKEN_RE_CACHE = re.compile(
            f"(?:{_emoji_pattern()})|(?:{_word_pattern()})", re.UNICODE)
    return _PY_TOKEN_RE_CACHE


def _sql_token_pattern() -> str:
    # \pM ≈ Mn+Mc+Me (Me is vanishingly rare in web text — enclosing
    # marks; the engine treats Me as a separator, RE2 extends with it:
    # the deliberate approximation is asserted equal on the vectors).
    return f"(?:{_emoji_pattern(re2=True)})|(?:{_word_pattern(re2=True)})"


SQL_TOKEN_PATTERN = None  # built lazily via _sql_token_pattern()

# CJK codepoint ranges (StandardTokenizerImpl grammar). SINGLE = one token
# per char (Han + Hiragana, <IDEOGRAPHIC>/<HIRAGANA>); RUN = maximal runs
# (Katakana + Hangul, <KATAKANA>/<HANGUL>).
# hiragana range excludes U+3099/309A (combining sound marks — they are
# UAX#29 Extend, not token starters)
CJK_SINGLE_RANGES = ((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
                     (0x3040, 0x3098), (0x309B, 0x309F))
CJK_SINGLE_ASTRAL = ((0x20000, 0x2FA1F),)  # CJK Ext B+ (slow path only)
CJK_KATAKANA_RANGES = ((0x30A0, 0x30FF), (0x31F0, 0x31FF))
CJK_HANGUL_RANGES = ((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F))


def _ranges_re(ranges, astral=()):
    return "".join(f"\\u{lo:04X}-\\u{hi:04X}" for lo, hi in ranges) + \
        "".join(f"\\U{lo:08X}-\\U{hi:08X}" for lo, hi in astral)


def _cjk_res():
    """CJK isolation regexes, marks-aware (lazy: needs _marks_class).
    Runs swallow interleaved marks; a single takes its TRAILING marks
    along (壹゙ stays one token, testCombiningMarks)."""
    global _CJK_RUN_RE, _CJK_SINGLE_RE
    if _CJK_RUN_RE is None:
        m = _marks_class()
        _CJK_RUN_RE = re.compile(
            f"([{_ranges_re(CJK_KATAKANA_RANGES)}]"
            f"(?:[{_ranges_re(CJK_KATAKANA_RANGES)}{m}])*"
            f"|[{_ranges_re(CJK_HANGUL_RANGES)}]"
            f"(?:[{_ranges_re(CJK_HANGUL_RANGES)}{m}])*)")
        _CJK_SINGLE_RE = re.compile(
            f"([{_ranges_re(CJK_SINGLE_RANGES, CJK_SINGLE_ASTRAL)}]"
            f"[{m}]*)")
    return _CJK_RUN_RE, _CJK_SINGLE_RE


_CJK_RUN_RE = None
_CJK_SINGLE_RE = None


_CJK_ANY_RE = re.compile(
    f"[{_ranges_re(CJK_SINGLE_RANGES + CJK_KATAKANA_RANGES + CJK_HANGUL_RANGES, CJK_SINGLE_ASTRAL)}]")


def _pre_cjk(s: str) -> str:
    """Space-isolate CJK per the grammar (runs whole, singles per char) so
    the plain word regex then tokenizes them as separate 'words' — the
    regex-engine-portable form of the scanner's class transitions (RE2 has
    no lookarounds or class subtraction, so the word class cannot simply
    exclude CJK)."""
    run_re, sgl_re = _cjk_res()
    return sgl_re.sub(r" \1 ", run_re.sub(r" \1 ", s))


def _ranges_re2(ranges) -> str:
    return "".join(f"\\x{{{lo:04X}}}-\\x{{{hi:04X}}}" for lo, hi in ranges)


def sql_tokens_expr(col: str = "text") -> str:
    """DuckDB expression: list of lowercased tokens of `col` (oracle side).
    Mirrors tokenize(): CJK space-isolation replaces, then the word regex."""
    pat = _sql_token_pattern().replace("'", "''")
    kata = _ranges_re2(CJK_KATAKANA_RANGES)
    hang = _ranges_re2(CJK_HANGUL_RANGES)
    run_pat = (f"([{kata}](?:[{kata}]|\\pM)*"
               f"|[{hang}](?:[{hang}]|\\pM)*)")
    sgl_pat = (f"([{_ranges_re2(CJK_SINGLE_RANGES + CJK_SINGLE_ASTRAL)}]"
               f"\\pM*)")
    pre = (f"regexp_replace(regexp_replace({col}, '{run_pat}', ' \\1 ', "
           f"'g'), '{sgl_pat}', ' \\1 ', 'g')")
    return (f"list_transform(regexp_extract_all({pre}, '{pat}'), "
            f"t -> lower(t))")


def sql_tokens_expr_raw(col: str = "text") -> str:
    """Raw-case variant of sql_tokens_expr, for chains whose filters are
    case-sensitive (IrishLowerCaseFilter) and lowercase mid-chain."""
    expr = sql_tokens_expr(col)
    assert expr.endswith(", t -> lower(t))")
    return expr[len("list_transform("):-len(", t -> lower(t))")]


def fold_case(s: str) -> str:
    """The index's case mapping for one string (Arrow utf8_lower — simple
    Unicode case mapping, NOT Python str.lower; see tokenize())."""
    import pyarrow.compute as pc
    return pc.utf8_lower(pa.array([s], type=pa.string()))[0].as_py()


def tokenize(text: str) -> list[str]:
    """Lowercased token list for one document (index- and query-side).

    Lowercasing uses Arrow's ``utf8_lower`` (simple Unicode case mapping) —
    the SAME kernel the batch tokenizer and the DuckDB oracle use — so the
    query side, the dedup shingles and the index agree on every codepoint
    (Python's ``str.lower`` differs on e.g. 'İ', which would silently break
    index/query parity)."""
    import pyarrow.compute as pc
    if _CJK_ANY_RE.search(text):
        text = _pre_cjk(text)
    out = []
    for tok in _py_token_re().findall(text):
        if len(tok) > MAX_TOKEN_LENGTH:  # over-long tokens split, not dropped
            out.extend(tok[i:i + MAX_TOKEN_LENGTH]
                       for i in range(0, len(tok), MAX_TOKEN_LENGTH))
        else:
            out.append(tok)
    if not out:
        return out
    return pc.utf8_lower(pa.array(out, type=pa.string())).to_pylist()


class StandardAnalyzer:
    """Callable analyzer object (pluggable per-lang slot, SURVEY §2.2).

    The batch interface ``analyze_flat(texts)`` returns the quadruple the
    inverter consumes: ``(norm_lengths, flat_tokens, doc_of, positions)``
    where ``norm_lengths[i]`` is doc i's indexed-token count (the norm
    length, FieldInvertState.length), ``flat_tokens`` the occurrence-major
    token array, ``doc_of``/``positions`` each occurrence's doc index and
    original in-doc position (filters that drop tokens leave position
    holes, exactly like StopFilter's position-increment gaps).
    """

    name = "standard"

    def __call__(self, text: str) -> list[str]:
        return tokenize(text)

    def analyze_flat(self, texts):
        doc_lengths, flat = tokenize_flat(texts)
        doc_of = np.repeat(np.arange(len(doc_lengths), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        return doc_lengths, flat, doc_of, positions


# Lucene's classic English stop set (EnglishAnalyzer default,
# analysis/en/EnglishAnalyzer.kt / StandardAnalyzer's STOP_WORDS list).
ENGLISH_STOP_WORDS = frozenset("""
a an and are as at be but by for if in into is it no not of on or such that
the their then there these they this to was will with
""".split())


class EnglishAnalyzer:
    """StandardTokenizer → LowerCase → possessive-'s strip → English stop
    set → PorterStemmer (the reference's EnglishAnalyzer chain,
    ``analysis/common/.../en/EnglishAnalyzer.kt``: EnglishPossessiveFilter +
    StopFilter + PorterStemFilter). The stemmer runs per *unique* token of
    the batch (dictionary encode first), not per occurrence.
    """

    name = "english"

    def __init__(self, stop_words=ENGLISH_STOP_WORDS):
        self.stop_set = frozenset(stop_words)
        self.stop = sorted(self.stop_set)

    def _stem_array(self, arr: pa.Array) -> pa.Array:
        from .porter import porter_stem
        dict_arr = arr.dictionary_encode()
        stemmed = pa.array([porter_stem(t) for t in
                            dict_arr.dictionary.to_pylist()], pa.string())
        return pa.DictionaryArray.from_arrays(dict_arr.indices, stemmed) \
            .cast(pa.string())

    def __call__(self, text: str) -> list[str]:
        from .porter import porter_stem
        out = []
        for t in tokenize(text):
            if t.endswith("'s") or t.endswith("’s"):
                t = t[:-2]
            if t and t not in self.stop_set:  # the instance's set, both paths
                out.append(porter_stem(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        flat = pc.replace_substring_regex(flat, pattern="['’]s$",
                                          replacement="")
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(
            self.stop + [""], pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_of = doc_of[mask]
        positions = positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        return norm_lengths, self._stem_array(flat), doc_of, positions


# ---- vectorized batch tokenizer -----------------------------------------
# Character classes for the numpy scan, derived FROM the same tables as the
# regex so the two tokenizers agree by construction: 1 = letter, 2 = decimal
# digit (Nd), 3 = ExtendNumLet, 4 = Katakana (runs), 5 = Hangul (runs),
# 6 = Han/Hiragana (one token per char), 7 = combining mark (Extend),
# 8 = MidNumLet/Single_Quote (joins letter-letter OR digit-digit),
# 9 = MidLetter (letter-letter), 10 = MidNum (digit-digit). BMP table built
# lazily once per process (once-per-actor state, SURVEY §2.3).
_CLS_LIMIT = 0x10000
_CLS_TABLE: np.ndarray | None = None


def _cls_table() -> np.ndarray:
    global _CLS_TABLE
    if _CLS_TABLE is None:
        letter_re = re.compile(r"[^\W\d_]", re.UNICODE)
        digit_re = re.compile(r"\d", re.UNICODE)
        t = np.zeros(_CLS_LIMIT + 1, dtype=np.uint8)
        # chr() over the BMP once (~20ms, amortized per worker process)
        t[:_CLS_LIMIT] = np.frombuffer(
            bytes(1 if letter_re.match(chr(c)) else
                  (2 if digit_re.match(chr(c)) else 0)
                  for c in range(_CLS_LIMIT)), dtype=np.uint8)
        for c in EXTENDNUMLET:
            t[c] = 3
        for c in MIDNUMLET + SINGLE_QUOTE:
            t[c] = 8
        for c in MIDLETTER:
            t[c] = 9
        for c in MIDNUM:
            t[c] = 10
        for cls, ranges in ((4, CJK_KATAKANA_RANGES),
                            (5, CJK_HANGUL_RANGES),
                            (6, CJK_SINGLE_RANGES)):
            for lo, hi in ranges:
                t[lo:hi + 1] = cls
        import unicodedata
        # UAX#29 Extend LAST: marks override range membership (U+3099/309A
        # sit inside the Hiragana block but are combining marks)
        for c in range(_CLS_LIMIT):
            if unicodedata.category(chr(c)) in ("Mn", "Mc"):
                t[c] = 7
        # BMP emoji machinery → class 254: any occurrence routes the batch
        # to the regex path (astral pictographs do so via the astral check)
        for lo, hi in EMOJI_PICT_BMP:
            t[lo:hi + 1] = 254
        for c in (0xFE0F, 0x200D, 0x20E3):
            t[c] = 254
        t[_CLS_LIMIT] = 255  # sentinel: astral char → slow path
        _CLS_TABLE = t
    return _CLS_TABLE


def _tokenize_flat_slow(texts, lower=True) -> tuple[np.ndarray, pa.Array]:
    """Per-doc regex fallback (exact reference of the fast path)."""
    import pyarrow.compute as pc
    doc_lengths = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    findall = _py_token_re().findall
    maxlen = MAX_TOKEN_LENGTH
    for i, text in enumerate(texts):
        text = text or ""
        if _CJK_ANY_RE.search(text):
            text = _pre_cjk(text)
        toks = findall(text)
        if toks and max(map(len, toks)) > maxlen:  # rare slow path
            toks = [piece for t in toks for piece in
                    ([t] if len(t) <= maxlen else
                     [t[j:j + maxlen] for j in range(0, len(t), maxlen)])]
        doc_lengths[i] = len(toks)
        flat.extend(toks)
    arr = pa.array(flat, type=pa.string())
    return doc_lengths, (pc.utf8_lower(arr) if lower else arr)


def tokenize_flat(texts, lower=True) -> tuple[np.ndarray, pa.Array]:
    """Tokenize a batch into (doc_lengths, flat lowercased token array).

    Vectorized scan (the reference's tokenizer DFA, StandardTokenizerImpl,
    run whole-batch-at-a-time): the batch's texts concatenate into one
    codepoint array, a class-table lookup marks word chars and joiners
    (joiner counts as token-internal iff flanked by word chars — exactly
    ``\\w+(['’.]\\w+)*``), run boundaries come from a shifted compare, and
    the token bytes are gathered straight into an Arrow StringArray's data
    buffer — zero per-token Python objects. Lowercasing is one Arrow C++
    kernel. Falls back to the per-doc regex for batches containing astral
    chars, NULs, or over-long tokens (the class table is generated from the
    regex itself, so both paths agree by construction; asserted in
    tests/test_analysis.py).
    """
    import pyarrow.compute as pc
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    if not texts:
        return np.empty(0, np.int64), pa.array([], type=pa.string())
    try:
        s = "\x00".join(t or "" for t in texts)
    except TypeError:
        return _tokenize_flat_slow(texts, lower)
    if s.count("\x00") != len(texts) - 1:  # NUL inside a text → slow path
        return _tokenize_flat_slow(texts, lower)

    # ASCII batches (the common web-text case after html stripping) stay in
    # uint8 — 4× less memory traffic than the utf-32 view; with many
    # concurrent build tasks the tokenizer's temporaries are what saturate
    # the memory bus (measured: 50k-doc segment inversion 31s → 12s wall
    # at 20-way concurrency with this path)
    try:
        cps: np.ndarray = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError:
        cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    mx = int(cps.max(initial=0))
    if mx >= _CLS_LIMIT:  # astral chars present
        return _tokenize_flat_slow(texts, lower)
    cls = _cls_table()[cps]
    if (cls == 254).any():  # emoji present → regex path (exact sequences)
        return _tokenize_flat_slow(texts, lower)
    n = len(cls)
    wordish = (cls >= 1) & (cls <= 3)   # letters, digits, ExtendNumLet
    # Mid* joiner resolution (WB6/7, WB11/12): a joiner is token-internal
    # iff its nearest non-mark neighbors (marks are WB4-transparent) have
    # the classes its rule demands — immediate flanks, exactly the regex's
    # `L M* J M* L` / `D M* J M* D` structure.
    join = cls >= 8
    eff = cls.copy()   # anchor classes for mark inheritance (below)
    if join.any():
        idx = np.arange(n, dtype=np.int64)
        nonmark = cls != 7
        last_nm = np.maximum.accumulate(np.where(nonmark, idx, -1))
        pb = np.empty(n, np.int64)
        pb[0] = -1
        pb[1:] = last_nm[:-1]          # nearest non-mark strictly before
        rev_last = np.maximum.accumulate(np.where(nonmark[::-1], idx, -1))
        nb_at = n - 1 - rev_last[::-1]  # nearest non-mark at-or-after i
        nb = np.empty(n, np.int64)
        nb[-1] = n
        nb[:-1] = nb_at[1:]            # nearest non-mark strictly after
        pcls = np.where(pb >= 0, cls[np.clip(pb, 0, n - 1)], 0)
        ncls = np.where(nb < n, cls[np.clip(nb, 0, n - 1)], 0)
        ll = (pcls == 1) & (ncls == 1)
        dd = (pcls == 2) & (ncls == 2)
        join_ok = (((cls == 8) & (ll | dd)) | ((cls == 9) & ll) |
                   ((cls == 10) & dd))
        eff[join_ok] = 1
    else:
        join_ok = np.zeros(n, dtype=bool)
    # token class per char: 1 = word run (incl. resolved joiners),
    # 4/5 = Katakana/Hangul runs, 6 = per-char CJK singles, and UAX#29
    # Extend chars (class 7 = Mn/Mc) INHERIT the class of the nearest
    # preceding anchor char (word/kata/hangul/single/resolved joiner) —
    # marks continue a token but never start one
    tokc = np.where(wordish | join_ok, np.uint8(1), np.uint8(0))
    cjk = (cls >= 4) & (cls <= 6)
    if cjk.any():
        tokc = np.where(cls != 7, np.where(cjk, cls, tokc), tokc)
    ext = cls == 7
    if ext.any():
        base = np.maximum.accumulate(
            np.where(~ext, np.arange(n, dtype=np.int64), -1))
        valid = ext & (base >= 0)
        vb = base[valid]
        acls = eff[vb]
        inh = np.zeros(len(vb), dtype=np.uint8)
        inh[(acls >= 1) & (acls <= 3)] = 1
        m456 = (acls >= 4) & (acls <= 6)
        inh[m456] = acls[m456]
        tokc[valid] = inh
    tok = tokc > 0

    # boundaries: class CHANGE splits (アア|abc|漢); class 6 splits at
    # every char (one token per ideograph/hiragana) — EXCEPT its trailing
    # extend marks, which stay attached (testCombiningMarks 壹゙)
    prev_tc = np.empty_like(tokc)
    prev_tc[0] = 0
    prev_tc[1:] = tokc[:-1]
    starts = tok & ((tokc != prev_tc) | ((tokc == 6) & ~ext))
    start_idx = np.flatnonzero(starts)
    n_tok = len(start_idx)
    n_docs = len(texts)
    if n_tok == 0:
        return np.zeros(n_docs, np.int64), pa.array([], type=pa.string())
    next_tc = np.empty_like(tokc)
    next_tc[-1] = 0
    next_tc[:-1] = tokc[1:]
    next_ext = np.empty_like(ext)
    next_ext[-1] = False
    next_ext[:-1] = ext[1:]
    ends = tok & ((tokc != next_tc) | ((next_tc == 6) & ~next_ext))
    end_idx = np.flatnonzero(ends)
    if int((end_idx - start_idx).max()) + 1 > MAX_TOKEN_LENGTH:
        return _tokenize_flat_slow(texts, lower)

    # doc of each token = number of NUL separators before its start — a
    # searchsorted against the (tiny) separator index, not a full cumsum
    sep_idx = np.flatnonzero(cps == 0)
    doc_of = np.searchsorted(sep_idx, start_idx)
    doc_lengths = np.bincount(doc_of, minlength=n_docs).astype(np.int64)

    if mx < 0x80:  # pure-ASCII batch: codepoints ARE the UTF-8 bytes
        tok_bytes = cps[tok].astype(np.uint8)
        tok_byte_lens = end_idx - start_idx + 1
    else:
        # gather UTF-8 bytes of token chars into a contiguous buffer
        blen = (1 + (cps >= 0x80).astype(np.int64) + (cps >= 0x800))
        byte_arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        tok_bytes = byte_arr[np.repeat(tok, blen)]
        # per-token byte lengths: segment sums of blen over token runs
        bounds = np.empty(2 * n_tok, dtype=np.int64)
        bounds[0::2] = start_idx
        bounds[1::2] = end_idx + 1
        seg = np.add.reduceat(blen, bounds[:-1] if bounds[-1] == len(blen)
                              else bounds)
        tok_byte_lens = seg[0::2]
    offsets = np.concatenate([[0], np.cumsum(tok_byte_lens)]).astype(np.int32)
    arr = pa.StringArray.from_buffers(
        n_tok, pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(tok_bytes.tobytes()))
    return doc_lengths, (pc.utf8_lower(arr) if lower else arr)


def term_freqs(text: str) -> Counter:
    """Convenience for tests/oracles: term -> tf for one document."""
    return Counter(tokenize(text))


class NGramAnalyzer:
    """StandardTokenizer → LowerCase → character n-grams per word token
    (the NGramTokenFilter role, ``analysis/common/.../ngram/`` — grams of
    one word share the word's position, as the modern filter preserves
    position increments). Enables substring-style term matching: indexing
    with ``NGramAnalyzer(3, 3)`` makes ``TermQuery("par")`` match docs
    containing "spark".
    """

    def __init__(self, min_n: int = 2, max_n: int = 3):
        if not 1 <= min_n <= max_n:
            raise ValueError("need 1 <= min_n <= max_n")
        self.min_n = min_n
        self.max_n = max_n
        self.name = f"ngram_{min_n}_{max_n}"

    def _grams(self, tok: str) -> list[str]:
        out = []
        for n in range(self.min_n, self.max_n + 1):
            if n >= len(tok):
                if n == self.min_n or n == len(tok):
                    out.append(tok)  # short tokens kept whole, once
                break
            out.extend(tok[i:i + n] for i in range(len(tok) - n + 1))
        return out

    def __call__(self, text: str) -> list[str]:
        return [g for tok in tokenize(text) for g in self._grams(tok)]

    def analyze_flat(self, texts):
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        # grams per UNIQUE token, expanded to occurrences by dictionary code
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64)
        vocab = dict_arr.dictionary.to_pylist()
        per_tok = [self._grams(t) for t in vocab]
        counts = np.array([len(g) for g in per_tok], dtype=np.int64)
        occ_counts = counts[codes]
        flat_grams = pa.array(
            [g for c in codes for g in per_tok[c]], type=pa.string())
        doc_of2 = np.repeat(doc_of, occ_counts)
        positions2 = np.repeat(positions, occ_counts)  # grams share position
        norm_lengths = np.bincount(doc_of2, minlength=len(doc_lengths)) \
            .astype(np.int64)
        return norm_lengths, flat_grams, doc_of2, positions2


class EdgeNGramAnalyzer(NGramAnalyzer):
    """EdgeNGramTokenFilter role (``analysis/common/.../ngram/
    EdgeNGramTokenFilter.kt``): per word token, front grams of length
    min_n..max_n (capped at the token length); tokens shorter than
    min_n are dropped. With ``preserve_original``, a token outside the
    [min_n, max_n] length range additionally emits itself
    (TestEdgeNGramTokenFilter testPreserveOriginal: "a bcd efghi jk"
    with (2, 3, true) -> a, bc, bcd, ef, efg, efghi, jk). Grams of one
    word share the word's position (first gram inherits the posinc,
    the rest are posinc-0), inherited from NGramAnalyzer's model."""

    def __init__(self, min_n: int = 2, max_n: int = 3,
                 preserve_original: bool = False):
        super().__init__(min_n, max_n)
        self.preserve_original = preserve_original
        self.name = f"edge_ngram_{min_n}_{max_n}" + \
            ("_orig" if preserve_original else "")

    def _grams(self, tok: str) -> list[str]:
        out = [tok[:n]
               for n in range(self.min_n, min(self.max_n, len(tok)) + 1)]
        if self.preserve_original and not \
                (self.min_n <= len(tok) <= self.max_n):
            out.append(tok)
        return out


class NGramTokenizerAnalyzer(NGramAnalyzer):
    """The NGramTokenizer model (``analysis/common/.../ngram/
    NGramTokenizer``): each gram is its own token at its own POSITION
    (sequential), unlike the filter model where grams share the source
    word's position. This is the field type NGramPhraseQuery targets —
    consecutive grams sit at consecutive positions, so gram phrases
    match."""

    def __init__(self, min_n: int = 2, max_n: int = 3):
        super().__init__(min_n, max_n)
        self.name = f"ngram_tok_{min_n}_{max_n}"

    def analyze_flat(self, texts):
        lengths, flat, doc_of, _ = super().analyze_flat(texts)
        starts = np.append(0, np.cumsum(lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, lengths)
        return lengths, flat, doc_of, positions
