"""Miscellaneous token filters (analysis/common/miscellaneous ports).

Each is the reference filter's default-config semantics over a token
list (our chains are list transforms; stream state is not needed for
these):

- ``length_filter`` / ``codepoint_count_filter``
  [ref: miscellaneous/LengthFilter.kt, CodepointCountFilter.kt]
- ``truncate_filter`` [ref: TruncateTokenFilter.kt]
- ``trim_filter`` [ref: TrimFilter.kt]
- ``keep_word_filter`` [ref: KeepWordFilter.kt]
- ``capitalization_filter`` [ref: CapitalizationFilter.kt defaults:
  onlyFirstWord + forceFirstLetter — single-word tokens capitalize]
- ``scandinavian_normalize`` / ``scandinavian_fold``
  [ref: ScandinavianNormalizer.kt (exact left-to-right scan with
  digraph deletion), ScandinavianFoldingFilter.kt]
- ``fingerprint_filter`` [ref: FingerprintFilter.kt: one output token =
  sorted DISTINCT terms joined by the separator]
- ``keyword_repeat_stems`` [ref: KeywordRepeatFilter.kt +
  RemoveDuplicatesTokenFilter.kt: emit the original alongside its stem,
  deduplicated — the original-preserving stemming pattern]
- ``stemmer_override`` [ref: StemmerOverrideFilter.kt: dictionary
  overrides win over the stemmer and keyword-mark the token]
"""

from __future__ import annotations


def length_filter(tokens: list[str], min_len: int,
                  max_len: int) -> list[str]:
    return [t for t in tokens if min_len <= len(t) <= max_len]


def codepoint_count_filter(tokens: list[str], min_cp: int,
                           max_cp: int) -> list[str]:
    # == length_filter for our str tokens (Python counts codepoints)
    return [t for t in tokens if min_cp <= len(t) <= max_cp]


def truncate_filter(tokens: list[str], length: int) -> list[str]:
    return [t[:length] for t in tokens]


def trim_filter(tokens: list[str]) -> list[str]:
    return [t.strip() for t in tokens]


def keep_word_filter(tokens: list[str], words) -> list[str]:
    ws = frozenset(words)
    return [t for t in tokens if t in ws]


def capitalization_filter(tokens: list[str]) -> list[str]:
    # single-word tokens under the defaults: uppercase first letter,
    # lowercase the rest
    return [t[:1].upper() + t[1:].lower() if t else t for t in tokens]


_SCAN_SINGLE = {"ä": "æ", "Ä": "Æ", "ö": "ø", "Ö": "Ø"}
ALL_FOLDINGS = frozenset(["AA", "AO", "AE", "OE", "OO"])


def scandinavian_normalize(term: str,
                           foldings=ALL_FOLDINGS) -> str:
    """Exact ScandinavianNormalizer.processToken scan."""
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in _SCAN_SINGLE:
            buf[i] = _SCAN_SINGLE[c]
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c == "a" and (("AA" in foldings and nxt in "aA")
                             or ("AO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and (("AA" in foldings and nxt in "aA")
                               or ("AO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and "AE" in foldings and nxt in "eE":
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and "AE" in foldings and nxt in "eE":
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and (("OE" in foldings and nxt in "eE")
                               or ("OO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and (("OE" in foldings and nxt in "eE")
                               or ("OO" in foldings and nxt in "oO")):
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


_FOLD_A = set("åÅäÄæÆ")
_FOLD_O = set("öÖøØ")


def scandinavian_fold(term: str) -> str:
    """ScandinavianFoldingFilter: åÅäæÄÆ->a, öÖøØ->o, and the second
    vowel of aa/ae/ao/oe/oo drops (the normalizer scan followed by the
    single-char folds produces exactly this)."""
    norm = scandinavian_normalize(term)
    out = []
    for c in norm:
        if c in _FOLD_A:
            out.append("A" if c.isupper() else "a")
        elif c in _FOLD_O:
            out.append("O" if c.isupper() else "o")
        else:
            out.append(c)
    return "".join(out)


def fingerprint_filter(tokens: list[str], separator: str = " ",
                       max_output_size: int = 1024) -> list[str]:
    if not tokens:
        return []
    out = separator.join(sorted(set(tokens)))
    return [out] if len(out) <= max_output_size else []


def keyword_repeat_stems(tokens: list[str], stem_fn) -> list[str]:
    """KeywordRepeat + stemmer + RemoveDuplicates: original kept at the
    same position as its stem unless they are equal."""
    out = []
    for t in tokens:
        s = stem_fn(t)
        out.append(t)
        if s != t:
            out.append(s)
    return out


def stemmer_override(tokens: list[str], overrides: dict,
                     stem_fn) -> list[str]:
    """Dictionary overrides win and bypass the stemmer."""
    return [overrides.get(t) if t in overrides else stem_fn(t)
            for t in tokens]


def mapping_char_filter(text: str, mapping: dict) -> str:
    """MappingCharFilter [ref: charfilter/MappingCharFilter.kt +
    NormalizeCharMap.kt]: greedy longest-match string replacement,
    scanning left to right."""
    if not mapping:
        return text
    max_len = max(len(k) for k in mapping)
    out = []
    i = 0
    n = len(text)
    while i < n:
        hit = None
        for ln in range(min(max_len, n - i), 0, -1):
            rep = mapping.get(text[i:i + ln])
            if rep is not None:
                hit = (ln, rep)
                break
        if hit:
            out.append(hit[1])
            i += hit[0]
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def hyphenated_words_filter(tokens: list[str]) -> list[str]:
    """HyphenatedWordsFilter [ref: miscellaneous/HyphenatedWordsFilter
    .kt]: a token ending with '-' joins the following token (line-break
    hyphenation repair); a trailing unpaired hyphen token keeps the
    hyphen stripped."""
    out = []
    pending = None
    for t in tokens:
        if pending is not None:
            out.append(pending + t)
            pending = None
        elif t.endswith("-") and len(t) > 1:
            pending = t[:-1]
        else:
            out.append(t)
    if pending is not None:
        out.append(pending)
    return out


def protected_term_filter(tokens: list[str], protected,
                          inner_fn) -> list[str]:
    """ProtectedTermFilter [ref: miscellaneous/ProtectedTermFilter.kt]:
    tokens in the protected set bypass the wrapped filter."""
    ps = frozenset(protected)
    return [t if t in ps else inner_fn(t) for t in tokens]


def dictionary_compound_filter(tokens: list[str], dictionary,
                               min_word_size: int = 5,
                               min_subword_size: int = 2,
                               max_subword_size: int = 15,
                               only_longest_match: bool = False
                               ) -> list[str]:
    """DictionaryCompoundWordTokenFilter [ref: compound/
    DictionaryCompoundWordTokenFilter.kt + CompoundWordTokenFilterBase
    .kt]: Germanic decompounding — the original token is kept and every
    dictionary subword found by the brute-force (i, j) scan follows at
    the same position; onlyLongestMatch keeps one per start offset."""
    d = frozenset(dictionary)
    out = []
    for t in tokens:
        out.append(t)
        if len(t) < min_word_size:
            continue
        i = 0
        while i <= len(t) - min_subword_size:
            longest = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > len(t):
                    break
                if t[i:i + j] in d:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = t[i:i + j]
                    else:
                        out.append(t[i:i + j])
            if only_longest_match and longest is not None:
                out.append(longest)
            i += 1
    return out


def english_minimal_stem(term: str) -> str:
    """EnglishMinimalStemmer [ref: en/EnglishMinimalStemmer.kt] — the
    Harman S-stemmer (plural-only)."""
    n = len(term)
    if n < 3 or term[-1] != "s":
        return term
    c2 = term[-2]
    if c2 in ("u", "s"):
        return term
    if c2 == "e":
        if n > 3 and term[-3] == "i" and term[-4] not in ("a", "e"):
            return term[:-3] + "y"
        if term[-3] in ("i", "a", "o", "e"):
            return term
    return term[:-1]


def type_token_filter(token_types: list[tuple[str, str]], types,
                      use_whitelist: bool = False) -> list[str]:
    """TypeTokenFilter [ref: core/TypeTokenFilter.kt]: drop (or, with
    useWhitelist, keep only) tokens whose type is in the set. Operates
    on (token, type) pairs such as classic_tokenize's output."""
    ts = frozenset(types)
    if use_whitelist:
        return [t for t, typ in token_types if typ in ts]
    return [t for t, typ in token_types if typ not in ts]


def type_as_synonym_filter(token_types: list[tuple[str, str]],
                           prefix: str = "") -> list[str]:
    """TypeAsSynonymFilter [ref: miscellaneous/TypeAsSynonymFilter.kt]:
    each token is followed by its type (same position), optionally
    prefixed."""
    out = []
    for t, typ in token_types:
        out.append(t)
        out.append(prefix + typ)
    return out


# ===================================================================
# r5 session-8 additions: the last live-tested miscellaneous filters.
# Offsets note: FixBrokenOffsetsFilter is designed out — the engine's
# analyzers track positions only (offsets are not indexed, SURVEY §2.2),
# so there are no broken offsets to fix.
# ===================================================================

# ConcatenateGraphFilter.SEP_LABEL = TokenStreamToAutomaton.POS_SEP
# [ref: core/analysis/TokenStreamToAutomaton.kt:249 = 0x001f]
CONCAT_SEP = "\u001f"


def concatenate_graph_filter(tokens, sep=CONCAT_SEP,
                             preserve_pos_inc: bool = True,
                             max_graph_expansions: int = 10000
                             ) -> list[str]:
    """ConcatenateGraphFilter [ref: miscellaneous/ConcatenateGraphFilter
    .kt]: concatenates the token graph into one output token per path.

    ``tokens`` is either a plain ``list[str]`` (posinc 1 each) or a list
    of ``(term, posinc)`` where posinc 0 marks a same-position
    alternative (the engine's SynonymGraph shape) and posinc > 1 records
    holes left by stop removal. ``sep=None`` emits no separators (the
    preserveSep=false ctor); otherwise each position joins with ``sep``
    and, when ``preserve_pos_inc``, each hole contributes one extra
    ``sep`` (TestConcatenateGraphFilter: "A B C D E F J H" minus stops
    {A,D,E,J} with sep '-' -> "-B-C---F--H"). Paths are emitted in
    sorted order, matching the automaton's finite-strings enumeration;
    more than ``max_graph_expansions`` paths raises (the
    TooComplexToDeterminizeException role)."""
    pairs = [(t, 1) if isinstance(t, str) else (t[0], int(t[1]))
             for t in tokens]
    positions: list[tuple[int, list[str]]] = []  # (holes, alternatives)
    for term, inc in pairs:
        if inc == 0 and positions:
            positions[-1][1].append(term)
        else:
            positions.append((max(inc, 1) - 1, [term]))
    if not positions:
        return []
    n_paths = 1
    for _, alts in positions:
        n_paths *= len(alts)
        if n_paths > max_graph_expansions:
            raise ValueError(
                f"graph expands to more than {max_graph_expansions} paths")
    paths = [""]
    for j, (holes, alts) in enumerate(positions):
        prefix = ""
        if sep is not None:
            if preserve_pos_inc:
                prefix += sep * holes
            if j > 0:
                prefix += sep
        paths = [p + prefix + a for p in paths for a in alts]
    return sorted(paths)


_MONTH_NAMES = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3,
    "march": 3, "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6,
    "jul": 7, "july": 7, "aug": 8, "august": 8, "sep": 9, "sept": 9,
    "september": 9, "oct": 10, "october": 10, "nov": 11, "november": 11,
    "dec": 12, "december": 12,
}


def _is_valid_date(year: int, month: int, day: int) -> bool:
    import datetime
    try:
        datetime.date(year, month, day)
        return True
    except ValueError:
        return False


def english_default_date_recognizer(text: str) -> bool:
    """EnglishDefaultDateRecognizer [ref: miscellaneous/DateRecognizer
    .kt:9]: ISO yyyy-MM-dd (LocalDate.parse) or 'Month d, yyyy'."""
    import datetime
    import re
    s = text.strip()
    try:
        datetime.date.fromisoformat(s)
        return True
    except ValueError:
        pass
    m = re.fullmatch(r"([A-Za-z]+)\s+(\d{1,2}),\s*(\d{4})", s)
    if not m:
        return False
    month = _MONTH_NAMES.get(m.group(1).lower())
    if month is None:
        return False
    return _is_valid_date(int(m.group(3)), month, int(m.group(2)))


def pattern_date_recognizer(date_pattern: str):
    """PatternDateRecognizer [ref: DateRecognizer.kt:61]: the four
    numeric patterns the reference supports."""
    import re
    month_first = date_pattern in ("MM/dd/yyyy", "MM-dd-yyyy")
    year_first = date_pattern in ("yyyy/MM/dd", "yyyy-MM-dd")
    if not (month_first or year_first):
        raise ValueError(f"Unsupported datePattern: {date_pattern}")
    sep = re.escape(date_pattern[4] if year_first else date_pattern[2])
    if month_first:
        rx = re.compile(r"(\d{1,2})%s(\d{1,2})%s(\d{4})" % (sep, sep))
    else:
        rx = re.compile(r"(\d{4})%s(\d{1,2})%s(\d{1,2})" % (sep, sep))

    def recognize(text: str) -> bool:
        m = rx.fullmatch(text.strip())
        if not m:
            return False
        a, b, c = (int(g) for g in m.groups())
        return (_is_valid_date(c, a, b) if month_first
                else _is_valid_date(a, b, c))
    return recognize


def date_recognizer_filter(tokens: list[str],
                           recognizer=None) -> list[str]:
    """DateRecognizerFilter [ref: miscellaneous/DateRecognizerFilter
    .kt]: keeps only tokens the recognizer accepts as dates."""
    rec = recognizer or english_default_date_recognizer
    return [t for t in tokens if rec(t)]


def delimited_term_frequency(tokens: list[str], delimiter: str = "|"
                             ) -> list[tuple[str, int]]:
    """DelimitedTermFrequencyTokenFilter [ref: miscellaneous/
    DelimitedTermFrequencyTokenFilter.kt]: 'term|tf' -> (term, tf);
    no delimiter -> tf 1. First delimiter occurrence splits (the
    reference scans the buffer left to right). Negative tf raises with
    the reference's message; a non-integer tf raises ValueError (the
    NumberFormatException role)."""
    out = []
    for t in tokens:
        i = t.find(delimiter)
        if i < 0:
            out.append((t, 1))
            continue
        tf = int(t[i + 1:])  # ValueError = NumberFormatException role
        if tf < 1:
            raise ValueError(
                f"Term frequency must be 1 or greater; got {tf}")
        out.append((t[:i], tf))
    return out


def drop_if_flagged(tokens_with_flags, drop_flags: int) -> list:
    """DropIfFlaggedFilter [ref: miscellaneous/DropIfFlaggedFilter.kt]:
    drop a (term, flags) token when ALL bits of drop_flags are set."""
    return [(t, f) for t, f in tokens_with_flags
            if (f & drop_flags) != drop_flags]


def set_keyword_marks(tokens: list[str], keyword_set,
                      ignore_case: bool = False,
                      prior=None) -> list[bool]:
    """SetKeywordMarkerFilter [ref: miscellaneous/SetKeywordMarkerFilter
    .kt]: mark tokens in the set as keywords (KeywordAttribute role).
    ``prior`` composes marks from an earlier marker (marks OR together,
    the LUCENE-2901 composition)."""
    if ignore_case:
        ks = frozenset(w.lower() for w in keyword_set)
        marks = [t.lower() in ks for t in tokens]
    else:
        ks = frozenset(keyword_set)
        marks = [t in ks for t in tokens]
    if prior is not None:
        marks = [a or b for a, b in zip(marks, prior)]
    return marks


def pattern_keyword_marks(tokens: list[str], pattern,
                          prior=None) -> list[bool]:
    """PatternKeywordMarkerFilter [ref: miscellaneous/
    PatternKeywordMarkerFilter.kt]: mark tokens fully matching the
    regex."""
    import re
    rx = re.compile(pattern) if isinstance(pattern, str) else pattern
    marks = [rx.fullmatch(t) is not None for t in tokens]
    if prior is not None:
        marks = [a or b for a, b in zip(marks, prior)]
    return marks


def apply_unless_keyword(tokens: list[str], marks: list[bool],
                         fn) -> list[str]:
    """Downstream-of-KeywordMarker application: keyword-marked tokens
    bypass the transform (the stemmer/LowerCaseFilterMock contract in
    TestKeywordMarkerFilter.kt)."""
    return [t if m else fn(t) for t, m in zip(tokens, marks)]


def limit_token_offset_filter(tokens_with_offsets,
                              max_start_offset: int) -> list:
    """LimitTokenOffsetFilter [ref: miscellaneous/LimitTokenOffsetFilter
    .kt]: pass (term, start_offset) tokens while start <= max, then end
    the stream (consumeAllTokens only affects stream exhaustion, which
    the list model has no analog of)."""
    if max_start_offset < 0:
        raise ValueError("maxStartOffset must be >= zero")
    out = []
    for t, start in tokens_with_offsets:
        if start > max_start_offset:
            break
        out.append((t, start))
    return out


def limit_token_position_filter(tokens, max_token_position: int) -> list:
    """LimitTokenPositionFilter [ref: miscellaneous/
    LimitTokenPositionFilter.kt]: emit tokens while position (cumsum of
    posinc, first token = 1) <= max. Accepts list[str] (posinc 1 each)
    or (term, posinc) pairs."""
    if max_token_position < 1:
        raise ValueError("maxTokenPosition must be greater than zero")
    out = []
    pos = 0
    for t in tokens:
        inc = 1 if isinstance(t, str) else t[1]
        pos += inc
        if pos > max_token_position:
            break
        out.append(t)
    return out


def conditional_filter(tokens: list[str], should_filter,
                       inner) -> list[str]:
    """ConditionalTokenFilter [ref: miscellaneous/ConditionalTokenFilter
    .kt]: tokens for which ``should_filter`` is true are fed through
    ``inner`` (a list transform) as ONE stream; the rest bypass
    unchanged. The list model supports length-preserving inners (the
    lowercase/stem/normalize family — TestConditionalTokenFilter
    testSimple); dropping/graph inners compose via protected_term_filter
    instead."""
    sel = [i for i, t in enumerate(tokens) if should_filter(t)]
    sub = inner([tokens[i] for i in sel])
    if len(sub) != len(sel):
        raise ValueError("conditional_filter requires a "
                         "length-preserving inner transform")
    out = list(tokens)
    for i, t in zip(sel, sub):
        out[i] = t
    return out


def concatenating_token_stream(*token_lists) -> list:
    """ConcatenatingTokenStream [ref: miscellaneous/
    ConcatenatingTokenStream.kt]: the token streams back to back."""
    return [t for lst in token_lists for t in lst]
