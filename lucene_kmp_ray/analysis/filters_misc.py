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
