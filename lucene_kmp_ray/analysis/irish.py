"""Irish analysis chain.

Reference chain (``/root/reference/analysis/common/.../ga/IrishAnalyzer.kt``):
StandardTokenizer → StopFilter(h/n/t hyphenation artifacts, ignore-case)
→ ElisionFilter(d'/m'/b', ignore-case) → IrishLowerCaseFilter → Stop →
SnowballFilter(IrishStemmer).

IrishLowerCaseFilter (``ga/IrishLowerCaseFilter.kt``) is CASE-SENSITIVE:
a token starting with lowercase ``n``/``t`` followed by an UPPERCASE
vowel (eclipsis/t-prothesis written without the hyphen, "nAthair")
gets a ``-`` inserted after the first char before lowercasing — so this
analyzer consumes RAW-case tokens (``tokenize_flat(texts, lower=False)``)
and lowercases inside the chain.

IrishStemmer (``tartarus/snowball/ext/IrishStemmer.kt``, Snowball 2.2):
initial_morph strips/rewrites ONE longest-match mutation prefix (bhf→f,
ts→s, d'fh→f, h-/n-/t-/d'/b'/m' deleted, …), regions pV/R1/R2 are
marked on the result, then three independent longest-match suffix steps
run in sequence: noun_sfx (R1/R2 delete), deriv (R2 delete or rewrite
arc/gin/graf/paite/óid), verb_sfx (RV/R1 delete).  Snowball semantics:
each step commits to its LONGEST matching suffix — if that entry's
region condition fails the step does nothing (no backtracking).

SQL mirror: ``oracle.bm25_irish_topk`` — staged CTEs GENERATED from the
same tables (raw-case SQL tokens via ``sql_tokens_expr_raw``).
Conformance vectors from TestIrishAnalyzer.kt / TestIrishLowerCaseFilter.kt
live in tests/test_irish_analyzer.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IRISH_STOP_WORDS = frozenset("""
a ach ag agus an aon ar arna as b' ba beirt bhúr caoga ceathair
ceathrar chomh chtó chuig chun cois céad cúig cúigear d' daichead dar
de deich deichniúr den dhá do don dtí dá dár dó faoi faoin faoina
faoinár fara fiche gach gan go gur haon hocht i iad idir in ina ins
inár is le leis lena lenár m' mar mo mé na nach naoi naonúr ná ní
níor nó nócha ocht ochtar os roimh sa seacht seachtar seachtó seasca
seisear siad sibh sinn sna sé sí tar thar thú triúr trí trína trínár
tríocha tú um ár é éis í ó ón óna ónár
""".split())

IRISH_HYPHENATIONS = frozenset("h n t".split())   # ignore-case
IRISH_ARTICLES = frozenset("d m b".split())       # ignore-case

_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")
GA_VOWELS = "aeiouáéíóú"
_GA_VOWEL_SET = frozenset(GA_VOWELS)

# initial_morph among table: (prefix, replacement); longest match wins
GA_PREFIXES = [
    ("d'fh", "f"),
    ("bhf", "f"),
    ("b'", ""), ("bh", "b"), ("bp", "p"), ("ch", "c"), ("d'", ""),
    ("dh", "d"), ("dt", "t"), ("fh", "f"), ("gc", "c"), ("gh", "g"),
    ("h-", ""), ("m'", ""), ("mb", "b"), ("mh", "m"), ("n-", ""),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("t-", ""),
    ("th", "t"), ("ts", "s"),
]

# suffix steps: (suffix, region, replacement); longest match commits
GA_NOUN_SFX = [
    ("aíochta", "r1", ""), ("íochta", "r1", ""),
    ("aíocht", "r1", ""), ("íocht", "r1", ""),
    ("aire", "r2", ""), ("eabh", "r1", ""), ("aibh", "r1", ""),
    ("eamh", "r1", ""), ("aimh", "r1", ""), ("airí", "r2", ""),
    ("ire", "r2", ""), ("abh", "r1", ""), ("ibh", "r1", ""),
    ("amh", "r1", ""), ("imh", "r1", ""), ("irí", "r2", ""),
]
GA_DERIV = [
    ("grafaíochtaí", None, "graf"),
    ("grafaíochta", None, "graf"),
    ("grafaíocht", None, "graf"), ("grafaíoch", None, "graf"),
    ("arcachtaí", None, "arc"), ("óideacha", None, "óid"),
    ("arcachta", None, "arc"), ("achtúil", "r2", ""),
    ("eachtúil", "r2", ""), ("óideach", None, "óid"),
    ("gineach", None, "gin"), ("patacha", None, "paite"),
    ("pataigh", None, "paite"), ("arcacht", None, "arc"),
    ("óidigh", None, "óid"), ("gineas", None, "gin"),
    ("eachta", "r2", ""), ("patach", None, "paite"),
    ("paite", None, "paite"), ("ginis", None, "gin"),
    ("achta", "r2", ""), ("eacht", "r2", ""), ("each", "r2", ""),
    ("acht", "r2", ""), ("ach", "r2", ""),
]
GA_VERB_SFX = [
    ("aimid", "rv", ""), ("imid", "rv", ""), ("aímid", "rv", ""),
    ("ímid", "rv", ""), ("faidh", "rv", ""), ("fidh", "rv", ""),
    ("eadh", "r1", ""), ("adh", "r1", ""), ("áil", "r1", ""),
    ("ain", "r1", ""), ("tear", "r1", ""), ("tar", "r1", ""),
]
# among() longest-match: order each table longest-first (two equal-length
# suffixes can never both match, so length ordering is sufficient)
GA_NOUN_SFX.sort(key=lambda r: -len(r[0]))
GA_DERIV.sort(key=lambda r: -len(r[0]))
GA_VERB_SFX.sort(key=lambda r: -len(r[0]))
GA_PREFIXES.sort(key=lambda r: -len(r[0]))


def irish_lowercase(tok: str) -> str:
    """IrishLowerCaseFilter: n/t + uppercase vowel → insert '-'; then
    lowercase (Arrow utf8_lower for index parity happens at the array
    level; this per-token path uses the same simple mapping)."""
    from .standard import fold_case
    if len(tok) > 1 and tok[0] in "nt" and tok[1] in _GA_UPPER_VOWELS:
        tok = tok[0] + "-" + tok[1:]
    return fold_case(tok)


def _ga_regions(w: str) -> tuple[int, int, int]:
    """Snowball mark_regions: pV = after first vowel; R1 = after the
    first non-vowel following it; R2 = likewise once more.  Any region
    not found is len(w)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _GA_VOWEL_SET:
        i += 1
    if i == n:
        return n, n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in _GA_VOWEL_SET:
        i += 1
    if i == n:
        return pv, n, n
    p1 = i + 1
    i = p1
    while i < n and w[i] not in _GA_VOWEL_SET:
        i += 1
    if i == n:
        return pv, p1, n
    i += 1
    while i < n and w[i] in _GA_VOWEL_SET:
        i += 1
    if i == n:
        return pv, p1, n
    return pv, p1, i + 1


def _ga_step(w: str, table, pv: int, p1: int, p2: int) -> str:
    bounds = {"rv": pv, "r1": p1, "r2": p2, None: 0}
    for sfx, region, repl in table:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= bounds[region]:
                return w[:len(w) - len(sfx)] + repl
            return w   # longest match commits; condition failed → no-op
    return w


def irish_stem(w: str) -> str:
    for pfx, repl in GA_PREFIXES:
        if w.startswith(pfx):
            w = repl + w[len(pfx):]
            break
    pv, p1, p2 = _ga_regions(w)
    w = _ga_step(w, GA_NOUN_SFX, pv, p1, p2)
    w = _ga_step(w, GA_DERIV, pv, p1, p2)
    w = _ga_step(w, GA_VERB_SFX, pv, p1, p2)
    return w


def _ga_pre(tok: str) -> str:
    """elision (ignore-case d'/m'/b') then Irish lowercase."""
    for apo in ("'", "’"):
        i = tok.find(apo)
        if 0 < i and tok[:i].lower() in IRISH_ARTICLES and i + 1 < len(tok):
            tok = tok[i + 1:]
            break
    return irish_lowercase(tok)


class IrishAnalyzer:
    """Raw-case tokens → hyphenation stop → elision → Irish lowercase →
    stop → Irish snowball stem."""

    name = "irish"

    def __init__(self):
        self.stop = sorted(IRISH_STOP_WORDS)
        self.stop_set = frozenset(IRISH_STOP_WORDS)

    def __call__(self, text: str) -> list[str]:
        from .standard import _py_token_re, _pre_cjk, _CJK_ANY_RE, \
            MAX_TOKEN_LENGTH
        if _CJK_ANY_RE.search(text):
            text = _pre_cjk(text)
        out = []
        for tok in _py_token_re().findall(text):
            if len(tok) > MAX_TOKEN_LENGTH:
                continue  # over-long split irrelevant for the vectors
            if tok.lower() in IRISH_HYPHENATIONS:
                continue
            t = _ga_pre(tok)
            if t not in self.stop_set:
                out.append(irish_stem(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc

        from .standard import tokenize_flat
        doc_lengths, flat = tokenize_flat(texts, lower=False)
        doc_of = np.repeat(np.arange(len(doc_lengths), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        # hyphenation stop (ignore-case, pre-everything)
        keep = pc.invert(pc.is_in(
            pc.utf8_lower(flat),
            value_set=pa.array(sorted(IRISH_HYPHENATIONS), pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat, doc_of, positions = flat.filter(keep), doc_of[mask], \
            positions[mask]
        # elision + Irish lowercase per unique raw token
        dict_arr = flat.dictionary_encode()
        pre = pa.array([_ga_pre(t) for t in
                        dict_arr.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict_arr.indices, pre) \
            .cast(pa.string())
        # stop list
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(
            self.stop, pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat, doc_of, positions = flat.filter(keep), doc_of[mask], \
            positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        # stem per unique
        dict2 = flat.dictionary_encode()
        stemmed = pa.array([irish_stem(t) for t in
                            dict2.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict2.indices, stemmed) \
            .cast(pa.string())
        return norm_lengths, flat, doc_of, positions
