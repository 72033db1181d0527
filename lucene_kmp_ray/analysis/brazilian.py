"""Brazilian Portuguese analysis chain.

Reference chain (``/root/reference/analysis/common/.../br/BrazilianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → BrazilianStemFilter.

BrazilianStemmer (``br/BrazilianStemmer.kt``) works on a "changed
term" (lowercased, accents folded á/â/ã→a … ç→c ñ→n, one leading and
one trailing punctuation char stripped):

- non-indexable terms (length < 3 or ≥ 30) keep the ORIGINAL token;
  terms with any non-letter keep the folded form;
- regions are SUFFIX STRINGS: R1 = text after the first
  vowel→non-vowel pair (the scan excludes the last char), R2 =
  getR1(R1), RV = the reference's three-branch rule;
- step1 (noun/adjective suffixes, first match in file order — incl.
  the upstream quirk where the ``logias`` rewrite result is DISCARDED
  and the ``iras``/``ira`` rules require a preceding ``e``); if step1
  fails, step2 (verb suffixes in RV); if either fired → step3
  (ci|i strip) else step4 (os/a/i/o); then step5 (final e, with
  gue→g / cie→c).

SQL mirror: ``oracle.bm25_brazilian_topk`` — staged CTEs GENERATED
from the same tables.  Vectors + parity fuzzing live in
tests/test_brazilian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

BRAZILIAN_STOP_WORDS = frozenset("""
a ainda alem ambas ambos antes ao aonde aos apos aquele aqueles as
assim com como contra contudo cuja cujas cujo cujos da das de dela
dele deles demais depois desde desta deste dispoe dispoem diversa
diversas diversos do dos durante e ela elas ele eles em entao entre
essa essas esse esses esta estas este estes ha isso isto logo mais
mas mediante menos mesma mesmas mesmo mesmos na no nao nas nem nesse
neste nos o os ou outra outras outro outros pelas pelas pelo pelos
perante pois por porque portanto proprio propios quais qual qualquer
quando quanto que quem quer se seja sem sendo seu seus sob sobre sua
suas tal tambem teu teus toda todas todo todos tua tuas tudo um uma
umas uns
""".split())

BR_VOWELS = frozenset("aeiou")

_BR_FOLD = str.maketrans("áâãéêíóôõúüçñ", "aaaeeiooouucn")
_BR_PUNCT = set("\"'-,;.?!")

# step1: (suffix, region, required-preceding, action, replacement) in
# file order; action "discard" preserves the upstream bug where the
# logias rewrite is computed but never assigned
BR_STEP1 = [
    ("uciones", "r2", None, "replace", 'u'),
    ("imentos", "r2", None, "remove", None),
    ("amentos", "r2", None, "remove", None),
    ("adores", "r2", None, "remove", None),
    ("adoras", "r2", None, "remove", None),
    ("logias", "r2", None, "discard", 'log'),
    ("encias", "r2", None, "replace", 'ente'),
    ("amente", "r1", None, "remove", None),
    ("idades", "r2", None, "remove", None),
    ("acoes", "r2", None, "remove", None),
    ("imento", "r2", None, "remove", None),
    ("amento", "r2", None, "remove", None),
    ("adora", "r2", None, "remove", None),
    ("ismos", "r2", None, "remove", None),
    ("istas", "r2", None, "remove", None),
    ("logia", "r2", None, "replace", 'log'),
    ("ucion", "r2", None, "replace", 'u'),
    ("encia", "r2", None, "replace", 'ente'),
    ("mente", "r2", None, "remove", None),
    ("idade", "r2", None, "remove", None),
    ("acao", "r2", None, "remove", None),
    ("ezas", "r2", None, "remove", None),
    ("icos", "r2", None, "remove", None),
    ("icas", "r2", None, "remove", None),
    ("ismo", "r2", None, "remove", None),
    ("avel", "r2", None, "remove", None),
    ("ivel", "r2", None, "remove", None),
    ("ista", "r2", None, "remove", None),
    ("osos", "r2", None, "remove", None),
    ("osas", "r2", None, "remove", None),
    ("ador", "r2", None, "remove", None),
    ("ivas", "r2", None, "remove", None),
    ("ivos", "r2", None, "remove", None),
    ("iras", "rv", 'e', "replace", 'ir'),
    ("eza", "r2", None, "remove", None),
    ("ico", "r2", None, "remove", None),
    ("ica", "r2", None, "remove", None),
    ("oso", "r2", None, "remove", None),
    ("osa", "r2", None, "remove", None),
    ("iva", "r2", None, "remove", None),
    ("ivo", "r2", None, "remove", None),
    ("ira", "rv", 'e', "replace", 'ir'),
]

# step2: verb suffixes checked against RV, removed from CT, file order
BR_STEP2 = [
    "issemos",
    "essemos",
    "assemos",
    "ariamos",
    "eriamos",
    "iriamos",
    "iremos",
    "eremos",
    "aremos",
    "avamos",
    "iramos",
    "eramos",
    "aramos",
    "asseis",
    "esseis",
    "isseis",
    "arieis",
    "erieis",
    "irieis",
    "irmos",
    "iamos",
    "armos",
    "ermos",
    "areis",
    "ereis",
    "ireis",
    "asses",
    "esses",
    "isses",
    "astes",
    "assem",
    "essem",
    "issem",
    "ardes",
    "erdes",
    "irdes",
    "ariam",
    "eriam",
    "iriam",
    "arias",
    "erias",
    "irias",
    "estes",
    "istes",
    "areis",
    "aveis",
    "aria",
    "eria",
    "iria",
    "asse",
    "esse",
    "isse",
    "aste",
    "este",
    "iste",
    "arei",
    "erei",
    "irei",
    "aram",
    "eram",
    "iram",
    "avam",
    "arem",
    "erem",
    "irem",
    "ando",
    "endo",
    "indo",
    "arao",
    "erao",
    "irao",
    "adas",
    "idas",
    "aras",
    "eras",
    "iras",
    "avas",
    "ares",
    "eres",
    "ires",
    "ados",
    "idos",
    "amos",
    "emos",
    "imos",
    "iras",
    "ieis",
    "ada",
    "ida",
    "ara",
    "era",
    "ira",
    "iam",
    "ado",
    "ido",
    "ias",
    "ais",
    "eis",
    "ira",
    "ear",
    "ia",
    "ei",
    "am",
    "em",
    "ar",
    "er",
    "ir",
    "as",
    "es",
    "is",
    "eu",
    "iu",
    "iu",
    "ou",
]


def _br_change_term(term: str) -> str:
    ct = term.lower().translate(_BR_FOLD)
    if len(ct) >= 2 and ct[0] in _BR_PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _BR_PUNCT:
        ct = ct[:-1]
    return ct


def _br_r1(v: str | None) -> str | None:
    if v is None:
        return None
    i = len(v) - 1
    for jj in range(i):
        if v[jj] in BR_VOWELS:
            j = jj
            while j < i and v[j] in BR_VOWELS:
                j += 1
            if j < i:
                return v[j + 1:]
            return None
    return None


def _br_rv(v: str) -> str | None:
    i = len(v) - 1
    if i > 0 and v[1] not in BR_VOWELS:
        for jj in range(2, i):
            if v[jj] in BR_VOWELS:
                return v[jj + 1:]
    if i > 1 and v[0] in BR_VOWELS and v[1] in BR_VOWELS:
        for jj in range(2, i):
            if v[jj] not in BR_VOWELS:
                return v[jj + 1:]
    if i > 2:
        return v[3:]
    return None


def _sfx(value: str | None, suffix: str) -> bool:
    return value is not None and value.endswith(suffix)


def brazilian_stem(term: str) -> str | None:
    """Returns the stem, or None when the term is non-indexable (the
    filter then keeps the original token)."""
    ct = _br_change_term(term)
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _br_r1(ct)
    r2 = _br_r1(r1)
    rv = _br_rv(ct)
    regions = {"r1": r1, "r2": r2, "rv": rv}

    altered = False
    for sfx, reg, preceded, act, repl in BR_STEP1:
        if _sfx(ct, sfx) and _sfx(regions[reg], sfx) and \
                (preceded is None or ct[:len(ct) - len(sfx)]
                 .endswith(preceded)):
            if act == "remove":
                ct = ct[:len(ct) - len(sfx)]
            elif act == "replace":
                ct = ct[:len(ct) - len(sfx)] + repl
            altered = True
            break
    if not altered and rv is not None:
        for sfx in BR_STEP2:
            if _sfx(rv, sfx):
                ct = ct[:len(ct) - len(sfx)]
                altered = True
                break
    if altered:
        if _sfx(rv, "i") and _sfx(rv[:len(rv) - 1] if rv else None, "c"):
            ct = ct[:-1] if ct.endswith("i") else ct
    else:
        if rv is not None:
            for sfx in ("os", "a", "i", "o"):
                if rv.endswith(sfx):
                    ct = ct[:len(ct) - len(sfx)] \
                        if ct.endswith(sfx) else ct
                    break
    if rv is not None and rv.endswith("e"):
        if rv[:-1].endswith("gu"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("u"):
                ct = ct[:-1]
        elif rv[:-1].endswith("ci"):
            if ct.endswith("e"):
                ct = ct[:-1]
            if ct.endswith("i"):
                ct = ct[:-1]
        elif ct.endswith("e"):
            ct = ct[:-1]
    return ct


class BrazilianAnalyzer(_RomanceAnalyzer):
    """Stop runs on the RAW lowercased token (before accent fold);
    the stemmer keeps the original token when non-indexable."""
    name = "brazilian"
    stop_words = BRAZILIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        s = brazilian_stem(tok)
        return tok if s is None or s == tok else s
