"""Lithuanian analysis chain.

Reference chain (``/root/reference/analysis/common/.../lt/LithuanianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(LithuanianStemmer).

LithuanianStemmer (``tartarus/snowball/ext/LithuanianStemmer.kt``,
Snowball 2.2): R1 starts after the first vowel→non-vowel boundary,
scanned from index 1 instead of 0 when the word starts with ``a`` and
is longer than 6 chars; then fix_conflicts (unbounded rewrite, e.g.
ojime→ojimas), step1 (one longest-match R1-bounded case-suffix delete),
fix_chdz (č→t, dž→d), step2 (REPEATED R1-bounded
derivational-suffix deletes until none match), fix_chdz again, fix_gd
(gd→g).

SQL mirror: ``oracle.bm25_lithuanian_topk`` (step2 as a recursive CTE).
Parity fuzzing lives in tests/test_lithuanian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

LITHUANIAN_STOP_WORDS = frozenset("""
ant apie ar arba aš be bei bet bus būti būtų buvo dėl gali į iki ir
iš ja ją jai jais jam jame jas jei ji jį jie jiedu jiedvi jiedviem
jiedviese jiems jis jo jodviem jog joje jomis joms jos jose jų judu
judvi judviejų jųdviejų judviem judviese jumis jums jumyse juo juodu
juodviese juos juose jus jūs jūsų ką kad kai kaip kas kiek kol kur
kurie kuris man mane manęs manimi mano manyje mes metu mudu mudvi
mudviejų mudviem mudviese mumis mums mumyse mus mūsų nei nes net
nors nuo o pat per po prie prieš sau save savęs savimi savo savyje
su tačiau tada tai taip tas tau tave tavęs tavimi tavyje ten to
todėl tu tuo už visi yra
""".split())

LT_VOWELS = frozenset("aeiouyąėęįūų")

LT_STEP1 = [
    "tumeisi",
    "tumėmės",
    "tumėtės",
    "iuosna",
    "tumėme",
    "tumėte",
    "siuosi",
    "čiausi",
    "telėti",
    "terėti",
    "tumeis",
    "enimis",
    "iosna",
    "uosna",
    "enyje",
    "eryje",
    "iuose",
    "enyse",
    "eryse",
    "eriai",
    "tumei",
    "erimi",
    "siesi",
    "ėjosi",
    "iuosi",
    "iuoti",
    "iauti",
    "inėti",
    "eniui",
    "tumėm",
    "iomis",
    "enims",
    "erims",
    "iamės",
    "kimės",
    "simės",
    "iatės",
    "sitės",
    "tumėt",
    "eria",
    "osna",
    "ysna",
    "ėsna",
    "enie",
    "erie",
    "ioje",
    "iuje",
    "iame",
    "sime",
    "iose",
    "uose",
    "iate",
    "kite",
    "site",
    "tute",
    "iumi",
    "iasi",
    "iesi",
    "aisi",
    "eisi",
    "uisi",
    "uosi",
    "ausi",
    "tųsi",
    "enti",
    "inti",
    "ioti",
    "uoti",
    "auti",
    "enio",
    "iais",
    "imis",
    "omis",
    "umis",
    "ėmis",
    "enis",
    "asis",
    "ysis",
    "iams",
    "iems",
    "ioms",
    "iuos",
    "iaus",
    "enys",
    "erys",
    "amės",
    "imės",
    "omės",
    "ėmės",
    "atės",
    "otės",
    "ėtės",
    "čiau",
    "eniu",
    "oje",
    "uje",
    "yje",
    "ėje",
    "ame",
    "ome",
    "ėme",
    "ose",
    "yse",
    "ėse",
    "ate",
    "ite",
    "ote",
    "ėte",
    "iai",
    "imi",
    "umi",
    "asi",
    "esi",
    "isi",
    "osi",
    "usi",
    "ąsi",
    "ėsi",
    "ųsi",
    "oti",
    "yti",
    "ėti",
    "iui",
    "iam",
    "iem",
    "sim",
    "tum",
    "ion",
    "iun",
    "ėjo",
    "ias",
    "ies",
    "ais",
    "ams",
    "ims",
    "oms",
    "ums",
    "ėms",
    "ens",
    "ios",
    "uos",
    "ers",
    "aus",
    "ius",
    "iąs",
    "tųs",
    "iat",
    "sit",
    "iau",
    "siu",
    "enį",
    "erį",
    "erų",
    "ia",
    "ie",
    "ai",
    "ei",
    "ki",
    "si",
    "ti",
    "ui",
    "oj",
    "ėj",
    "am",
    "im",
    "om",
    "ėm",
    "an",
    "on",
    "un",
    "ėn",
    "io",
    "uo",
    "as",
    "es",
    "is",
    "os",
    "us",
    "ys",
    "ąs",
    "ės",
    "įs",
    "ūs",
    "at",
    "it",
    "ot",
    "ėt",
    "au",
    "iu",
    "ią",
    "ių",
    "a",
    "e",
    "i",
    "k",
    "o",
    "s",
    "u",
    "y",
    "ą",
    "ė",
    "ę",
    "į",
    "ų",
]

LT_STEP2 = [
    "utėait",
    "uliuk",
    "učiuk",
    "siant",
    "iuoj",
    "zgan",
    "iais",
    "iuos",
    "iaus",
    "iant",
    "iuot",
    "ykšt",
    "ykšč",
    "ing",
    "iaj",
    "iej",
    "ioj",
    "uoj",
    "auj",
    "iąj",
    "iųj",
    "iok",
    "iuk",
    "išk",
    "iul",
    "dam",
    "jam",
    "ain",
    "esn",
    "iop",
    "ias",
    "ies",
    "ais",
    "ios",
    "uos",
    "aus",
    "iąs",
    "ant",
    "int",
    "uot",
    "iau",
    "dav",
    "ėję",
    "aj",
    "oj",
    "ąj",
    "ėj",
    "ųj",
    "ok",
    "yl",
    "ėl",
    "am",
    "op",
    "os",
    "ąs",
    "ęs",
    "ot",
    "yt",
    "ėt",
    "sv",
    "šv",
    "ę",
]

LT_CONFLICTS = [
    ("okatės", "okatė"),
    ("ojime", "ojimas"),
    ("ėjime", "ėjimas"),
    ("avime", "avimas"),
    ("okate", "okatė"),
    ("asius", "asys"),
    ("aitės", "aitė"),
    ("uotės", "uotė"),
    ("aite", "aitė"),
    ("uote", "uotė"),
    ("esiu", "esys"),
]

LT_CHDZ = [("dž", "d"), ("č", "t")]


def _lt_p1(w: str) -> int:
    n = len(w)
    i = 1 if (w.startswith("a") and n > 6) else 0
    while i < n and w[i] not in LT_VOWELS:
        i += 1
    if i == n:
        return n
    i += 1
    while i < n and w[i] in LT_VOWELS:
        i += 1
    if i == n:
        return n
    return i + 1


def _lt_del(w: str, table, bound: int) -> str | None:
    for sfx in table:
        if len(w) - len(sfx) >= bound and w.endswith(sfx):
            return w[:len(w) - len(sfx)]
    return None


def _lt_fix_chdz(w: str) -> str:
    for sfx, repl in LT_CHDZ:
        if w.endswith(sfx):
            return w[:len(w) - len(sfx)] + repl
    return w


def lithuanian_stem(w: str) -> str:
    p1 = _lt_p1(w)
    for sfx, repl in LT_CONFLICTS:
        if w.endswith(sfx):
            w = w[:len(w) - len(sfx)] + repl
            break
    d = _lt_del(w, LT_STEP1, p1)
    if d is not None:
        w = d
    w = _lt_fix_chdz(w)
    while True:
        d = _lt_del(w, LT_STEP2, p1)
        if d is None:
            break
        w = d
    w = _lt_fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-2] + "g"
    return w


class LithuanianAnalyzer(_RomanceAnalyzer):
    name = "lithuanian"
    stop_words = LITHUANIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return lithuanian_stem(tok)
