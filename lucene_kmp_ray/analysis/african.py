"""Hausa / Swahili / Yoruba / Igbo / Tigrinya analysis chains.

Reference chains (``/root/reference/analysis/extra/.../{ha,sw,yo,ig,ti}/``),
all the same shape: StandardTokenizer → LowerCase → DecimalDigit →
<Lang>NormalizationFilter → Stop → <Lang>StemFilter.

The normalizers are per-char fold tables (typographic quotes → ``'``,
dash variants → ``-``, accented Latin → base; Yoruba also DELETES the
combining marks U+0300/0301/0304/0307/0323 and folds ẹ/ị/ọ/ụ/ṣ;
Tigrinya folds Ethiopic homophones ሐ-series → ሀ-series, ሠ → ሰ,
ዐ → አ, ፀ → ጸ …).  The stemmers strip affixes by FIRST MATCH IN
FILE ORDER (not longest-match) with per-rule minimum lengths:

- Hausa: one verb prefix (na/ta/ya/ba/an, stem > len+3), one suffix
  (wa/ce/shi/su/n/r, len ≥ len+3);
- Swahili: verb prefix, noun prefix, then the suffix pass TWICE;
- Yoruba: ``'n`` contraction, hyphen reduplication (half ≥ 3 chars),
  then an i/a prefix before a consonant;
- Igbo: na (len > 5) / ị·i·n·m before a consonant, then
  ghị/ghi/kwa/… suffixes;
- Tigrinya: one suffix from the possessive/plural list.

All stemmers skip words of ≤ 3 chars (the ORIGINAL token length).

SQL mirrors: ``oracle.bm25_extra_topk(lang)`` — translate + staged
CASE cascades GENERATED from these tables.  Vectors from
Test{Hausa,Swahili,Yoruba,Igbo,Tigrinya}Analyzer.kt live in
tests/test_african_analyzers.py.
"""

from __future__ import annotations

from .arabic import fold_digits
from .romance import _RomanceAnalyzer

HAUSA_STOP_WORDS = frozenset("""
a amma ba ban ce cikin da don ga in ina ita ji ka ko kuma lokacin ma
mai na ne ni sai shi su suka sun ta tafi take tana wani wannan wata ya
yake yana yi za
""".split())

SWAHILI_STOP_WORDS = frozenset("""
akasema alikuwa alisema baada basi bila cha chini hadi hapo hata hivyo
hiyo huku huo ili ilikuwa juu kama karibu katika kila kima kisha kubwa
kutoka kuwa kwa kwamba kwenda kwenye la lakini mara mdogo mimi mkubwa
mmoja moja muda mwenye na naye ndani ng ni nini nonkungu pamoja pia
sana sasa sauti tafadhali tena tu vile wa wakati wake walikuwa wao
watu wengine wote ya yake yangu yao yeye yule za zaidi zake
""".split())

YORUBA_STOP_WORDS = frozenset("""
a an ati awon ba bere bi emi e fun fe gbogbo inu ju je kan ki ko lati
le lo maa mi mo ni nigba nitori nkan nnkan o oun padà pada pe pelu
pupo re si sinu se sugbon ti wa won yii
""".split())

IGBO_STOP_WORDS = frozenset("""
a abuo abụo agugu agwu aha ahu ala ama ana ana-kpo anyi anyị anyanwu
ato bi bu bukwa bụrụ bụ bula di dị du e ebe ébé egwu gbu ha ihe igbo
ike ime ishií ka kpo kwa madu ma maka màkà mádu mbu mere mgbe mmadu
n'ime na nà naigeria n'etiti nde ne nile nke no nwere nọr o ó obodo
obu onwa onu onye otu ọ ruru si tupu ubochi ukwu uwa ya àlà í íshí
""".split())

TIGRINYA_STOP_WORDS = frozenset("""
ሀደ ሓደ ሕጂ ምስ ምእንቲ ምኽንያቱ ምኽንያት ስለ ቅድሚ ብ ብዛዕባ በቲ በታ በቶም
በተን ነቲ ነታ ነቶም ነተን ን ንሕና ንሱ ንሳ ንሳቶም ንስኺ ንስኻ ንስኻትኩም
ንስኻትክን ንስኽን ንስኹም ናብ ናይ ኣብ ኣብቲ ኣብታ ኣብቶም ኣብተን ኣብዚ ኣብዛ
ኣብዞም ኣብዘን ኣነ ኣይ እቲ እታ እቶም እተን እንተ እኳ እወ እዚ እዛ እዞም እዘን
እዩ እያ እየ እዮም እየን ከም ከምዚ ከምዛ ከምኡ ከኣ ኩሉ ኩላ ኩሎም ኩለን ካብ
ካብቲ ካብታ ካብቶም ካብተን ወይ ዘይ ዝ ድሕሪ ግን ፣ ።
""".split())

# shared Latin fold core (quotes, dashes, accents)
_LATIN_CORE = {}
for _grp, _to in (("’‘‛ʹʼ`´", "'"), ("‐‑‒–—―", "-"),
                  ("àáâãäåāăą", "a"), ("èéêëēĕėęě", "e"),
                  ("ìíîïĩīĭį", "i"), ("òóôõöōŏő", "o"),
                  ("ùúûüũūŭůűų", "u"), ("çćĉċč", "c"),
                  ("ñńņň", "n")):
    for _c in _grp:
        _LATIN_CORE[_c] = _to

HAUSA_NORM = _LATIN_CORE | {"ɓ": "b", "ɗ": "d", "ƙ": "k"}
SWAHILI_NORM = dict(_LATIN_CORE)
YORUBA_NORM = _LATIN_CORE | {
    "̀": None, "́": None, "̄": None, "̇": None,
    "̣": None,
    "ẹ": "e", "ị": "i", "ọ": "o", "ụ": "u",
    "ṅ": "n", "ǹ": "n",
    "ṣ": "s", "ş": "s", "ś": "s", "ŝ": "s", "š": "s",
}
IGBO_NORM = _LATIN_CORE | {"ị": "i", "ọ": "o", "ụ": "u",
                           "ṅ": "n"}
TIGRINYA_NORM = {}
for _grp, _to in (("ሃሐሓኀኃኻ", "ሀ"), ("ሑኁ", "ሁ"), ("ሒኂ", "ሂ"),
                  ("ሔኄ", "ሄ"), ("ሕኅ", "ህ"), ("ሖኆ", "ሆ"),
                  ("ሠ", "ሰ"), ("ሡ", "ሱ"), ("ሢ", "ሲ"),
                  ("ሣ", "ሳ"), ("ሤ", "ሴ"), ("ሥ", "ስ"),
                  ("ሦ", "ሶ"), ("ዉ", "ው"), ("ዎ", "ወ"),
                  ("ዐዓ", "አ"), ("ዑ", "ኡ"), ("ዒ", "ኢ"),
                  ("ዔ", "ኤ"), ("ዕ", "እ"), ("ዖ", "ኦ"),
                  ("ፀ", "ጸ"), ("ፁ", "ጹ"), ("ፂ", "ጺ"),
                  ("ፃ", "ጻ"), ("ፄ", "ጼ"), ("ፅ", "ጽ"),
                  ("ፆ", "ጾ"), ("’‘‛ʹʼ`´", "'"), ("‐‑‒–—―", "-")):
    for _c in _grp:
        TIGRINYA_NORM[_c] = _to

# stemmer tables (FILE order = match order)
HA_PREFIXES = ["na", "ta", "ya", "ba", "an"]
HA_SUFFIXES = ["wa", "ce", "shi", "su", "n", "r"]
SW_VERB_PREFIXES = ["hawata", "hatuta", "hamta", "hata", "nina",
                    "una", "ana", "tuna", "mna", "wana", "nili",
                    "uli", "ali", "tuli", "mli", "wali", "nita",
                    "uta", "ata", "tuta", "mta", "wata", "nime",
                    "ume", "ame", "tume", "mme", "wame", "haku",
                    "ku"]
SW_NOUN_PREFIXES = ["wa", "vi", "ki", "mi", "ma", "m"]
SW_SUFFIXES = ["ishwa", "esha", "isha", "ika", "ana", "eni", "eni",
               "ni", "wa", "a"]
YO_PREFIXES = ["i", "a"]
YO_VOWELS = frozenset("aeiou")
IG_SUFFIXES = ["ghị", "ghi", "kwa", "kwọ", "kwu", "rị",
               "ri", "ra", "la"]
IG_VOWELS = frozenset("aeiouịọụ")
TI_SUFFIXES = ["ታት", "ኹም", "ኽን", "ኩም", "ክን", "ልኩም",
               "ልክን", "ለይ", "ልካ", "ልኪ", "ኣት", "ኦም",
               "ኤን", "ዎም", "ወን", "ና", "ኻ", "ኺ", "ካ",
               "ኪ", "ላ"]


def _strip_prefix(w: str, prefixes, extra: int) -> str:
    for p in prefixes:
        if len(w) > len(p) + extra and w.startswith(p):
            return w[len(p):]
    return w


def _strip_suffix(w: str, suffixes, extra: int) -> str:
    for s in suffixes:
        if len(w) >= len(s) + extra and w.endswith(s):
            return w[:len(w) - len(s)]
    return w


def hausa_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    return _strip_suffix(_strip_prefix(w, HA_PREFIXES, 3),
                         HA_SUFFIXES, 3)


def swahili_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    w = _strip_prefix(w, SW_VERB_PREFIXES, 3)
    w = _strip_prefix(w, SW_NOUN_PREFIXES, 3)
    w = _strip_suffix(w, SW_SUFFIXES, 3)
    return _strip_suffix(w, SW_SUFFIXES, 3)


def yoruba_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    if len(w) > 2 and w.endswith("'n"):
        w = w[:-2]
    h = w.find("-")
    if 0 < h < len(w) - 1:
        first, second = w[:h], w[h + 1:]
        if first == second and len(first) >= 3:
            w = first
    for p in YO_PREFIXES:
        if len(w) > len(p) + 3 and w.startswith(p):
            nxt = w[len(p)]
            if "a" <= nxt <= "z" and nxt not in YO_VOWELS:
                return w[len(p):]
    return w


def igbo_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    if len(w) > 5 and w.startswith("na"):
        w = w[2:]
    elif len(w) >= 4 and w[0] == "ị" and w[1] not in IG_VOWELS:
        w = w[1:]
    elif len(w) >= 4 and w[0] == "i" and w[1] not in IG_VOWELS:
        w = w[1:]
    elif len(w) >= 5 and w[0] == "n" and w[1] not in IG_VOWELS:
        w = w[1:]
    elif len(w) >= 5 and w[0] == "m" and w[1] not in IG_VOWELS:
        w = w[1:]
    return _strip_suffix(w, IG_SUFFIXES, 3)


def tigrinya_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    return _strip_suffix(w, TI_SUFFIXES, 3)


class _ExtraAnalyzer(_RomanceAnalyzer):
    """lower → decimal digits → per-char normalize → stop → stem."""
    norm_map: dict = {}

    def __init__(self):
        super().__init__()
        self._trans = str.maketrans(self.norm_map)

    def _pre(self, tok: str) -> str:
        return fold_digits(tok).translate(self._trans)


class HausaAnalyzer(_ExtraAnalyzer):
    name = "hausa"
    stop_words = HAUSA_STOP_WORDS
    norm_map = HAUSA_NORM

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return hausa_stem(tok)


class SwahiliAnalyzer(_ExtraAnalyzer):
    name = "swahili"
    stop_words = SWAHILI_STOP_WORDS
    norm_map = SWAHILI_NORM

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return swahili_stem(tok)


class YorubaAnalyzer(_ExtraAnalyzer):
    name = "yoruba"
    stop_words = YORUBA_STOP_WORDS
    norm_map = YORUBA_NORM

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return yoruba_stem(tok)


class IgboAnalyzer(_ExtraAnalyzer):
    name = "igbo"
    stop_words = IGBO_STOP_WORDS
    norm_map = IGBO_NORM

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return igbo_stem(tok)


class TigrinyaAnalyzer(_ExtraAnalyzer):
    name = "tigrinya"
    stop_words = TIGRINYA_STOP_WORDS
    norm_map = TIGRINYA_NORM

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return tigrinya_stem(tok)
