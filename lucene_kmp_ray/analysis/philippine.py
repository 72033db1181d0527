"""Tagalog / Cebuano / Ilocano analysis chains.

Reference chains (``/root/reference/analysis/extra/.../{tl,ceb,ilo}/``):
StandardTokenizer → LowerCase → DecimalDigit → <Lang>Normalization
(the shared Latin fold) → Stop → <Lang>StemFilter.

Stemmer shapes (affixes FIRST MATCH IN FILE ORDER):

- Tagalog (guard ≤ 2): ``'t``/``'y`` contractions, initial vowel
  de-duplication (aa→a), prefixes (pinag/pagka/naka/maka/pag/mag/nag
  unconditional at stem > len+2; ma/pa/ka require a following
  consonant AND stem > len+3, else the scan CONTINUES to later
  prefixes), um/in infixes, reduplication (hyphen halves equal, or
  CV-CV doubling), suffixes han/hin/an/in;
- Cebuano (guard ≤ 3): ``'g``/``'y``/``'ng`` contractions, nasal
  prefixes (mang-/pang- drop, man-/pan- → t…, mam-/pam- → p…) else
  the regular prefix list, um/in infixes, reduplication, the suffix
  list applied TWICE;
- Ilocano (guard ≤ 3): prefix list (≥ len+3, inclusive), um/in
  infixes, reduplication (hyphen, a repeated 3-char head, or CV-CV),
  suffixes en/an/in.

SQL mirrors via ``oracle.bm25_extra_topk``; vectors from the
reference's Test*Analyzer.kt suites live in
tests/test_philippine_analyzers.py.
"""

from __future__ import annotations

from .african import _LATIN_CORE, _ExtraAnalyzer

TAGALOG_STOP_WORDS = frozenset("""
akin aking ako alin am amin aming ang ano anumang apat at atin ating
ay bababa bago bakit bawat bilang dahil dalawa dapat din dito doon
gagawin gayunman ginagawa ginawa ginawang gumawa gusto habang
hanggang hindi huwag iba ibaba ibabaw ibig ikaw ilagay ilalim ilan
inyong isa isang itaas ito iyo iyon iyong ka kahit kailangan
kailanman kami kanila kanilang kanino kanya kanyang kapag kapwa
karamihan katiyakan katulad kaya kaysa ko kong kulang kumuha kung
laban lahat lamang likod lima maaari maaaring maging mahusay makita
marami marapat masyado may mayroon mga minsan mismo mula muli na
nabanggit naging nagkaroon nais nakita namin napaka narito nasaan ng
ngayon ni nila nilang nito niya niyang noon o pa paano pababa paggawa
pagitan pagkakaroon pagkatapos palabas pamamagitan panahon pangalawa
para paraan pareho pataas pero pumunta pumupunta sa saan sabi sabihin
sarili sila sino siya tatlo tayo tulad tungkol una walang
""".split())

CEBUANO_STOP_WORDS = frozenset("""
ako akong alag alang ambot ang ania ano apan aron asa ayaw ba bag-o
bahin bisan bitaw di diha dili dinhi dinha dito dunay gikan gihapon
gud gyud ha hain hangtod ikaw ila ilang imo imong ingon intawon
inyong isa iya iyang ka kada kadtong kaha kami kamo kanako kanang
kanato kanila kaniya kaniadto kanimo kaninyo karon katong kay kini
kita ko kun kung kuno lagi lang mao man mas matag may mi mga mo na
nag nga ngano ni nia nila nilang nimo ninyo niya niyang nuon o og pa
pag panahon para pay ra rehiyon sa samtang si sila siya ta tanan
tungod ug unsa usa wala walay departamento pransiya
""".split())

ILOCANO_STOP_WORDS = frozenset("""
a adda ak ako amin ania apay babaen da dagiti dayta daytoy di ditoy
dita idi isu iti ka kada kadagiti kami kayo ken kenni ket ko laeng mi
mo na nga ni no nu saan siak sika ti tayo wen wenno yo
""".split())

_VOWELS = frozenset("aeiou")

TL_PREFIXES = ["pinag", "pagka", "naka", "maka", "pag", "mag", "nag",
               "ma", "pa", "ka"]
TL_SUFFIXES = ["han", "hin", "an", "in"]
CEB_PREFIXES = ["ginapang", "gipang", "ginapa", "gina", "gim", "gin",
                "ging", "nagpa", "magpa", "maka", "naka", "nipa",
                "nag", "mag", "pag", "gim", "gin", "gi", "mi", "ni",
                "mo", "na"]
CEB_SUFFIXES = ["hanan", "anan", "han", "hon", "non", "onon", "on",
                "an", "ha", "hi", "a", "i"]
ILO_PREFIXES = ["makapag", "nakapag", "mang", "nang", "panag", "pag",
                "nag", "ag", "ma", "na", "pa"]
ILO_SUFFIXES = ["en", "an", "in"]


def _is_cons(ch: str) -> bool:
    return "a" <= ch <= "z" and ch not in _VOWELS


def _infix(w: str, min_len: int) -> str:
    """shared um/in infix strip (tl uses min_len 4 with per-branch
    guards; ceb/ilo use the plain shape)."""
    if len(w) <= 4:
        return w
    if w.startswith(("um", "in")):
        return w[2:]
    if _is_cons(w[0]) and len(w) > 5 and w[1:3] in ("um", "in"):
        return w[0] + w[3:]
    return w


def _redup(w: str, triple: bool = False) -> str:
    h = w.find("-")
    if 0 < h < len(w) - 1:
        first, second = w[:h], w[h + 1:]
        if first and first == second:
            return first
    if triple and len(w) >= 6 and w[:3] == w[3:6]:
        return w[3:]
    if (len(w) >= 4 and _is_cons(w[0]) and w[1] in _VOWELS
            and w[0] == w[2] and w[1] == w[3]):
        return w[2:]
    return w


def tagalog_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    if len(w) > 2 and w.endswith(("'t", "'y")):
        w = w[:-2]
    if len(w) > 2 and w[0] == w[1] and w[0] in _VOWELS:
        w = w[1:]
    for p in TL_PREFIXES:
        if len(w) > len(p) + 2 and w.startswith(p):
            if p in ("ma", "pa", "ka"):
                if (len(w) > len(p) and _is_cons(w[len(p)])
                        and len(w) > len(p) + 3):
                    w = w[len(p):]
                    break
                continue
            w = w[len(p):]
            break
    # tl infix: per-branch guards differ from the shared shape
    if len(w) > 3:
        if w.startswith("um") and len(w) > 4:
            w = w[2:]
        elif w.startswith("in") and len(w) > 4:
            w = w[2:]
        elif _is_cons(w[0]) and len(w) > 4 and w[1:3] in ("um", "in"):
            w = w[0] + w[3:]
    h = w.find("-")
    if 0 < h < len(w) - 1 and w[:h] and w[:h] == w[h + 1:]:
        w = w[:h]
    elif (len(w) >= 4 and _is_cons(w[0]) and w[1] in _VOWELS
          and w[0] == w[2] and w[1] == w[3]):
        w = w[2:]
    for s in TL_SUFFIXES:
        if len(w) > len(s) + 2 and w.endswith(s):
            return w[:len(w) - len(s)]
    return w


def _ceb_contractions(w: str) -> str:
    if len(w) > 3 and w.endswith(("'g", "'y")):
        return w[:-2]
    if len(w) > 4 and w.endswith("'ng"):
        return w[:-3]
    return w


def _ceb_prefix(w: str) -> str:
    if len(w) >= 6 and w.startswith(("mang", "pang")):
        return w[4:]
    if len(w) >= 5 and w.startswith(("man", "pan")):
        return "t" + w[3:]
    if len(w) >= 5 and w.startswith(("mam", "pam")):
        return "p" + w[3:]
    for p in CEB_PREFIXES:
        if len(w) > len(p) + 3 and w.startswith(p):
            return w[len(p):]
    return w


def _strip_sfx_gt(w: str, suffixes, extra: int) -> str:
    for s in suffixes:
        if len(w) > len(s) + extra and w.endswith(s):
            return w[:len(w) - len(s)]
    return w


def cebuano_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    w = _ceb_contractions(w)
    w = _ceb_prefix(w)
    w = _infix(w, 4)
    w = _redup(w)
    w = _strip_sfx_gt(w, CEB_SUFFIXES, 3)
    return _strip_sfx_gt(w, CEB_SUFFIXES, 3)


def ilocano_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    for p in ILO_PREFIXES:
        if len(w) >= len(p) + 3 and w.startswith(p):
            w = w[len(p):]
            break
    w = _infix(w, 4)
    w = _redup(w, triple=True)
    return _strip_sfx_gt(w, ILO_SUFFIXES, 3)


class TagalogAnalyzer(_ExtraAnalyzer):
    name = "tagalog"
    stop_words = TAGALOG_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return tagalog_stem(tok)


class CebuanoAnalyzer(_ExtraAnalyzer):
    name = "cebuano"
    stop_words = CEBUANO_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return cebuano_stem(tok)


class IlocanoAnalyzer(_ExtraAnalyzer):
    name = "ilocano"
    stop_words = ILOCANO_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return ilocano_stem(tok)
