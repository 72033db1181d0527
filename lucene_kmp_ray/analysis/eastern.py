"""Czech / Bulgarian / Latvian analysis chains (light stemmers).

Reference chains (``/root/reference/analysis/common/.../{cz,bg,lv}/``):
StandardTokenizer → LowerCase → StopFilter(default list) → light stem
filter:

- **Czech** (``cz/CzechStemmer.kt``, Dolamic & Savoy "Indexing and
  stemming approaches for the Czech language"): case-suffix removal by
  length tier, possessive ``ov/in/ův`` removal, then palatalization
  normalization (čt→ck, št→sk, c/č→k, z/ž→h, e-insertion undo, ů→o).
- **Bulgarian** (``bg/BulgarianStemmer.kt``, Savoy BUIR): definite
  article removal, plural normalization (овци/ове/еве/ища/ци/зи/си with
  rewrites), final я/а/о/е strip, ен→н, ъN→N.
- **Latvian** (``lv/LatvianStemmer.kt``, light version of Kreslin's
  thesis): first matching affix from a fixed table (each with a minimum
  remaining-vowel count and a 3-char stem floor); declension II/V/VI
  affixes un-palatalize the stem (kš→kst, ņņ→nn after -u; pj/bj/mj/vj
  drop j; šņ/žņ/šļ/žļ/ļņ/ļļ and final č/ļ/ņ rewrites).

Stop lists are the reference defaults (Savoy's BSD lists / the Czech
list embedded in CzechAnalyzer.kt).  The oracle mirrors
(``oracle.eastern_preamble``) are GENERATED as SQL CASE cascades from
the same tables, so Ray and DuckDB agree by construction.  Conformance
vectors from Test{Czech,Bulgarian,Latvian}Stemmer.kt live in
tests/test_eastern_analyzers.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

CZECH_STOP_WORDS = frozenset("""
a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta tomto
tohle tuto tyto jej zda proč máte tata kam tohoto kdo kteří mi nám tom
tomuto mít nic proto kterou byla toho protože asi ho naši napište re
což tím takže svých její svými jste aj tu tedy teto bylo kde ke pravé
ji nad nejsou či pod téma mezi přes ty pak vám ani když však neg jsem
tento článku články aby jsme před pta jejich byl ještě až bez také
pouze první vaše která nás nový tipy pokud může strana jeho své jiné
zprávy nové není vás jen podle zde už být více bude již než který by
které co nebo ten tak má při od po jsou jak další ale si se ve to jako
za zpět ze do pro je na atd atp jakmile přičemž já on ona ono oni ony
my vy jí ji mě mne jemu tomu těm těmu němu němuž jehož jíž jelikož jež
jakož načež
""".split())

BULGARIAN_STOP_WORDS = frozenset("""
а аз ако ала бе без беше би бил била били било близо бъдат бъде бяха в
вас ваш ваша вероятно вече взема ви вие винаги все всеки всички всичко
всяка във въпреки върху г ги главно го д да дали до докато докога дори
досега доста е едва един ето за зад заедно заради засега затова защо
защото и из или им има имат иска й каза как каква какво както какъв
като кога когато което които кой който колко която къде където към ли
м ме между мен ми мнозина мога могат може моля момента му н на над
назад най направи напред например нас не него нея ни ние никой нито но
някои някой няма обаче около освен особено от отгоре отново още пак по
повече повечето под поне поради после почти прави пред преди през при
пък първо с са само се сега си скоро след сме според сред срещу сте
съм със също т тази така такива такъв там твой те тези ти тн то това
тогава този той толкова точно трябва тук тъй тя тях у харесва ч че
често чрез ще щом я
""".split())

LATVIAN_STOP_WORDS = frozenset("""
aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad
lejpus līdz no otrpus pa par pār pēc pie pirms pret priekš starp šaipus
uz viņpus virs virspus zem apakšpus un bet jo ja ka lai tomēr tikko
turpretī arī kaut gan tādēļ tā ne tikvien vien kā ir te vai kamēr
diezin droši diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz tik
nevis turpretim jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu
tālab tāpēc nekā itin jā jau jel nē nezin tad tikai vis tak iekams būt
biju biji bija bijām bijāt esmu esi esam esat būšu būsi būs būsim
būsiet tikt tiku tiki tika tikām tikāt tieku tiec tiek tiekam tiekat
tikšu tiks tiksim tiksiet tapt tapi tapāt topat tapšu tapsi taps
tapsim tapsiet kļūt kļuvu kļuvi kļuva kļuvām kļuvāt kļūstu kļūsti
kļūst kļūstam kļūstat kļūšu kļūsi kļūs kļūsim kļūsiet varēt varēju
varējām varēšu varēsim var varēji varējāt varēsi varēsiet varat varēja
varēs
""".split())

# ---------------------------------------------------------------- Czech --
# (suffix-tier, chars-removed) per CzechStemmer.removeCase length guards
CZ_CASE_TIERS = [
    (7, 5, ("atech",)),
    (6, 4, ("ětem", "etem", "atům")),
    (5, 3, ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
            "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
            "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi",
            "ými")),
    (4, 2, ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
            "ým", "mi", "ou")),
]
CZ_FINAL_VOWELS = "aeiouůyáéíýě"


def czech_stem(w: str) -> str:
    # removeCase
    for min_len, cut, suffixes in CZ_CASE_TIERS:
        if len(w) > min_len and w.endswith(suffixes):
            w = w[:-cut]
            break
    else:
        if len(w) > 3 and w[-1] in CZ_FINAL_VOWELS:
            w = w[:-1]
    # removePossessives
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    # normalize (palatalization undo)
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# ------------------------------------------------------------ Bulgarian --
def _bg_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:-3]
    if n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        return w[:-2]
    if n > 4 and w.endswith("ят"):
        return w[:-2]
    return w


def _bg_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:-3]
        if w.endswith("ове"):
            return w[:-3]
        if w.endswith("еве"):
            return w[:-3] + "й"
    if n > 5:
        if w.endswith("ища"):
            return w[:-3]
        if w.endswith("та"):
            return w[:-2]
        if w.endswith("ци"):
            return w[:-2] + "к"
        if w.endswith("зи"):
            return w[:-2] + "г"
        if w[-3] == "е" and w[-1] == "и":
            return w[:-3] + "я" + w[-2]
    if n > 4:
        if w.endswith("си"):
            return w[:-2] + "х"
        if w.endswith("и"):
            return w[:-1]
    return w


def bulgarian_stem(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_article(w)
    w = _bg_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# -------------------------------------------------------------- Latvian --
# (affix, min-vowel-count, palatalizes) in LatvianStemmer table order —
# FIRST match wins (fixed order, not longest-match).
LV_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
]
LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(w: str, removed: str) -> str:
    if removed[0] == "u":
        if w.endswith("kš"):
            return w[:-1] + "st"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    if w.endswith("šņ"):
        return w[:-2] + "sn"
    if w.endswith("žņ"):
        return w[:-2] + "zn"
    if w.endswith("šļ"):
        return w[:-2] + "sl"
    if w.endswith("žļ"):
        return w[:-2] + "zl"
    if w.endswith("ļņ"):
        return w[:-2] + "ln"
    if w.endswith("ļļ"):
        return w[:-2] + "ll"
    if w.endswith("č"):
        return w[:-1] + "c"
    if w.endswith("ļ"):
        return w[:-1] + "l"
    if w.endswith("ņ"):
        return w[:-1] + "n"
    return w


def latvian_stem(w: str) -> str:
    nv = sum(1 for c in w if c in LV_VOWELS)
    for sfx, vc, pal in LV_AFFIXES:
        if nv > vc and len(w) >= len(sfx) + 3 and w.endswith(sfx):
            stem = w[:len(w) - len(sfx)]
            return _lv_unpalatalize(stem, sfx) if pal else stem
    return w


class CzechAnalyzer(_RomanceAnalyzer):
    name = "czech"
    stop_words = CZECH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return czech_stem(tok)


class BulgarianAnalyzer(_RomanceAnalyzer):
    name = "bulgarian"
    stop_words = BULGARIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return bulgarian_stem(tok)


class LatvianAnalyzer(_RomanceAnalyzer):
    name = "latvian"
    stop_words = LATVIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return latvian_stem(tok)
