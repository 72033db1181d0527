"""Finnish analysis chain.

Reference chain (``/root/reference/analysis/common/.../fi/FinnishAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(FinnishStemmer).

FinnishStemmer (``tartarus/snowball/ext/FinnishStemmer.kt``, Snowball
2.2) — full port with the generated program's exact semantics:

- regions R1/R2 (first/second vowel→non-vowel boundary over
  V1 = aeiouyäö);
- particle_etc: kin/kaan/han/… after a particle-end char, sti in R2;
- possessive: si (not after k), ni (delete; then kse→ksi — the delete
  PERSISTS even when the kse rewrite doesn't apply, mirroring the
  generated code's non-restoring failure), nsa/nsä/mme/nne,
  an/än/en after their case lists;
- case_ending (sets ending_removed): hVn with matching harmony vowel,
  seen after LONG, den/tten/siin after V2+i, n (plus one extra char
  after LONG or ie), a/ä after consonant+vowel, plain
  lla/llä/ssa/…/ksi/lle/ine, tta/ttä after e;
- other_endings (R2): mpi/mpa/mmi/mma (+ä forms) unless preceded by
  po, eja/ejä and i-superlatives unconditionally;
- i_plural (if an ending was removed) else t_plural (t after vowel,
  then R2 mma unless po / imma);
- tidy: LONG-vowel shortening, AEI-after-consonant strip, jo/ju → j
  strip, oj → o strip, final double-consonant undoubling (the only
  part not bounded by R1).

All suffix searches are bounded to start inside R1 (R2 where noted) —
a longer suffix crossing the boundary falls back to a shorter in-bounds
one, exactly like ``find_among_b`` with ``limit_backward``.

SQL mirror: ``oracle.bm25_finnish_topk`` (staged CTEs generated from
the same tables).  Vectors from TestFinnishAnalyzer.kt plus SQL parity
fuzz live in tests/test_finnish_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

FINNISH_STOP_WORDS = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin
teillä teiltä teille he heidän heidät heitä heissä heistä heihin
heillä heiltä heille tämä tämän tätä tässä tästä tähän tällä tältä
tälle tänä täksi tuo tuon tuota tuossa tuosta tuohon tuolla tuolta
tuolle tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille
sinä siksi nämä näiden näitä näissä näistä näihin näillä näiltä
näille näinä näiksi nuo noiden noita noissa noista noihin noilla
noilta noille noina noiksi ne niiden niitä niissä niistä niihin
niillä niiltä niille niinä niiksi kuka kenen kenet ketä kenessä
kenestä keneen kenellä keneltä kenelle kenenä keneksi ketkä keiden
keitä keissä keistä keihin keillä keiltä keille keinä keiksi mikä
minkä mitä missä mistä mihin millä miltä mille minä miksi mitkä joka
jonka jota jossa josta johon jolla jolta jolle jona joksi jotka
joiden joita joissa joista joihin joilla joilta joille joina joiksi
että ja jos koska kuin mutta niin sekä sillä tai vaan vai vaikka
kanssa mukaan noin poikki yli kun nyt itse
""".split())

FI_V1 = frozenset("aeiouyäö")
FI_V2 = frozenset("aeiouäö")
FI_AEI = frozenset("aeiä")
FI_C = frozenset("bcdfghjklmnpqrstvwxz")
FI_PARTICLE_END = frozenset("aeinotuyäö")

FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

# (suffix, action) tables, longest-first within each
FI_PARTICLES = [("kaan", 1), ("kään", 1), ("sti", 2), ("han", 1),
                ("hän", 1), ("kin", 1), ("pa", 1), ("pä", 1),
                ("ko", 1), ("kö", 1)]
FI_POSS = [("nsa", 3), ("nsä", 3), ("mme", 3), ("nne", 3),
           ("ni", 2), ("si", 1), ("an", 4), ("en", 6), ("än", 5)]
FI_CASE_A1 = ("lta", "sta", "lla", "ssa", "na", "ta")     # after 'an'
FI_CASE_A2 = ("ltä", "stä", "llä", "ssä", "nä", "tä")  # after 'än'
FI_CASE_A3 = ("lle", "ine")                               # after 'en'
# case_ending among: (suffix, action); -1 = unconditional delete
FI_CASE = [("seen", 10), ("tten", 9), ("siin", 9),
           ("han", 1), ("hen", 2), ("hin", 3), ("hon", 4),
           ("hän", 5), ("hön", 6), ("den", 9),
           ("lla", -1), ("ssa", -1), ("lta", -1), ("sta", -1),
           ("tta", 2), ("llä", -1), ("ssä", -1),
           ("ltä", -1), ("stä", -1), ("ttä", 2),
           ("lle", -1), ("ine", -1), ("ksi", -1),
           ("na", -1), ("ta", -1), ("nä", -1), ("tä", -1),
           ("n", 7), ("a", 8), ("ä", 8)]
FI_OTHER = [("imma", -1), ("impa", -1), ("immi", -1), ("impi", -1),
            ("immä", -1), ("impä", -1),
            ("eja", -1), ("ejä", -1),
            ("mma", 1), ("mpa", 1), ("mmi", 1), ("mpi", 1),
            ("mmä", 1), ("mpä", 1)]
for _t in (FI_PARTICLES, FI_POSS, FI_CASE, FI_OTHER):
    _t.sort(key=lambda r: -len(r[0]))


def _find_b(w: str, table, bound: int):
    """find_among_b with limit_backward=bound: longest suffix whose
    start index is >= bound."""
    for sfx, act in table:
        if len(w) - len(sfx) >= bound and w.endswith(sfx):
            return sfx, act
    return None, 0


def _ends_long(w: str) -> bool:
    return w.endswith(FI_LONG)


def _particle_etc(w: str, p1: int, p2: int) -> str:
    sfx, act = _find_b(w, FI_PARTICLES, p1)
    if sfx is None:
        return w
    s = len(w) - len(sfx)
    if act == 1:
        if s < 1 or w[s - 1] not in FI_PARTICLE_END:
            return w
    else:  # sti: R2
        if s < p2:
            return w
    return w[:s]


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    i = 0
    while i < n and w[i] not in FI_V1:
        i += 1
    while i < n and w[i] in FI_V1:
        i += 1
    if i == n:
        return n, n
    p1 = i + 1
    i = p1
    while i < n and w[i] not in FI_V1:
        i += 1
    while i < n and w[i] in FI_V1:
        i += 1
    if i == n:
        return p1, n
    return p1, i + 1


def _possessive(w: str, p1: int) -> str:
    sfx, act = _find_b(w, FI_POSS, p1)
    if sfx is None:
        return w
    s = len(w) - len(sfx)
    if act == 1:     # si, not preceded by k
        if s >= 1 and w[s - 1] == "k":
            return w
        return w[:s]
    if act == 2:     # ni: delete; then kse → ksi (delete persists)
        w = w[:s]
        if w.endswith("kse"):
            w = w[:-3] + "ksi"
        return w
    if act == 3:
        return w[:s]
    pre = {4: FI_CASE_A1, 5: FI_CASE_A2, 6: FI_CASE_A3}[act]
    if w[:s].endswith(pre):
        return w[:s]
    return w


def _case_ending(w: str, p1: int) -> tuple[str, bool]:
    sfx, act = _find_b(w, FI_CASE, p1)
    if sfx is None:
        return w, False
    s = len(w) - len(sfx)
    stem = w[:s]
    if act in (1, 2, 3, 4, 5, 6):
        need = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä",
                6: "ö"}[act]
        if not stem.endswith(need):
            return w, False
        return stem, True
    if act == 7:   # n; extend by one char after LONG or ie
        if (_ends_long(stem) or stem.endswith("ie")) and s >= 1:
            return w[:s - 1], True
        return stem, True
    if act == 8:   # a/ä after consonant+V1
        if s >= 2 and w[s - 1] in FI_V1 and w[s - 2] in FI_C:
            return stem, True
        return w, False
    if act == 9:   # VI: i preceded by V2
        if stem.endswith("i") and len(stem) >= 2 and stem[-2] in FI_V2:
            return stem, True
        return w, False
    if act == 10:  # LONG
        if _ends_long(stem):
            return stem, True
        return w, False
    return stem, True   # -1


def _other_endings(w: str, p2: int) -> str:
    sfx, act = _find_b(w, FI_OTHER, p2)
    if sfx is None:
        return w
    s = len(w) - len(sfx)
    if act == 1 and w[:s].endswith("po"):
        return w
    return w[:s]


def _i_plural(w: str, p1: int) -> str:
    if len(w) - 1 >= p1 and w.endswith(("i", "j")):
        return w[:-1]
    return w


def _t_plural(w: str, p1: int, p2: int) -> str:
    if not (len(w) - 1 >= p1 and w.endswith("t")):
        return w
    # preceding char must be V1 and strictly past R1's start
    if not (len(w) - 2 >= p1 and w[-2] in FI_V1):
        return w
    w = w[:-1]
    sfx, act = _find_b(w, [("imma", -1), ("mma", 1)], p2)
    if sfx is None:
        return w
    s = len(w) - len(sfx)
    if act == 1 and w[:s].endswith("po"):
        return w
    return w[:s]


def _tidy(w: str, p1: int) -> str:
    # LONG shorten: double vowel starting at >= p1 → drop one char
    if len(w) - 2 >= p1 and _ends_long(w):
        w = w[:-1]
    # final AEI vowel after a consonant (both chars at index >= p1)
    if (len(w) - 2 >= p1 and w[-1] in FI_AEI and w[-2] in FI_C):
        w = w[:-1]
    # j after o/u (both at >= p1)
    if len(w) - 2 >= p1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    # o after j (both at >= p1)
    if len(w) - 2 >= p1 and w.endswith("jo"):
        w = w[:-1]
    # undouble the final consonant pair (not R1-bounded)
    i = len(w)
    while i > 0 and w[i - 1] in FI_V1:
        i -= 1
    if i > 0 and w[i - 1] in FI_C and i >= 2 and w[i - 2] == w[i - 1]:
        w = w[:i - 1] + w[i:]
    return w


def finnish_stem(w: str) -> str:
    p1, p2 = _regions(w)
    w2 = _particle_etc(w, p1, p2)
    w2 = _possessive(w2, p1)
    w2, removed = _case_ending(w2, p1)
    w2 = _other_endings(w2, p2)
    if removed:
        w2 = _i_plural(w2, p1)
    else:
        w2 = _t_plural(w2, p1, p2)
    return _tidy(w2, p1)


class FinnishAnalyzer(_RomanceAnalyzer):
    name = "finnish"
    stop_words = FINNISH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return finnish_stem(tok)
