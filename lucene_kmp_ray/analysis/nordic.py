"""Danish / Norwegian / Swedish analysis chains (Snowball stemmers).

Reference chains (``/root/reference/analysis/common/.../{da,no,sv}/``
``DanishAnalyzer.kt`` / ``NorwegianAnalyzer.kt`` / ``SwedishAnalyzer.kt``):
StandardTokenizer → LowerCase → StopFilter(snowball stop list) →
SnowballFilter(<Lang>Stemmer).

The stemmers implement the published Snowball 2.x algorithms
(https://snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html;
reference ``tartarus/snowball/ext/{Danish,Norwegian,Swedish}Stemmer.kt`` is
the generated form of the same scripts).  Each algorithm marks region R1
(after the first non-vowel that follows a vowel, but starting no earlier
than position 3), then applies at the end of the word:

1. *main suffix*  — longest listed suffix lying wholly in R1: delete
   (or for a bare ``s``, delete only after a valid s-ending; Norwegian
   ``ert(e)`` maps to ``er``).
2. *consonant pair* — a listed consonant pair at the end, in R1: drop the
   last letter (``friskt`` → ``frisk``).
3. *other suffix* — ``ig``/``lig``/``els``-style derivational endings in
   R1 are deleted (Danish re-runs the consonant-pair rule after; Swedish
   maps ``öst``→``ös`` / ``fullt``→``full``; Danish strips ``st`` from
   ``igst`` and maps ``løst``→``løs``).
4. *undouble* (Danish only) — a doubled final consonant in R1 loses one.

The stop lists are the snowball project's (public-domain data the
reference embeds in each analyzer's DEFAULT_STOPWORD_DATA).

The oracle mirror (``oracle.nordic_preamble``) GENERATES the equivalent
SQL CASE cascades from the same suffix tables below, so Ray and DuckDB
stay in sync by construction.  Conformance vectors (reference
Test{Danish,Norwegian,Swedish}Analyzer.kt plus snowball sample words)
live in tests/test_nordic_analyzers.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

DANISH_STOP_WORDS = frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os
op man hans hvor eller hvad skal selv her alle vil blev kunne ind når
være dog noget ville jo deres efter ned skulle denne end dette mit også
under have dig anden hende mine alt meget sit sine vor mod disse hvis
din nogle hos blive mange ad bliver hendes været thi jer sådan
""".split())

NORWEGIAN_STOP_WORDS = frozenset("""
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra
du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her
alle vil bli ble blei blitt kunne inn når være kom noen noe ville dere
deres kun ja etter ned skulle denne for deg si sine sitt mot å meget
hvorfor dette disse uten hvordan ingen din ditt blir samme hvilken
hvilke sånn inni mellom vår hver hvem vors hvis både bare enn fordi før
mange også slik vært båe begge siden dykk dykkar dei deira deires deim
di då eg ein eit eitt elles honom hjå ho hoe henne hennar hennes hoss
hossen ingi inkje korleis korso kva kvar kvarhelst kven kvi kvifor me
medan mi mine mykje no nokon noka nokor noko nokre sia sidan so somt
somme um upp vere vore verte vort varte vart
""".split())

SWEDISH_STOP_WORDS = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
din dessa några deras blir mina samma vilken er sådan vår blivit dess
inom mellan sådant varför varje vilka ditt vem vilket sitt sådana vart
dina vars vårt våra ert era vilkas
""".split())

# ---------------------------------------------------------------- tables --
# (suffix, action) — actions are per-language; tables sorted longest-first
# so a linear scan is a longest-match (Snowball among semantics).

DA_VOWELS = frozenset("aeiouyæåø")
DA_S_ENDINGS = frozenset("abcdfghjklmnoprtvyzå")
DA_MAIN = sorted([
    ("hed", 1), ("ethed", 1), ("ered", 1), ("e", 1), ("erede", 1),
    ("ende", 1), ("erende", 1), ("ene", 1), ("erne", 1), ("ere", 1),
    ("en", 1), ("heden", 1), ("eren", 1), ("er", 1), ("heder", 1),
    ("erer", 1), ("s", 2), ("heds", 1), ("es", 1), ("endes", 1),
    ("erendes", 1), ("enes", 1), ("ernes", 1), ("eres", 1), ("ens", 1),
    ("hedens", 1), ("erens", 1), ("ers", 1), ("ets", 1), ("erets", 1),
    ("et", 1), ("eret", 1),
], key=lambda t: -len(t[0]))
DA_PAIRS = ("gd", "dt", "gt", "kt")
DA_OTHER = sorted([
    ("ig", 1), ("lig", 1), ("elig", 1), ("els", 1), ("løst", 2),
], key=lambda t: -len(t[0]))
DA_DOUBLE_C = frozenset("bcdfghjklmnpqrstvwxz")

NO_VOWELS = frozenset("aeiouyåæø")
NO_S_ENDINGS = frozenset("bcdfghjlmnoprtvyz")
NO_MAIN = sorted([
    ("a", 1), ("e", 1), ("ede", 1), ("ande", 1), ("ende", 1), ("ane", 1),
    ("ene", 1), ("hetene", 1), ("erte", 3), ("en", 1), ("heten", 1),
    ("ar", 1), ("er", 1), ("heter", 1), ("s", 2), ("as", 1), ("es", 1),
    ("edes", 1), ("endes", 1), ("enes", 1), ("hetenes", 1), ("ens", 1),
    ("hetens", 1), ("ers", 1), ("ets", 1), ("et", 1), ("het", 1),
    ("ert", 3), ("ast", 1),
], key=lambda t: -len(t[0]))
NO_PAIRS = ("dt", "vt")
NO_OTHER = sorted([
    ("leg", 1), ("eleg", 1), ("ig", 1), ("eig", 1), ("lig", 1),
    ("elig", 1), ("els", 1), ("lov", 1), ("elov", 1), ("slov", 1),
    ("hetslov", 1),
], key=lambda t: -len(t[0]))

SV_VOWELS = frozenset("aeiouyäåö")
SV_S_ENDINGS = frozenset("bcdfghjklmnoprtvy")
SV_OST_ENDINGS = frozenset("iklnprtuv")
SV_MAIN = sorted([
    ("a", 1), ("arna", 1), ("erna", 1), ("heterna", 1), ("orna", 1),
    ("ad", 1), ("e", 1), ("ade", 1), ("ande", 1), ("arne", 1),
    ("are", 1), ("aste", 1), ("en", 1), ("anden", 1), ("aren", 1),
    ("heten", 1), ("ern", 1), ("ar", 1), ("er", 1), ("heter", 1),
    ("or", 1), ("s", 2), ("as", 1), ("arnas", 1), ("ernas", 1),
    ("ornas", 1), ("es", 1), ("ades", 1), ("andes", 1), ("ens", 1),
    ("arens", 1), ("hetens", 1), ("erns", 1), ("at", 1), ("andet", 1),
    ("het", 1), ("ast", 1),
], key=lambda t: -len(t[0]))
SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
SV_OTHER = sorted([
    ("ig", 1), ("lig", 1), ("els", 1), ("fullt", 3), ("öst", 2),
], key=lambda t: -len(t[0]))


def mark_r1(word: str, vowels: frozenset[str]) -> int:
    """R1 start: past the first non-vowel following a vowel, floored at 3
    (Snowball ``R1 ... and restricted so that it must begin no earlier
    than position 3``).  len(word) when no such position exists."""
    n = len(word)
    if n < 3:
        return n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    if i == n:
        return n
    i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i == n:
        return n
    return max(i + 1, 3)


def _longest(word: str, p1: int, table) -> tuple[str, int]:
    """Longest (suffix, action) whose suffix ends word wholly inside R1."""
    for s, a in table:
        if word.endswith(s) and len(word) - len(s) >= p1:
            return s, a
    return "", 0


def _drop_pair_last(word: str, p1: int, pairs) -> str:
    """Consonant-pair rule: listed pair at the end within R1 → drop the
    final letter."""
    for s in pairs:
        if word.endswith(s) and len(word) - 2 >= p1:
            return word[:-1]
    return word


def danish_stem(word: str) -> str:
    p1 = mark_r1(word, DA_VOWELS)
    s, a = _longest(word, p1, DA_MAIN)
    if a == 1:
        word = word[:len(word) - len(s)]
    elif a == 2 and len(word) >= 2 and word[-2] in DA_S_ENDINGS:
        word = word[:-1]
    word = _drop_pair_last(word, p1, DA_PAIRS)
    if word.endswith("igst"):
        word = word[:-2]
    s, a = _longest(word, p1, DA_OTHER)
    if a == 1:
        word = word[:len(word) - len(s)]
        word = _drop_pair_last(word, p1, DA_PAIRS)
    elif a == 2:  # løst → løs
        word = word[:-1]
    if (len(word) >= 2 and word[-1] in DA_DOUBLE_C
            and word[-1] == word[-2] and len(word) - 1 >= p1):
        word = word[:-1]
    return word


def norwegian_stem(word: str) -> str:
    p1 = mark_r1(word, NO_VOWELS)
    s, a = _longest(word, p1, NO_MAIN)
    if a == 1:
        word = word[:len(word) - len(s)]
    elif a == 2:
        prev = word[-2] if len(word) >= 2 else ""
        if prev in NO_S_ENDINGS or (
                prev == "k" and len(word) >= 3
                and word[-3] not in NO_VOWELS):
            word = word[:-1]
    elif a == 3:  # ert / erte → er
        word = word[:len(word) - len(s)] + "er"
    word = _drop_pair_last(word, p1, NO_PAIRS)
    s, a = _longest(word, p1, NO_OTHER)
    if a == 1:
        word = word[:len(word) - len(s)]
    return word


def swedish_stem(word: str) -> str:
    p1 = mark_r1(word, SV_VOWELS)
    s, a = _longest(word, p1, SV_MAIN)
    if a == 1:
        word = word[:len(word) - len(s)]
    elif a == 2 and len(word) >= 2 and word[-2] in SV_S_ENDINGS:
        word = word[:-1]
    word = _drop_pair_last(word, p1, SV_PAIRS)
    s, a = _longest(word, p1, SV_OTHER)
    if a == 1:
        word = word[:len(word) - len(s)]
    elif a == 2:  # öst → ös, after a listed letter
        if len(word) >= 4 and word[-4] in SV_OST_ENDINGS:
            word = word[:-1]
    elif a == 3:  # fullt → full
        word = word[:-1]
    return word


class DanishAnalyzer(_RomanceAnalyzer):
    name = "danish"
    stop_words = DANISH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return danish_stem(tok)


class NorwegianAnalyzer(_RomanceAnalyzer):
    name = "norwegian"
    stop_words = NORWEGIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return norwegian_stem(tok)


class SwedishAnalyzer(_RomanceAnalyzer):
    name = "swedish"
    stop_words = SWEDISH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return swedish_stem(tok)
