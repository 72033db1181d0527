"""Hungarian analysis chain (UniNE light stemmer).

Reference chain (``/root/reference/analysis/common/.../hu/HungarianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → HungarianLightStemFilter.

The stemmer (``hu/HungarianLightStemmer.kt``; Savoy, "Light Stemming
Approaches for the French, Portuguese, German and Hungarian
Languages"): accent fold (á→a ë/é→e í→i ó/ő/õ/ö→o ú/ű/ũ/û/ü→u), then
case-suffix removal (kent; 3-char case endings; doubled-consonant+al/el;
2-char endings; t/n strip; doubled-consonant+a/e), possessives
(atok/otok/etek/itek/itok, unk/tok/tek/juk/ink, am..uk/nk/ja/je/im/id/
ik, final a/e/m/d/i with vowel-context guards), plural (k after a/o/e
or consonant), and final a/e/i/o normalization.

SQL mirror: ``oracle.bm25_hungarian_topk`` (same rules as CASE stages).
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

HUNGARIAN_STOP_WORDS = frozenset("""
a abban ahhoz ahogy ahol aki akik akkor alatt amely amelyek amelyekben amelyeket amelyet amelynek ami amikor amit amolyan amíg annak arra arról az azok azon azonban azt aztán azután azzal azért be belül benne bár cikk cikkek cikkeket csak de e ebben eddig egy egyes egyetlen egyik egyre egyéb egész ehhez ekkor el ellen első elég elő először előtt emilyen ennek erre ez ezek ezen ezt ezzel ezért fel felé hanem hiszen hogy hogyan igen ill ill. illetve ilyen ilyenkor ismét ison itt jobban jó jól kell kellett keressünk keresztül ki kívül között közül legalább legyen lehet lehetett lenne lenni lesz lett maga magát majd meg mellett mely melyek mert mi mikor milyen minden mindenki mindent mindig mint mintha mit mivel miért most már más másik még míg nagy nagyobb nagyon ne nekem neki nem nincs néha néhány nélkül olyan ott pedig persze rá s saját sem semmi sok sokat sokkal szemben szerint szinte számára talán tehát teljes tovább továbbá több ugyanis utolsó után utána vagy vagyis vagyok valaki valami valamint való van vannak vele vissza viszont volna volt voltak voltam voltunk által általában át én éppen és így össze úgy új újabb újra ő ők őket
""".split())

HU_VOWELS = frozenset("aeiouy")
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")


def _hu_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return w[:-3]
        if w.endswith(("al", "el")) and w[-3] not in HU_VOWELS \
                and w[-3] == w[-4]:
            return w[:-3]
    if n > 4:
        if w.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return w[:-2]
        if w.endswith(("on", "en")) and w[-3] not in HU_VOWELS:
            return w[:-2]
        c = w[-1]
        if c in "tn":
            return w[:-1]
        if c in "ae" and w[-2] == w[-3] and w[-2] not in HU_VOWELS:
            return w[:-2]
    return w


def _hu_poss(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in HU_VOWELS and w.endswith(("atok", "otok", "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if n > 5:
        if w[-4] not in HU_VOWELS and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in HU_VOWELS and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in HU_VOWELS and w.endswith(
                ("am", "em", "om", "ad", "ed", "od", "uk")):
            return w[:-2]
        if w[-3] in HU_VOWELS and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if n > 3:
        c = w[-1]
        if c in "ae" and w[-2] not in HU_VOWELS:
            return w[:-1]
        if c in "md" and w[-2] in HU_VOWELS:
            return w[:-1]
        if c == "i":
            return w[:-1]
    return w


def _hu_plural(w: str) -> str:
    n = len(w)
    if n > 3 and w[-1] == "k":
        if w[-2] in "aoe":
            return w[:-2] if n > 4 else w[:-1]
        return w[:-1]
    return w


def hungarian_stem(w: str) -> str:
    w = w.translate(_HU_FOLD)
    w = _hu_case(w)
    w = _hu_poss(w)
    w = _hu_plural(w)
    if len(w) > 3 and w[-1] in "aeio":
        return w[:-1]
    return w


class HungarianAnalyzer(_RomanceAnalyzer):
    name = "hungarian"
    stop_words = HUNGARIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return hungarian_stem(tok)
