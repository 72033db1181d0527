"""Russian analysis chain (Snowball stemmer).

Reference chain (``/root/reference/analysis/common/.../ru/RussianAnalyzer.kt``):
StandardTokenizer → LowerCase → StopFilter(snowball russian stop list) →
SnowballFilter(RussianStemmer).

The stemmer implements the published Snowball Russian algorithm
(https://snowballstem.org/algorithms/russian/stemmer.html; reference
``tartarus/snowball/ext/RussianStemmer.kt`` is the generated form):

0. fold ``ё`` → ``е``; mark RV (after the first vowel) and R2 (after the
   first non-vowel following a vowel inside R1).  Every suffix below
   must lie wholly inside RV.
1. try PERFECTIVE GERUND (``в/вши/вшись`` after ``а``/``я``, or the
   ``ив/ыв``-prefixed forms unconditionally): delete and skip to step 2.
   Otherwise drop a REFLEXIVE ending (``ся``/``сь``) if present, then
   try in order: ADJECTIVAL (adjective ending, then optionally a
   participle ending with the same а/я convention), VERB, NOUN — first
   group that fires wins.
2. drop a trailing ``и``.
3. DERIVATIONAL ``ост``/``ость`` only when inside R2.
4. tidy up: ``ейше``/``ейш`` deleted (then ``нн`` → ``н``), ``нн`` →
   ``н``, trailing ``ь`` dropped.

Snowball among semantics throughout: the LONGEST listed suffix is
matched; if its condition fails the whole step fails with no fallback
to shorter entries.  The oracle mirror (``oracle.russian_preamble``)
GENERATES the equivalent SQL cascades from the tables below.
Conformance vectors from the reference TestRussianAnalyzer.kt live in
tests/test_russian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

# snowball russian stop list (BSD-licensed public data the reference
# embeds as RussianAnalyzer.kt DEFAULT_STOPWORD_DATA; ё already folded)
RUSSIAN_STOP_WORDS = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам сказал ведь там потом себя ничего ей может они тут где есть надо
ней для мы тебя их чем была сам чтоб без будто человек чего раз тоже
себе под жизнь будет ж тогда кто этот говорил того потому этого какой
совсем ним здесь этом один почти мой тем чтобы нее кажется сейчас были
куда зачем сказать всех никогда сегодня можно при наконец два об другой
хоть после над больше тот через эти нас про всего них какая много разве
сказала три эту моя впрочем хорошо свою этой перед иногда лучше чуть
том нельзя такой им более всегда конечно всю между
""".split())

RU_VOWELS = frozenset("аеиоуыэюя")

# (suffix, action) sorted longest-first; action 1 = delete only after
# а/я (inside RV), action 2 = delete unconditionally.
RU_PERF_GERUND = sorted([
    ("в", 1), ("ив", 2), ("ыв", 2), ("вши", 1), ("ивши", 2), ("ывши", 2),
    ("вшись", 1), ("ившись", 2), ("ывшись", 2),
], key=lambda t: -len(t[0]))

RU_ADJECTIVE = sorted([
    (s, 1) for s in ("ее ие ое ые ими ыми ей ий ой ый ем им ом ым его "
                     "ого ему ому их ых ею ою ую юю ая яя").split()
], key=lambda t: -len(t[0]))

RU_PARTICIPLE = sorted([
    ("ем", 1), ("нн", 1), ("вш", 1), ("ивш", 2), ("ывш", 2), ("щ", 1),
    ("ющ", 1), ("ующ", 2),
], key=lambda t: -len(t[0]))

RU_REFLEXIVE = sorted([("сь", 1), ("ся", 1)], key=lambda t: -len(t[0]))

RU_VERB = sorted([
    ("ла", 1), ("ила", 2), ("ыла", 2), ("на", 1), ("ена", 2), ("ете", 1),
    ("ите", 2), ("йте", 1), ("ейте", 2), ("уйте", 2), ("ли", 1),
    ("или", 2), ("ыли", 2), ("й", 1), ("ей", 2), ("уй", 2), ("л", 1),
    ("ил", 2), ("ыл", 2), ("ем", 1), ("им", 2), ("ым", 2), ("н", 1),
    ("ен", 2), ("ло", 1), ("ило", 2), ("ыло", 2), ("но", 1), ("ено", 2),
    ("нно", 1), ("ет", 1), ("ует", 2), ("ит", 2), ("ыт", 2), ("ют", 1),
    ("уют", 2), ("ят", 2), ("ны", 1), ("ены", 2), ("ть", 1), ("ить", 2),
    ("ыть", 2), ("ешь", 1), ("ишь", 2), ("ю", 2), ("ую", 2),
], key=lambda t: -len(t[0]))

RU_NOUN = sorted([
    (s, 1) for s in ("а ев ов е ие ье и еи ии ами ями иями й ей ией ий "
                     "ой ам ем ием ом ям иям о у ах ях иях ы ь ю ию ью "
                     "я ия ья").split()
], key=lambda t: -len(t[0]))

RU_DERIVATIONAL = sorted([("ост", 1), ("ость", 1)],
                         key=lambda t: -len(t[0]))

RU_TIDY = sorted([("ейше", 1), ("н", 2), ("ейш", 1), ("ь", 3)],
                 key=lambda t: -len(t[0]))


def mark_rv_r2(word: str) -> tuple[int, int]:
    """RV start (after the first vowel) and R2 start (after the first
    non-vowel that follows a vowel in R1); len(word) when absent."""
    n = len(word)
    i = 0
    while i < n and word[i] not in RU_VOWELS:
        i += 1
    if i == n:
        return n, n
    pv = i + 1
    i = pv
    while i < n and word[i] in RU_VOWELS:
        i += 1
    if i == n:
        return pv, n
    i += 1  # past first non-vowel (end of R1 marker scan)
    while i < n and word[i] not in RU_VOWELS:
        i += 1
    if i == n:
        return pv, n
    i += 1  # past the R1 vowel
    while i < n and word[i] in RU_VOWELS:
        i += 1
    if i == n:
        return pv, n
    return pv, i + 1


def _longest_b(word: str, bound: int, table) -> tuple[str, int]:
    for s, a in table:
        if word.endswith(s) and len(word) - len(s) >= bound:
            return s, a
    return "", 0


def _cut_if_ay(word: str, s: str, pv: int) -> tuple[str, bool]:
    """Action 1: delete suffix only when preceded by а/я inside RV."""
    i = len(word) - len(s) - 1
    if i >= pv and word[i] in ("а", "я"):
        return word[:len(word) - len(s)], True
    return word, False


def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    pv, p2 = mark_rv_r2(w)
    if len(w) < pv:
        return w
    # --- step 1 -----------------------------------------------------
    s, a = _longest_b(w, pv, RU_PERF_GERUND)
    done = False
    if a == 1:
        w, done = _cut_if_ay(w, s, pv)
    elif a == 2:
        w, done = w[:len(w) - len(s)], True
    if not done:
        s, a = _longest_b(w, pv, RU_REFLEXIVE)
        if a:
            w = w[:len(w) - len(s)]
        s, a = _longest_b(w, pv, RU_ADJECTIVE)
        if a:
            w = w[:len(w) - len(s)]
            s, a = _longest_b(w, pv, RU_PARTICIPLE)
            if a == 1:
                w, _ = _cut_if_ay(w, s, pv)
            elif a == 2:
                w = w[:len(w) - len(s)]
        else:
            s, a = _longest_b(w, pv, RU_VERB)
            fired = False
            if a == 1:
                w, fired = _cut_if_ay(w, s, pv)
            elif a == 2:
                w, fired = w[:len(w) - len(s)], True
            if not fired:
                s, a = _longest_b(w, pv, RU_NOUN)
                if a:
                    w = w[:len(w) - len(s)]
    # --- step 2: trailing и -----------------------------------------
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]
    # --- step 3: derivational in R2 ---------------------------------
    s, a = _longest_b(w, pv, RU_DERIVATIONAL)
    if a and len(w) - len(s) >= p2:
        w = w[:len(w) - len(s)]
    # --- step 4: tidy up --------------------------------------------
    s, a = _longest_b(w, pv, RU_TIDY)
    if a == 1:
        w = w[:len(w) - len(s)]
        if w.endswith("нн") and len(w) - 2 >= pv:
            w = w[:-1]
    elif a == 2:
        if len(w) >= 2 and w[-2] == "н" and len(w) - 2 >= pv:
            w = w[:-1]
    elif a == 3:
        w = w[:-1]
    return w


class RussianAnalyzer(_RomanceAnalyzer):
    name = "russian"
    stop_words = RUSSIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return russian_stem(tok)
