"""Tamil analysis chain (snowball TamilStemmer, kmp semantics).

Reference chain (``/root/reference/analysis/common/.../ta/TamilAnalyzer.kt``
createComponents): StandardTokenizer → LowerCase → DecimalDigitFilter →
IndicNormalizationFilter → StopFilter → SnowballFilter(TamilStemmer).

The stemmer is an exact port of the generated snowball code
(``tartarus/snowball/ext/TamilStemmer.kt``, Snowball 2.2.0): forward
prefix removal (question/pronoun prefixes with the va-start fixup),
backward plural / question / command / um / common-word-ending /
vetrumai-urupukal / tense suffix removal, the repeated fix_ending
normalization pass, and the found_vetrumai_urupu / found_a_match flags.
``stem()`` always succeeds for words longer than 4 chars (no
keep-original path beyond the length gate).

Digit fold and IndicNormalization reuse the shared
``analysis.indic.fold_digits`` / ``indic_normalize`` (whose compose
table already carries the TAMIL block flags). Vectors from
TestTamilAnalyzer.kt live in tests/test_tamil_analyzer.py.
"""

from __future__ import annotations

from .indic import fold_digits, indic_normalize
from .romance import _RomanceAnalyzer

TAMIL_STOP_WORDS = frozenset("""
ஒரு என்று மற்றும் இந்த இது என்ற கொண்டு என்பது பல ஆகும் அல்லது அவர் நான்
உள்ள அந்த இவர் என முதல் என்ன இருந்து சில என் போன்ற வேண்டும் வந்து இதன் அது
அவன் தான் பலரும் என்னும் மேலும் பின்னர் கொண்ட இருக்கும் தனது உள்ளது போது
என்றும் அதன் தன் பிறகு அவர்கள் வரை அவள் நீ ஆகிய இருந்தது உள்ளன வந்த இருந்த
மிகவும் இங்கு மீது ஓர் இவை இந்தக் பற்றி வரும் வேறு இரு இதில் போல் இப்போது
அவரது மட்டும் இந்தப் எனும் மேல் பின் சேர்ந்த ஆகியோர் எனக்கு இன்னும் அந்தப்
அன்று ஒரே மிக அங்கு பல்வேறு விட்டு பெரும் அதை பற்றிய உன் அதிக அந்தக் பேர்
இதனால் அவை அதே ஏன் முறை யார் என்பதை எல்லாம் மட்டுமே இங்கே அங்கே இடம்
இடத்தில் அதில் நாம் அதற்கு எனவே பிற சிறு மற்ற விட எந்த எனவும் எனப்படும்
எனினும் அடுத்த இதனை இதை கொள்ள இந்தத் இதற்கு அதனால் தவிர போல வரையில் சற்று
எனக்
""".split())

# among tables (TamilStemmer.kt a_0..a_26) as (suffix, action) — longest
# structural match wins (find_among/find_among_b)
A0 = [("வு", 3), ("வூ", 4), ("வொ", 2), ("வோ", 1)]
A1 = [(c, -1) for c in "கஙசஞதநபமயவ"]
A2 = [(c, -1) for c in "ிீை"]
A3 = [(c, -1) for c in "ாிீுூெேை"]
A4 = [("", 2), ("ை", 1), ("்", 1)]
A5 = [("ந்த", 1), ("ய", 1), ("வ", 1), ("னு", 8), ("ுக்", 7), ("ுக்க்", 7),
      ("ட்க்", 3), ("ற்க்", 4), ("ங்", 9), ("ட்ட்", 5), ("த்த்", 6),
      ("ந்த்", 1), ("ந்", 1), ("ட்ப்", 3), ("ய்", 2), ("ன்ற்", 4),
      ("வ்", 1)]
A6 = [(c, -1) for c in "கசடதபற"]
A7 = A6
A8 = [(c, -1) for c in "ஞணநனமயரலளழவ"]
A9 = [(c, -1) for c in "ாிீுூெேை்"]
A10 = [(c, -1) for c in "அஇஉ"]
A11 = A1
A12 = A6
A13 = [("கள்", 4), ("ுங்கள்", 1), ("ட்கள்", 3), ("ற்கள்", 2)]
A14 = [(c, -1) for c in "ாேோ"]
A15 = [("பி", -1), ("வி", -1)]
A16 = [(c, -1) for c in "ாிீுூெேை"]
A17 = [("பட்ட", 3), ("பட்டண", 3), ("தான", 3), ("படிதான", 3), ("ென", 1),
       ("ாகிய", 1), ("குரிய", 3), ("ுடைய", 1), ("ல்ல", 2), ("ுள்ள", 1),
       ("ாகி", 1), ("படி", 3), ("ின்றி", 1), ("பற்றி", 3), ("படு", 3),
       ("விடு", 3), ("பட்டு", 3), ("விட்டு", 3), ("பட்டது", 3),
       ("ென்று", 1), ("ுடை", 1), ("ில்லை", 1), ("ுடன்", 1), ("ிடம்", 1),
       ("ெல்லாம்", 3), ("ெனும்", 1)]
A18 = [(c, -1) for c in "ாிீுூெேை"]
A19 = A18
A20 = [("விட", 2), ("ீ", 7), ("ொடு", 2), ("ோடு", 2), ("து", 6),
       ("ிருந்து", 2), ("ின்று", 2), ("ுடை", 2), ("னை", 1), ("கண்", 1),
       ("ின்", 3), ("முன்", 1), ("ிடம்", 4), ("ிற்", 2), ("மேற்", 1),
       ("ல்", 5), ("ாமல்", 2), ("ால்", 2), ("ில்", 2), ("மேல்", 1),
       ("ுள்", 2), ("கீழ்", 1)]
A21 = A6
A22 = A6
A23 = [(c, -1) for c in "அஆஇஈஉஊஎஏஐஒஓஔ"]
A24 = [(c, -1) for c in "ாிீுூெேை"]
A25 = [("க", 1), ("த", 1), ("ன", 1), ("ப", 1), ("ய", 1), ("ா", 5),
       ("கு", 6), ("படு", 1), ("து", 3), ("ிற்று", 1), ("னை", 1),
       ("வை", 1), ("னன்", 1), ("பன்", 1), ("வன்", 2), ("ான்", 4),
       ("னான்", 1), ("மின்", 1), ("னென்", 1), ("ேன்", 5), ("னம்", 1),
       ("பம்", 1), ("ாம்", 5), ("கும்", 1), ("டும்", 5), ("தும்", 1),
       ("றும்", 1), ("ெம்", 5), ("ேம்", 5), ("ோம்", 5), ("ாய்", 5),
       ("னர்", 1), ("பர்", 1), ("ீயர்", 5), ("வர்", 1), ("ார்", 5),
       ("னார்", 1), ("மார்", 1), ("கொண்டிர்", 1), ("னிர்", 5),
       ("ீர்", 5), ("னள்", 1), ("பள்", 1), ("வள்", 1), ("ாள்", 5),
       ("னாள்", 1)]
A26 = [("கிற", -1), ("கின்ற", -1), ("ாநின்ற", -1), ("கிற்", -1),
       ("கின்ற்", -1), ("ாநின்ற்", -1)]

_PULLI = "்"
_AI = "ை"


class _TS:
    """Snowball word state with forward + backward primitives; slice
    adjustment follows SnowballProgram.replace_s (cursor >= ket shifts by
    the adjustment, cursor inside the slice snaps to bra)."""

    __slots__ = ("w", "c", "lb", "vetrumai")

    def __init__(self, w: str):
        self.w = w
        self.c = 0
        self.lb = 0
        self.vetrumai = False  # B_found_vetrumai_urupu

    # forward
    def eq_s(self, s: str) -> bool:
        if self.w.startswith(s, self.c):
            self.c += len(s)
            return True
        return False

    def among_f(self, table) -> int:
        best = None
        for s, a in table:
            if (best is None or len(s) > len(best[0])) and \
                    self.w.startswith(s, self.c):
                best = (s, a)
        if best is None:
            return 0
        self.c += len(best[0])
        return best[1]

    # backward
    def eq_s_b(self, s: str) -> bool:
        if self.c - len(s) >= self.lb and \
                self.w[self.c - len(s):self.c] == s:
            self.c -= len(s)
            return True
        return False

    def among_b(self, table) -> int:
        best = None
        for s, a in table:
            if (best is None or len(s) > len(best[0])) and \
                    self.c - len(s) >= self.lb and \
                    self.w.endswith(s, 0, self.c):
                best = (s, a)
        if best is None:
            return 0
        self.c -= len(best[0])
        return best[1]

    def replace(self, lo: int, hi: int, repl: str) -> None:
        adj = len(repl) - (hi - lo)
        self.w = self.w[:lo] + repl + self.w[hi:]
        if self.c >= hi:
            self.c += adj
        elif self.c > lo:
            self.c = lo


def _fix_va_start(t: _TS) -> bool:
    bra = t.c
    act = t.among_f(A0)
    if act == 0:
        return False
    ket = t.c
    t.replace(bra, ket, {1: "ஓ", 2: "ஒ", 3: "உ", 4: "ஊ"}[act])
    return True


def _fix_ending(t: _TS) -> bool:
    if len(t.w) <= 3:
        return False
    t.lb, t.c = t.c, len(t.w)
    handled = False
    ket = t.c
    act = t.among_b(A5)
    if act:
        bra = t.c
        if act == 1:
            t.replace(bra, ket, "")
            handled = True
        elif act == 2:
            v = len(t.w) - t.c
            if t.among_b(A2):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                handled = True
        elif act == 3:
            t.replace(bra, ket, "ள்")
            handled = True
        elif act == 4:
            t.replace(bra, ket, "ல்")
            handled = True
        elif act == 5:
            t.replace(bra, ket, "டு")
            handled = True
        elif act == 6:
            if t.vetrumai:
                v = len(t.w) - t.c
                if t.eq_s_b(_AI):
                    t.c = len(t.w) - v
                else:
                    t.c = len(t.w) - v
                    t.replace(bra, ket, "ம்")
                    handled = True
        elif act == 7:
            t.replace(bra, ket, _PULLI)
            handled = True
        elif act == 8:
            v = len(t.w) - t.c
            if not t.among_b(A3):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                handled = True
        elif act == 9:
            # inner a_4 picks the action; the slice span stays [bra, ket]
            act2 = t.among_b(A4)
            if act2 == 1:
                t.replace(bra, ket, "")
            else:
                t.replace(bra, ket, "ம்")
            handled = True
    if not handled:
        # second alternative: bare pulli cleanups
        t.c = len(t.w)
        ket = t.c
        if not t.eq_s_b(_PULLI):
            t.c = t.lb
            t.lb = 0
            return False
        v5 = len(t.w) - t.c
        done = False
        if t.among_b(A6):
            v6 = len(t.w) - t.c
            if t.eq_s_b(_PULLI):
                if not t.among_b(A7):
                    t.c = len(t.w) - v6
            else:
                t.c = len(t.w) - v6
            t.replace(t.c, ket, "")
            done = True
        if not done:
            t.c = len(t.w) - v5
            if t.among_b(A8):
                bra = t.c
                if t.eq_s_b(_PULLI):
                    t.replace(bra, ket, "")
                    done = True
                else:
                    t.c = len(t.w) - v5
        if not done:
            t.c = len(t.w) - v5
            v7 = len(t.w) - t.c
            if not t.among_b(A9):
                t.c = t.lb
                t.lb = 0
                return False
            t.c = len(t.w) - v7
            t.replace(t.c, ket, "")
    t.c = t.lb
    t.lb = 0
    return True


def _fix_endings(t: _TS) -> None:
    v1 = t.c
    while True:
        v2 = t.c
        if not _fix_ending(t):
            t.c = v2
            break
    t.c = v1


def _remove_question_prefixes(t: _TS) -> bool:
    bra = t.c
    if not t.eq_s("எ"):
        return False
    if t.among_f(A1) == 0:
        return False
    if not t.eq_s(_PULLI):
        return False
    t.replace(bra, t.c, "")
    v1 = t.c
    _fix_va_start(t)
    t.c = v1
    return True


def _remove_pronoun_prefixes(t: _TS) -> bool:
    bra = t.c
    if t.among_f(A10) == 0:
        return False
    if t.among_f(A11) == 0:
        return False
    if not t.eq_s(_PULLI):
        return False
    t.replace(bra, t.c, "")
    v1 = t.c
    _fix_va_start(t)
    t.c = v1
    return True


def _remove_plural_suffix(t: _TS) -> bool:
    t.lb, t.c = t.c, len(t.w)
    ket = t.c
    act = t.among_b(A13)
    if act == 0:
        t.lb = 0
        return False
    bra = t.c
    if act == 1:
        v1 = len(t.w) - t.c
        if t.among_b(A12):
            t.replace(bra, ket, "ுங்")
        else:
            t.c = len(t.w) - v1
            t.replace(bra, ket, _PULLI)
    elif act == 2:
        t.replace(bra, ket, "ல்")
    elif act == 3:
        t.replace(bra, ket, "ள்")
    else:
        t.replace(bra, ket, "")
    t.c = t.lb
    t.lb = 0
    return True


def _remove_question_suffixes(t: _TS) -> bool:
    if len(t.w) <= 4:
        return False
    t.lb, t.c = t.c, len(t.w)
    v1 = len(t.w) - t.c
    ket = t.c
    if t.among_b(A14):
        t.replace(t.c, ket, _PULLI)
    t.c = len(t.w) - v1
    t.c = t.lb
    t.lb = 0
    _fix_endings(t)
    return True


def _remove_command_suffixes(t: _TS) -> bool:
    if len(t.w) <= 4:
        return False
    t.lb, t.c = t.c, len(t.w)
    ket = t.c
    if not t.among_b(A15):
        t.lb = 0
        return False
    t.replace(t.c, ket, "")
    t.c = t.lb
    t.lb = 0
    return True


def _remove_um(t: _TS) -> bool:
    if len(t.w) <= 4:
        return False
    t.lb, t.c = t.c, len(t.w)
    ket = t.c
    if not t.eq_s_b("ும்"):
        t.lb = 0
        return False
    t.replace(t.c, ket, _PULLI)
    t.c = t.lb
    t.lb = 0
    v1 = t.c
    _fix_ending(t)
    t.c = v1
    return True


def _remove_common_word_endings(t: _TS) -> bool:
    if len(t.w) <= 4:
        return False
    t.lb, t.c = t.c, len(t.w)
    ket = t.c
    act = t.among_b(A17)
    if act == 0:
        t.lb = 0
        return False
    bra = t.c
    if act == 1:
        t.replace(bra, ket, _PULLI)
    elif act == 2:
        v1 = len(t.w) - t.c
        if t.among_b(A16):
            t.lb = 0
            return False
        t.c = len(t.w) - v1
        t.replace(bra, ket, _PULLI)
    else:
        t.replace(bra, ket, "")
    t.c = t.lb
    t.lb = 0
    _fix_endings(t)
    return True


def _remove_vetrumai_urupukal(t: _TS) -> tuple[bool, bool]:
    """Returns (matched, found_vetrumai_urupu)."""
    found = False
    if len(t.w) <= 4:
        return False, False
    t.lb, t.c = t.c, len(t.w)
    matched = False
    v2 = len(t.w) - t.c
    ket = t.c
    act = t.among_b(A20)
    if act:
        bra = t.c
        ok = False
        if act == 1:
            t.replace(bra, ket, "")
            ok = True
        elif act == 2:
            t.replace(bra, ket, _PULLI)
            ok = True
        elif act == 3:
            if not t.eq_s_b("ம"):
                t.replace(bra, ket, _PULLI)
                ok = True
        elif act == 4:
            if len(t.w) >= 7:
                t.replace(bra, ket, _PULLI)
                ok = True
        elif act == 5:
            v = len(t.w) - t.c
            if not t.among_b(A18):
                t.c = len(t.w) - v
                t.replace(bra, ket, _PULLI)
                ok = True
        elif act == 6:
            v = len(t.w) - t.c
            if not t.among_b(A19):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                ok = True
        elif act == 7:
            t.replace(bra, ket, "ி")
            ok = True
        if ok:
            t.c = len(t.w) - v2
            matched = True
    if not matched:
        # ai branch: ...ை, hard consonant requires a preceding pulli pair
        t.c = len(t.w)
        v6 = len(t.w) - t.c
        ket = t.c
        if not t.eq_s_b(_AI):
            t.c = t.lb
            t.lb = 0
            return False, False
        v7 = len(t.w) - t.c
        if t.among_b(A21):
            t.c = len(t.w) - v7
            v9 = len(t.w) - t.c
            if not (t.among_b(A22) and t.eq_s_b(_PULLI)):
                t.c = t.lb
                t.lb = 0
                return False, False
            t.c = len(t.w) - v9
        else:
            t.c = len(t.w) - v7
        t.replace(t.c, ket, _PULLI)
        t.c = len(t.w) - v6
    found = True
    v10 = len(t.w) - t.c
    ket = t.c
    if t.eq_s_b("ின்"):
        t.replace(t.c, ket, _PULLI)
    t.c = len(t.w) - v10
    t.c = t.lb
    t.lb = 0
    t.vetrumai = found
    _fix_endings(t)
    return True, found


def _remove_tense_suffix(t: _TS) -> bool:
    """One tense pass; returns found_a_match."""
    found = False
    if len(t.w) <= 4:
        return False
    t.lb, t.c = t.c, len(t.w)
    v1 = len(t.w) - t.c
    v2 = len(t.w) - t.c
    ket = t.c
    act = t.among_b(A25)
    if act:
        bra = t.c
        ok = False
        if act == 1:
            t.replace(bra, ket, "")
            ok = True
        elif act == 2:
            v = len(t.w) - t.c
            if not t.among_b(A23):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                ok = True
        elif act == 3:
            v = len(t.w) - t.c
            if not t.among_b(A24):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                ok = True
        elif act == 4:
            if not t.eq_s_b("ச"):
                t.replace(bra, ket, _PULLI)
                ok = True
        elif act == 5:
            t.replace(bra, ket, _PULLI)
            ok = True
        elif act == 6:
            v = len(t.w) - t.c
            if t.eq_s_b(_PULLI):
                t.c = len(t.w) - v
                t.replace(bra, ket, "")
                ok = True
        if ok:
            found = True
            t.c = len(t.w) - v2
    t.c = len(t.w) - v1
    v7 = len(t.w) - t.c
    ket = t.c
    if t.among_b(A26):
        t.replace(t.c, ket, "")
        found = True
    t.c = len(t.w) - v7
    t.c = t.lb
    t.lb = 0
    _fix_endings(t)
    return found


def _remove_tense_suffixes(t: _TS) -> None:
    found = True
    while found:
        v2 = t.c
        found = _remove_tense_suffix(t)
        t.c = v2


def tamil_stem(word: str) -> str:
    """TamilStemmer.stem(): always replaces the token (no keep-original
    path) once the word exceeds 4 chars after the first fix_ending."""
    t = _TS(word)
    v1 = t.c
    _fix_ending(t)
    t.c = v1
    if len(t.w) <= 4:
        return word  # stem() false → SnowballFilter keeps the original
    for step in (_remove_question_prefixes, _remove_pronoun_prefixes,
                 _remove_question_suffixes, _remove_um,
                 _remove_common_word_endings):
        v = t.c
        step(t)
        t.c = v
    v = t.c
    _remove_vetrumai_urupukal(t)
    t.c = v
    for step in (_remove_plural_suffix, _remove_command_suffixes):
        v = t.c
        step(t)
        t.c = v
    v = t.c
    _remove_tense_suffixes(t)
    t.c = v
    return t.w


class TamilAnalyzer(_RomanceAnalyzer):
    """LowerCase (tokenizer default) → digit fold → IndicNormalization →
    stop → snowball Tamil stem (TamilAnalyzer.kt createComponents)."""

    name = "tamil"
    stop_words = TAMIL_STOP_WORDS

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _pre(self, tok: str) -> str:
        return indic_normalize(fold_digits(tok))

    def _stem(self, tok: str) -> str:
        return tamil_stem(tok)
