"""Dutch analysis chain (Snowball DutchStemmer + stem-override dict).

Reference chain (``/root/reference/analysis/common/.../nl/DutchAnalyzer.kt``):
StandardTokenizer → LowerCase → StopFilter(snowball stop list) →
StemmerOverrideFilter(DEFAULT_STEM_DICT) → SnowballFilter(DutchStemmer).

The stemmer implements the published Snowball Dutch algorithm
(https://snowballstem.org/algorithms/dutch/stemmer.html; reference
``tartarus/snowball/ext/DutchStemmer.kt`` is the generated form):

*prelude* — fold á/ä→a é/ë→e í/ï→i ó/ö→o ú/ü→u, uppercase initial ``y``,
``y`` after a vowel, and ``i`` between vowels (Y/I act as consonants);
*regions* — R1 (floored at 3) and R2 per the standard definition;
*step 1*  — longest of {heden→heid | en/ene deleted after a valid
en-ending (non-vowel, not "gem"), then undouble | s/se deleted after a
non-vowel other than j}, all within R1;
*step 2*  — delete final ``e`` in R1 after a non-vowel, undouble, and
remember ``e_found``;
*step 3a* — ``heid`` in R2 not preceded by ``c`` → delete, then a
following ``en`` as in step 1;
*step 3b* — longest of {end/ing: delete in R2 then ``ig`` (R2, not after
e) else undouble | ig: R2 not after e | lijk: R2 then re-run step 2 |
baar: R2 | bar: R2 and only if step 2 removed an e};
*step 4*  — undouble vowel: C V V D (D a non-vowel other than I, V one
of aa/ee/oo/uu, C a non-vowel) loses one vowel;
*postlude* — Y→y, I→i.

The oracle mirror (``oracle.dutch_preamble``) GENERATES the equivalent
SQL — the prelude as a recursive-CTE left-to-right scan over distinct
tokens, the suffix steps as staged CASE columns — from the same rules,
so Ray and DuckDB agree by construction.  Conformance vectors
(reference TestDutchAnalyzer.kt) live in tests/test_dutch_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

DUTCH_STOP_WORDS = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze
zich bij ook tot je mij uit der daar haar naar heb hoe heeft hebben
deze u want nog zal me zij nu ge geen omdat iets worden toch al waren
veel meer doen toen moet ben zonder kan hun dus alles onder ja eens
hier wie werd altijd doch wordt wezen kunnen ons zelf tegen na reeds
wil kon niets uw iemand geweest andere
""".split())

# DutchAnalyzer.kt DEFAULT_STEM_DICT (StemmerOverrideFilter): matching
# tokens bypass the snowball stemmer entirely.
DUTCH_STEM_DICT = {
    "fiets": "fiets",
    "bromfiets": "bromfiets",
    "ei": "eier",
    "kind": "kinder",
}

NL_VOWELS = frozenset("aeiouyè")          # g_v
NL_V_I = NL_VOWELS | {"I"}                 # g_v_I (step-4 D test)
NL_V_J = NL_VOWELS | {"j"}                 # g_v_j (s-ending test)
_FOLD_NL = str.maketrans("áäéëíïóöúü", "aaeeiioouu")
_POSTLUDE = str.maketrans("YI", "yi")


def _prelude(w: str) -> str:
    """Accent fold + the left-to-right Y/I marking scan.  Equivalent to
    the snowball ``repeat goto`` (the converted prefix decides the
    'preceded by a vowel' tests; the raw tail decides 'followed by')."""
    w = w.translate(_FOLD_NL)
    out: list[str] = []
    n = len(w)
    for p, c in enumerate(w):
        if c == "y" and (p == 0 or out[p - 1] in NL_VOWELS):
            out.append("Y")
        elif (c == "i" and p > 0 and out[p - 1] in NL_VOWELS
              and p + 1 < n and w[p + 1] in NL_VOWELS):
            out.append("I")
        else:
            out.append(c)
    return "".join(out)


def _mark(w: str) -> tuple[int, int]:
    """R1 (floored at 3) and R2 start positions; len(w) when absent."""
    n = len(w)

    def scan(i: int, want_vowel: bool) -> int:
        while i < n:
            if (w[i] in NL_VOWELS) == want_vowel:
                return i + 1
            i += 1
        return -1

    i = scan(0, True)
    if i < 0:
        return n, n
    i = scan(i, False)
    if i < 0:
        return n, n
    p1 = max(i, 3)
    j = scan(i, True)
    if j >= 0:
        j = scan(j, False)
    return p1, (j if j >= 0 else n)


def _undouble(w: str) -> str:
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def _en_ending(w: str, k: int, p1: int) -> str:
    """Delete a k-char en-suffix if its start is in R1, preceded by a
    non-vowel, and the stem doesn't end in ``gem``; then undouble."""
    base = len(w) - k
    if (base >= p1 and base >= 1 and w[base - 1] not in NL_VOWELS
            and not w[:base].endswith("gem")):
        return _undouble(w[:base])
    return w


def _e_ending(w: str, p1: int) -> tuple[str, bool]:
    if (w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2
            and w[-2] not in NL_VOWELS):
        return _undouble(w[:-1]), True
    return w, False


def dutch_stem(word: str) -> str:
    w = _prelude(word)
    p1, p2 = _mark(w)

    # step 1 — longest structural match decides (snowball among)
    for sfx, act in (("heden", 1), ("ene", 2), ("se", 3), ("en", 2),
                     ("s", 3)):
        if w.endswith(sfx):
            if act == 1:
                if len(w) - 5 >= p1:
                    w = w[:-5] + "heid"
            elif act == 2:
                w = _en_ending(w, len(sfx), p1)
            else:
                base = len(w) - len(sfx)
                if base >= p1 and base >= 1 and w[base - 1] not in NL_V_J:
                    w = w[:base]
            break

    # step 2
    w, e_found = _e_ending(w, p1)

    # step 3a — heid (not after c) in R2, then a trailing en
    if (w.endswith("heid") and len(w) - 4 >= p2
            and not (len(w) >= 5 and w[-5] == "c")):
        w = w[:-4]
        if w.endswith("en"):
            w = _en_ending(w, 2, p1)

    # step 3b — derivational suffixes (longest first)
    for sfx, act in (("lijk", 3), ("baar", 4), ("end", 1), ("ing", 1),
                     ("bar", 5), ("ig", 2)):
        if w.endswith(sfx):
            if act == 1 and len(w) - 3 >= p2:
                w = w[:-3]
                if (w.endswith("ig") and len(w) - 2 >= p2
                        and not (len(w) >= 3 and w[-3] == "e")):
                    w = w[:-2]
                else:
                    w = _undouble(w)
            elif act == 2 and len(w) - 2 >= p2 \
                    and not (len(w) >= 3 and w[-3] == "e"):
                w = w[:-2]
            elif act == 3 and len(w) - 4 >= p2:
                w = w[:-4]
                w, _ = _e_ending(w, p1)
            elif act == 4 and len(w) - 4 >= p2:
                w = w[:-4]
            elif act == 5 and len(w) - 3 >= p2 and e_found:
                w = w[:-3]
            break

    # step 4 — undouble vowel (C aa/ee/oo/uu D)
    if (len(w) >= 4 and w[-1] not in NL_V_I and w[-2] == w[-3]
            and w[-2] in "aeou" and w[-4] not in NL_VOWELS):
        w = w[:-2] + w[-1]

    return w.translate(_POSTLUDE)


class DutchAnalyzer(_RomanceAnalyzer):
    name = "dutch"
    stop_words = DUTCH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        override = DUTCH_STEM_DICT.get(tok)
        if override is not None:
            return override
        return dutch_stem(tok)
