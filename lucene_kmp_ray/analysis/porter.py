"""Porter stemmer — M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980, with the two post-paper additions Lucene ships
(``bli``→``ble`` in step 2's list and ``logi``→``log``; reference:
``/root/reference/analysis/common/.../en/PorterStemmer.kt:160-430``).
Re-implemented from the published rule tables; words shorter than 3
characters return unchanged, as in the reference.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class PorterStemmer:
    """One reusable instance per worker (the once-per-actor state slot)."""

    def stem(self, word: str) -> str:
        if len(word) <= 2:
            return word
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0
        self._step1()
        self._step_y()
        self._step2()
        self._step3()
        self._step4()
        self._step5()
        return "".join(self.b[: self.k + 1])

    # ---- letter predicates (paper §2) ----------------------------------
    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Measure of the stem b[0..j]: count of VC sequences."""
        n, i = 0, 0
        while True:
            if i > self.j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        return j >= 1 and self.b[j] == self.b[j - 1] and self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) \
                or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if self.b[o:self.k + 1] != list(s):
            return False
        self.j = self.k - len(s)
        return True

    def _setto(self, s: str) -> None:
        self.b[self.j + 1: self.j + 1 + len(s)] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # ---- steps (paper §§3-6; numbering follows the paper) --------------
    def _step1(self) -> None:  # plurals, -ed, -ing
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowel_in_stem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step_y(self) -> None:  # terminal y → i when a vowel is in the stem
        if self._ends("y") and self._vowel_in_stem():
            self.b[self.k] = "i"

    _STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
              ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
              ("alli", "al"), ("entli", "ent"), ("eli", "e"),
              ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
              ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
              ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
              ("iviti", "ive"), ("biliti", "ble"), ("logi", "log")]

    def _step2(self) -> None:  # double suffixes → single (m > 0)
        if self.k == 0:
            return
        for suf, rep in self._STEP2:
            if self._ends(suf):
                self._r(rep)
                return

    _STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
              ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]

    def _step3(self) -> None:  # -ic-, -full, -ness (m > 0)
        for suf, rep in self._STEP3:
            if self._ends(suf):
                self._r(rep)
                return

    _STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
              "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
              "ive", "ize"]

    def _step4(self) -> None:  # strip -ant, -ence … in context m > 1
        if self.k == 0:
            return
        if self._ends("ion"):
            if self.j >= 0 and self.b[self.j] in ("s", "t") and self._m() > 1:
                self.k = self.j
            return
        for suf in self._STEP4:
            if self._ends(suf):
                if self._m() > 1:
                    self.k = self.j
                return

    def _step5(self) -> None:  # final -e and -ll cleanup
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1


_SHARED = PorterStemmer()


def porter_stem(word: str) -> str:
    return _SHARED.stem(word)
