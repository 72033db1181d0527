"""KStem — R. Krovetz, "Viewing morphology as an inference process"
(SIGIR 1993): a dictionary-validated English stemmer.  Faithful port of
the reference's cascade (``analysis/common/.../en/KStemmer.kt``): each
ending rule proposes candidate root spellings and a dictionary lookup
validates them; words found in the dictionary up front return their
conflation root (or themselves) immediately.

The lexicon is the reference's own shipped data — KStemData1-8 head
words plus the exception / direct-conflation / country-nationality /
supplement / proper-noun tables (KStemmer.kt:786-1432) — decoded once
by scripts/build_kstem_assets.py into analysis/data/kstem.txt.gz and
loaded once per process (the once-per-actor state slot, SURVEY §2.3).

Filter semantics: KStemFilter.kt — terms with non a-z characters or
length < 3 / > 49 pass through unchanged.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np
import pyarrow as pa

_DATA = Path(__file__).parent / "data" / "kstem.txt.gz"

# word -> (root | None, is_exception); ref KStemmer.kt DictEntry
_DICT: dict[str, tuple[str | None, bool]] | None = None


def _dict() -> dict[str, tuple[str | None, bool]]:
    global _DICT
    if _DICT is None:
        d: dict[str, tuple[str | None, bool]] = {}
        for line in gzip.decompress(_DATA.read_bytes()).decode().splitlines():
            parts = line.split()
            if parts[0] == "E":
                d[parts[1]] = (parts[1], True)
            elif parts[0] == "C":
                d[parts[1]] = (parts[2], False)
            else:
                d[parts[1]] = (None, False)
        _DICT = d
    return _DICT


_VOWELS = frozenset("aeiou")
_MAX_WORD_LEN = 50


class KStemmer:
    """One reusable instance per worker. stem() is str -> str; the word
    buffer / j / k bookkeeping mirrors KStemmer.kt exactly (the rules
    leave the buffer mid-mutation on fall-through by design)."""

    def __init__(self) -> None:
        self.w: list[str] = []
        self.j = 0
        self.k = 0
        self.matched: tuple[str | None, bool] | None = None

    # ---- predicates (KStemmer.kt:16-52) ---------------------------------
    def _is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _vowel_in_stem(self) -> bool:
        return any(not self._is_cons(i) for i in range(self.j + 1))

    def _double_c(self, i: int) -> bool:
        return i >= 1 and self.w[i] == self.w[i - 1] and self._is_cons(i)

    def _ends_str(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        self.j = self.k
        if "".join(self.w[r:]) != s:
            return False
        self.j = r - 1
        return True

    def _ends2(self, a: str, b: str) -> bool:
        if 2 > self.k:
            return False
        if self.w[self.k - 1] == a and self.w[self.k] == b:
            self.j = self.k - 2
            return True
        return False

    def _ends3(self, a: str, b: str, c: str) -> bool:
        if 3 > self.k:
            return False
        if (self.w[self.k - 2] == a and self.w[self.k - 1] == b
                and self.w[self.k] == c):
            self.j = self.k - 3
            return True
        return False

    def _ends4(self, a: str, b: str, c: str, d: str) -> bool:
        if 4 > self.k:
            return False
        if (self.w[self.k - 3] == a and self.w[self.k - 2] == b
                and self.w[self.k - 1] == c and self.w[self.k] == d):
            self.j = self.k - 4
            return True
        return False

    # ---- buffer ops ------------------------------------------------------
    def _set_len(self, n: int) -> None:
        del self.w[n:]

    def _set_suffix(self, s: str) -> None:
        self._set_len(self.j + 1)
        self.w.extend(s)
        self.k = self.j + len(s)

    def _lookup(self) -> bool:
        self.matched = _dict().get("".join(self.w))
        return self.matched is not None

    def _word_in_dict(self) -> tuple[str | None, bool] | None:
        if self.matched is not None:
            return self.matched
        e = _dict().get("".join(self.w))
        if e is not None and not e[1]:
            self.matched = e
        return e

    # ---- ending rules (same order/structure as KStemmer.kt) -------------
    def _plural(self) -> None:  # KStemmer.kt:90
        w = self.w
        if w[self.k] != "s":
            return
        if self._ends3("i", "e", "s"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.append("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends2("e", "s"):
            self._set_len(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (w[self.j] == "s"
                                        and w[self.j - 1] == "s")
            if try_e and self._lookup():
                return
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            w.append("e")
            self.k += 1
            if not try_e:
                self._lookup()
        else:
            if (len(w) > 3 and w[self.k - 1] != "s"
                    and not self._ends3("o", "u", "s")):
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:  # KStemmer.kt:143
        w = self.w
        if len(w) <= 4:
            return
        if self._ends3("i", "e", "d"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.append("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends2("e", "d") and self._vowel_in_stem():
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                w.append(w[self.k])
                self.k += 1
                self._lookup()
                return
            if w[0] == "u" and w[1] == "n":
                w.append("e")
                w.append("d")
                self.k += 2
                return
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1

    def _aspect(self) -> None:  # KStemmer.kt:205
        w = self.w
        if len(w) <= 5:
            return
        if self._ends3("i", "n", "g") and self._vowel_in_stem():
            w[self.j + 1] = "e"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                w.append(w[self.k])
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) \
                    and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_len(self.k + 1)
                return
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1

    def _ity_endings(self) -> None:  # KStemmer.kt:244
        w = self.w
        old_k = self.k
        if self._ends3("i", "t", "y"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            w[self.j + 1] = "i"
            w.extend("ty")
            self.k = old_k
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "l":
                self._set_len(self.j - 1)
                w.extend("le")
                self.k = self.j
                self._lookup()
                return
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "v":
                self._set_len(self.j + 1)
                w.append("e")
                self.k = self.j + 1
                self._lookup()
                return
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
                self._set_len(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j

    def _nce_endings(self) -> None:  # KStemmer.kt:288
        w = self.w
        old_k = self.k
        if self._ends3("n", "c", "e"):
            word_char = w[self.j]
            if word_char not in ("e", "a"):
                return
            self._set_len(self.j)
            w.append("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            w.append(word_char)
            w.extend("nce")
            self.k = old_k

    def _ness_endings(self) -> None:  # KStemmer.kt:306
        if self._ends4("n", "e", "s", "s"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.w[self.j] = "y"
            self._lookup()

    def _ism_endings(self) -> None:  # KStemmer.kt:315
        if self._ends3("i", "s", "m"):
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment_endings(self) -> None:  # KStemmer.kt:323
        old_k = self.k
        if self._ends4("m", "e", "n", "t"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self.w.extend("ment")
            self.k = old_k

    def _ize_endings(self) -> None:  # KStemmer.kt:334
        w = self.w
        old_k = self.k
        if self._ends3("i", "z", "e"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("i")
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append(w[self.j - 1])
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("ize")
            self.k = old_k

    def _ncy_endings(self) -> None:  # KStemmer.kt:359
        w = self.w
        if self._ends3("n", "c", "y"):
            if w[self.j] not in ("e", "a"):
                return
            w[self.j + 2] = "t"
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            w[self.j + 2] = "c"
            w.append("e")
            self.k = self.j + 3
            self._lookup()

    def _ble_endings(self) -> None:  # KStemmer.kt:375
        w = self.w
        old_k = self.k
        if self._ends3("b", "l", "e"):
            if w[self.j] not in ("a", "i"):
                return
            word_char = w[self.j]
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                w.append(w[self.k - 1])
            self._set_len(self.j)
            w.append("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            w.extend("ate")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j)
            w.append(word_char)
            w.extend("ble")
            self.k = old_k

    def _ic_endings(self) -> None:  # KStemmer.kt:405
        w = self.w
        if self._ends2("i", "c"):
            self._set_len(self.j + 3)
            w.extend("al")
            self.k = self.j + 4
            if self._lookup():
                return
            w[self.j + 1] = "y"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            w[self.j + 1] = "e"
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.extend("ic")
            self.k = self.j + 2

    def _ion_endings(self) -> None:  # KStemmer.kt:428
        w = self.w
        old_k = self.k
        if not self._ends3("i", "o", "n"):
            return
        if self._ends_str("ization"):
            self._set_len(self.j + 3)
            w.append("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_str("ition"):
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("ition")
            self.k = old_k
        elif self._ends_str("ation"):
            self._set_len(self.j + 3)
            w.append("e")
            self.k = self.j + 3
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("ation")
            self.k = old_k
        if self._ends_str("ication"):
            self._set_len(self.j + 1)
            w.append("y")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("ication")
            self.k = old_k
        # generic -ion handling (KStemmer.kt:482 run block)
        self.j = self.k - 3
        self._set_len(self.j + 1)
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j + 1)
        w.extend("ion")
        self.k = old_k

    def _er_and_or_endings(self) -> None:  # KStemmer.kt:499
        w = self.w
        old_k = self.k
        if w[self.k] != "r":
            return
        if self._ends4("i", "z", "e", "r"):
            self._set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends2("e", "r") or self._ends2("o", "r"):
            word_char = w[self.j + 1]
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append(w[self.j - 1])
            if w[self.j] == "i":
                w[self.j] = "y"
                self._set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                w[self.j] = "i"
                w.append("e")
            if w[self.j] == "e":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append("e")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.append(word_char)
            w.append("r")
            self.k = old_k

    def _ly_endings(self) -> None:  # KStemmer.kt:551
        w = self.w
        old_k = self.k
        if self._ends2("l", "y"):
            w[self.j + 2] = "e"
            if self._lookup():
                return
            w[self.j + 2] = "y"
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
                return
            w.extend("ly")
            self.k = old_k
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "b":
                w[self.j + 2] = "e"
                self.k = self.j + 2
                return
            if w[self.j] == "i":
                self._set_len(self.j)
                w.append("y")
                self.k = self.j
                if self._lookup():
                    return
                self._set_len(self.j)
                w.extend("ily")
                self.k = old_k
            self._set_len(self.j + 1)
            self.k = self.j

    def _al_endings(self) -> None:  # KStemmer.kt:587
        w = self.w
        old_k = self.k
        if len(w) < 4:
            return
        if self._ends2("a", "l"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append(w[self.j - 1])
            self._set_len(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("um")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("al")
            self.k = old_k
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "c":
                self._set_len(self.j - 1)
                self.k = self.j - 2
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                w.append("y")
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                w.extend("ic")
                self.k = self.j
                self._lookup()
                return
            if w[self.j] == "i":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.extend("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self) -> None:  # KStemmer.kt:644
        w = self.w
        old_k = self.k
        if self._ends3("i", "v", "e"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            w.extend("ive")
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "t":
                w[self.j - 1] = "e"
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                if self._lookup():
                    return
                w.extend("ative")
                self.k = old_k
            w[self.j + 2] = "o"
            w[self.j + 3] = "n"
            if self._lookup():
                return
            w[self.j + 2] = "v"
            w[self.j + 3] = "e"
            self.k = old_k

    # ---- entry (KStemmer.kt:709) -----------------------------------------
    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= _MAX_WORD_LEN - 1:
            return term
        entry = _dict().get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        for ch in term:
            if not ("a" <= ch <= "z"):
                return term
        self.w = list(term)
        self.k = k
        self.matched = None
        while True:
            self._plural()
            if self.matched is not None:
                break
            self._past_tense()
            if self.matched is not None:
                break
            self._aspect()
            if self.matched is not None:
                break
            self._ity_endings()
            if self.matched is not None:
                break
            self._ness_endings()
            if self.matched is not None:
                break
            self._ion_endings()
            if self.matched is not None:
                break
            self._er_and_or_endings()
            if self.matched is not None:
                break
            self._ly_endings()
            if self.matched is not None:
                break
            self._al_endings()
            if self.matched is not None:
                break
            self._word_in_dict()
            self._ive_endings()
            if self.matched is not None:
                break
            self._ize_endings()
            if self.matched is not None:
                break
            self._ment_endings()
            if self.matched is not None:
                break
            self._ble_endings()
            if self.matched is not None:
                break
            self._ism_endings()
            if self.matched is not None:
                break
            self._ic_endings()
            if self.matched is not None:
                break
            self._ncy_endings()
            if self.matched is not None:
                break
            self._nce_endings()
            break
        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]
        return "".join(self.w)


_SHARED = KStemmer()


def kstem(word: str) -> str:
    return _SHARED.stem(word)


class KStemAnalyzer:
    """StandardTokenizer → LowerCase → possessive-'s strip → English stop
    set → KStemFilter — the EnglishAnalyzer chain with KStem in the
    stemmer slot (KStemFilterFactory's documented use; ref
    KStemFilter.kt:10). The stemmer runs per *unique* token of the batch
    (dictionary encode first), not per occurrence."""

    name = "english_kstem"

    def __init__(self, stop_words=None) -> None:
        from .standard import ENGLISH_STOP_WORDS
        self.stop_set = frozenset(stop_words if stop_words is not None
                                  else ENGLISH_STOP_WORDS)
        self.stop = sorted(self.stop_set)

    def _stem_array(self, arr: pa.Array) -> pa.Array:
        dict_arr = arr.dictionary_encode()
        stemmed = pa.array([kstem(t) for t in
                            dict_arr.dictionary.to_pylist()], pa.string())
        return pa.DictionaryArray.from_arrays(dict_arr.indices, stemmed) \
            .cast(pa.string())

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            if t.endswith("'s") or t.endswith("’s"):
                t = t[:-2]
            if t and t not in self.stop_set:
                out.append(kstem(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc
        from .standard import StandardAnalyzer
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        flat = pc.replace_substring_regex(flat, pattern="['’]s$",
                                          replacement="")
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(
            self.stop + [""], pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_of = doc_of[mask]
        positions = positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        return norm_lengths, self._stem_array(flat), doc_of, positions
