"""German analysis chain — the reference's GermanAnalyzer
(``/root/reference/analysis/common/.../de/GermanAnalyzer.kt``):
StandardTokenizer → LowerCase → StopFilter(snowball german_stop list) →
GermanNormalizationFilter → GermanLightStemFilter.

The normalization filter applies the German-specific heuristics of the
snowball algorithm (``de/GermanNormalizationFilter.kt``): fold ä/ö/ü to
a/o/u, expand ß to ss, and drop the 'e' of 'ae'/'oe'/'ue' digraphs —
EXCEPT after another vowel or 'q' (so "dauer" keeps its e). The light
stemmer implements the UniNE algorithm (Jacques Savoy, "Light Stemming
Approaches for the French, Portuguese, German and Hungarian Languages",
SAC 2006; reference ``de/GermanLightStemmer.kt``): two suffix-stripping
passes over plural/case endings (-ern/-em/-en/-er/-es/-e/-s then
-est/-er/-en/-st) with minimum-length and valid-s/st-ending guards.

Conformance vectors asserted in tests/test_german_analyzer.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# snowball german_stop.txt (BSD-licensed public stop list; the reference
# embeds the same data, GermanAnalyzer.kt DEFAULT_STOPWORD_DATA)
GERMAN_STOP_WORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das daß derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn derer dessen dich dir du dies diese
diesem diesen dieser dieses doch dort durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal er ihm ihn es
etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
jenen jener jenes jetzt kann kein keine keinem keinen keiner keines
können könnte machen man manche manchem manchen mancher manches mein
meine meinem meinen meiner meines mit muss musste nach nicht nichts noch
nun nur ob oder ohne sehr sein seine seinem seinen seiner seines selbst
sich sie ihnen sind so solche solchem solchen solcher solches soll sollte
sondern sonst über um und uns unse unsem unsen unser unses unter viel vom
von vor während war waren warst was weg weil weiter welche welchem
welchen welcher welches wenn werde werden wie wieder will wir wird wirst
wo wollen wollte würde würden zu zum zur zwar zwischen
""".split())

_N, _V, _U = 0, 1, 2


def german_normalize(tok: str) -> str:
    """GermanNormalizationFilter state machine (exact semantics of
    ``de/GermanNormalizationFilter.kt``): 'e' is deleted when the machine
    is in the U state (reached via a/o, or u after a non-vowel)."""
    out: list[str] = []
    state = _N
    for ch in tok:
        if ch in ("a", "o"):
            out.append(ch)
            state = _U
        elif ch == "u":
            state = _U if state == _N else _V
            out.append(ch)
        elif ch == "e":
            if state == _U:
                state = _V
                continue  # the 'e' of ae/oe/ue folds away
            out.append(ch)
            state = _V
        elif ch in ("i", "q", "y"):
            out.append(ch)
            state = _V
        elif ch == "ä":
            out.append("a")
            state = _V
        elif ch == "ö":
            out.append("o")
            state = _V
        elif ch == "ü":
            out.append("u")
            state = _V
        elif ch == "ß":
            out.append("s")
            out.append("s")
            state = _N
        else:
            out.append(ch)
            state = _N
    return "".join(out)


_ST_ENDING = frozenset("bdfghklmnt")
_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")


def german_light_stem(s: str) -> str:
    """UniNE light stemmer (``de/GermanLightStemmer.kt`` semantics):
    accent fold, then two longest-match suffix passes."""
    s = s.translate(_FOLD)
    n = len(s)
    # step 1: -ern | -e[mnrs] | -e | -s (after a valid s-ending)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and s[-2] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        s = s[:-1]
    n = len(s)
    # step 2: -est | -e[rn] | -st (after a valid st-ending)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and s[-2] == "e" and s[-1] in "rn":
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _ST_ENDING:
        s = s[:-2]
    return s


class GermanAnalyzer:
    """Pluggable analyzer slot instance (same shape as EnglishAnalyzer):
    per-unique-token normalization + stemming after the vectorized stop
    filter — the stemmer runs once per batch-distinct token, not per
    occurrence."""

    name = "german"

    def __init__(self, stop_words=GERMAN_STOP_WORDS):
        self.stop_set = frozenset(stop_words)
        self.stop = sorted(self.stop_set)

    def _transform(self, tok: str) -> str:
        return german_light_stem(german_normalize(tok))

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        return [self._transform(t) for t in tokenize(text)
                if t not in self.stop_set]

    def analyze_flat(self, texts):
        import pyarrow.compute as pc

        from .standard import StandardAnalyzer
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(
            self.stop, pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_of = doc_of[mask]
        positions = positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        dict_arr = flat.dictionary_encode()
        stemmed = pa.array([self._transform(t) for t in
                            dict_arr.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict_arr.indices, stemmed) \
            .cast(pa.string())
        return norm_lengths, flat, doc_of, positions
