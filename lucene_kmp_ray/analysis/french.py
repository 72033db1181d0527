"""French analysis chain — the reference's FrenchAnalyzer
(``/root/reference/analysis/common/.../fr/FrenchAnalyzer.kt``):
StandardTokenizer → ElisionFilter(articles) → LowerCase →
StopFilter(snowball french_stop) → FrenchLightStemFilter.

The elision filter strips a leading article + apostrophe ("l'avion" →
"avion" — the tokenizer keeps the apostrophe-joined token, ElisionFilter
removes the contraction). The light stemmer implements the UniNE
algorithm (Jacques Savoy; reference ``fr/FrenchLightStemmer.kt``
semantics re-expressed): plural -x/-s handling with the -aux → -al
special case, a cascade of derivational suffix rewrites
(-issement→-ir, -atrice/-ateur→-er, -cateur→-quer, -ique, -esse,
-isation, -ition …), then a normalization pass (accent fold, successive
duplicate-letter collapse, -ie strip, trailing r/e/e strip).

Conformance vectors from TestFrenchLightStemFilter.kt asserted in
tests/test_french_analyzer.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# snowball french_stop.txt (BSD public stop list; the reference embeds
# the same data) — note tokenizer difference: contractions like "c'est"
# stay joined by our tokenizer, so the single-letter article entries act
# through the elision filter instead
FRENCH_STOP_WORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le leur lui ma
mais me même mes moi mon ne nos notre nous on ou par pas pour qu que qui
sa se ses sur ta te tes toi ton tu un une vos votre vous c d j l à m n s
t y étée étées étant suis es êtes sont serai seras sera serons serez
seront serais serait serions seriez seraient étais était étions étiez
étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse
fusses fussions fussiez fussent ayant eu eue eues eus ai avons avez ont
aurai aurons aurez auront aurais aurait aurions auriez auraient avais
avait aviez avaient eut eûmes eûtes eurent aie aies ait ayons ayez aient
eusse eusses eût eussions eussiez eussent ceci cela celà cet cette ici
ils les leurs quel quels quelle quelles sans soi
""".split())

# ElisionFilter default articles (FrenchAnalyzer.kt DEFAULT_ARTICLES)
FRENCH_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split())

_ACCENT_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _norm(b: list[str], L: int) -> int:
    """The stemmer's normalization pass (FrenchLightStemmer.norm)."""
    if L > 4:
        for i in range(L):
            b[i] = b[i].translate(_ACCENT_FOLD)
        # collapse successive duplicate LETTERS (digits untouched)
        out = [b[0]]
        for i in range(1, L):
            if b[i] == out[-1] and b[i].isalpha():
                continue
            out.append(b[i])
        for i, ch in enumerate(out):
            b[i] = ch
        L = len(out)
    if L > 4 and b[L - 2:L] == ["i", "e"]:
        L -= 2
    if L > 4:
        if b[L - 1] == "r":
            L -= 1
        if b[L - 1] == "e":
            L -= 1
        if b[L - 1] == "e":
            L -= 1
        if b[L - 1] == b[L - 2] and b[L - 1].isalpha():
            L -= 1
    return L


def french_light_stem(s: str) -> str:
    """UniNE light stem of one lowercased token."""
    b = list(s)
    L = len(b)

    def ends(suf: str) -> bool:
        return L >= len(suf) and b[L - len(suf):L] == list(suf)

    if L > 5 and b[L - 1] == "x":
        if b[L - 3] == "a" and b[L - 2] == "u" and b[L - 4] != "e":
            b[L - 2] = "l"          # -aux → -al (chevaux → cheval)
        L -= 1
    if L > 3 and b[L - 1] == "x":
        L -= 1
    if L > 3 and b[L - 1] == "s":
        L -= 1

    if L > 9 and ends("issement"):
        L -= 6
        b[L - 1] = "r"              # -issement → -ir
        return "".join(b[:_norm(b, L)])
    if L > 8 and ends("issant"):
        L -= 4
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 6 and ends("ement"):
        L -= 4
        if L > 3 and ends("ive"):
            L -= 1
            b[L - 1] = "f"          # -ivement → -if
        return "".join(b[:_norm(b, L)])
    if L > 11 and ends("ficatrice"):
        L -= 5
        b[L - 2] = "e"
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 10 and ends("ficateur"):
        L -= 4
        b[L - 2] = "e"
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 9 and ends("catrice"):
        L -= 3
        b[L - 4] = "q"
        b[L - 3] = "u"
        b[L - 2] = "e"
        return "".join(b[:_norm(b, L)])
    if L > 8 and ends("cateur"):
        L -= 2
        b[L - 4] = "q"
        b[L - 3] = "u"
        b[L - 2] = "e"
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 8 and ends("atrice"):
        L -= 4
        b[L - 2] = "e"
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 7 and ends("ateur"):
        L -= 3
        b[L - 2] = "e"
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 6 and ends("trice"):
        L -= 1
        b[L - 3] = "e"
        b[L - 2] = "u"
        b[L - 1] = "r"              # falls through (no return)
    if L > 5 and ends("ième"):
        return "".join(b[:_norm(b, L - 4)])
    if L > 7 and ends("teuse"):
        L -= 2
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 6 and ends("teur"):
        L -= 1
        b[L - 1] = "r"
        return "".join(b[:_norm(b, L)])
    if L > 5 and ends("euse"):
        return "".join(b[:_norm(b, L - 2)])
    if L > 8 and ends("ère"):
        L -= 1
        b[L - 2] = "e"
        return "".join(b[:_norm(b, L)])
    if L > 7 and ends("ive"):
        L -= 1
        b[L - 1] = "f"
        return "".join(b[:_norm(b, L)])
    if L > 4 and (ends("folle") or ends("molle")):
        L -= 2
        b[L - 1] = "u"              # folle → fou
        return "".join(b[:_norm(b, L)])
    if L > 9 and ends("nnelle"):
        return "".join(b[:_norm(b, L - 5)])
    if L > 9 and ends("nnel"):
        return "".join(b[:_norm(b, L - 3)])
    if L > 4 and ends("ète"):
        L -= 1
        b[L - 2] = "e"              # falls through
    if L > 8 and ends("ique"):
        L -= 4                      # falls through
    if L > 8 and ends("esse"):
        return "".join(b[:_norm(b, L - 3)])
    if L > 7 and ends("inage"):
        return "".join(b[:_norm(b, L - 3)])
    if L > 9 and ends("isation"):
        L -= 7
        if L > 5 and ends("ual"):
            b[L - 2] = "e"          # ritualisation → rituel
        return "".join(b[:_norm(b, L)])
    if L > 9 and ends("isateur"):
        return "".join(b[:_norm(b, L - 7)])
    if L > 8 and ends("ation"):
        return "".join(b[:_norm(b, L - 5)])
    if L > 8 and ends("ition"):
        return "".join(b[:_norm(b, L - 5)])
    return "".join(b[:_norm(b, L)])


def elide(tok: str) -> str:
    """ElisionFilter: strip a leading default-article contraction."""
    for apo in ("'", "’"):
        i = tok.find(apo)
        if 0 < i and tok[:i] in FRENCH_ARTICLES and i + 1 < len(tok):
            return tok[i + 1:]
    return tok


class FrenchAnalyzer:
    """Pluggable analyzer slot instance (same shape as GermanAnalyzer):
    elision → stop → light stem; the stemmer runs per batch-distinct
    token."""

    name = "french"

    def __init__(self, stop_words=FRENCH_STOP_WORDS):
        self.stop_set = frozenset(stop_words)
        self.stop = sorted(self.stop_set)

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            t = elide(t)
            if t not in self.stop_set:
                out.append(french_light_stem(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc

        from .standard import StandardAnalyzer
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        # elision per UNIQUE token, then the stop filter, then stemming
        dict_arr = flat.dictionary_encode()
        elided = pa.array([elide(t) for t in
                           dict_arr.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict_arr.indices, elided) \
            .cast(pa.string())
        keep = pc.invert(pc.is_in(flat, value_set=pa.array(
            self.stop, pa.string())))
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        doc_of = doc_of[mask]
        positions = positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        dict2 = flat.dictionary_encode()
        stemmed = pa.array([french_light_stem(t) for t in
                            dict2.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict2.indices, stemmed) \
            .cast(pa.string())
        return norm_lengths, flat, doc_of, positions
