"""Spanish / Italian / Portuguese analysis chains.

Reference chains (each ``<Lang>Analyzer.kt`` in
``/root/reference/analysis/common/.../{es,it,pt}/``):

- Spanish: StandardTokenizer → LowerCase → Stop → SpanishLightStemFilter
  (``es/SpanishLightStemmer.kt`` — UniNE / Savoy CLEF-2001 light stemmer).
- Italian: StandardTokenizer → ElisionFilter(articles) → LowerCase → Stop
  → ItalianLightStemFilter (``it/ItalianLightStemmer.kt``).
- Portuguese: StandardTokenizer → LowerCase → Stop →
  PortugueseLightStemFilter (``pt/PortugueseLightStemmer.kt`` — suffix
  removal, feminine normalization, final-vowel strip, accent fold LAST).

The stemmers are exact ports of the published UniNE algorithms (CLEF
2001/2002 reports, Jacques Savoy); conformance vectors from the
reference's Test*Analyzer / Test*LightStemFilter suites live in
tests/test_romance_analyzers.py. Stop lists are the snowball project's
(public-domain data the reference also embeds).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FOLD_5V = str.maketrans("àáâäòóôöèéêëùúûüìíîï",
                         "aaaaooooeeeeuuuuiiii")
_FOLD_PT = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç",
                         "aaaaaoooooeeeeuuuuiiiic")

SPANISH_STOP_WORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre
también me hasta hay donde quien desde todo nos durante todos uno les ni
contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro
otras otra él tanto esa estos mucho quienes nada muchos cual poco ella
estar estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras
vosotros vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya
suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra vuestros
vuestras esos esas estoy estás está estamos estáis están esté estés
estemos estéis estén estaré estarás estará estaremos estaréis estarán
estaría estarías estaríamos estaríais estarían estaba estabas estábamos
estabais estaban estuve estuviste estuvo estuvimos estuvisteis
estuvieron he has ha hemos habéis han haya hayas hayamos hayáis hayan
habré habrás habrá habremos habréis habrán había habías habíamos
habíais habían soy eres es somos sois son sea seas seamos seáis sean
seré serás será seremos seréis serán era eras éramos erais eran fui
fuiste fue fuimos fuisteis fueron tengo tienes tiene tenemos tenéis
tienen tenga tengas tengamos tengáis tengan tendré tendrás tendrá
tendremos tendréis tendrán tenía tenías teníamos teníais tenían tuve
tuviste tuvo tuvimos tuvisteis tuvieron
""".split())

ITALIAN_STOP_WORDS = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in
nel nello nei negli nell negl nella nelle su sul sullo sui sugli sull
sugl sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei
mie tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre
vostro vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno
una ma ed se perché anche come dov dove che chi cui non più quale
quanto quanti quanta quante quello quelli quella quelle questo questi
questa queste si tutto tutti a c e i l o ho hai ha abbiamo avete hanno
abbia abbiate abbiano avrò avrai avrà avremo avrete avranno avrei
avresti avrebbe avremmo avreste avrebbero avevo avevi aveva avevamo
avevate avevano ebbi avesti ebbe avemmo aveste ebbero avessi avesse
avessimo avessero avendo avuto avuta avuti avute sono sei è siamo
siete sia siate siano sarò sarai sarà saremo sarete saranno sarei
saresti sarebbe saremmo sareste sarebbero ero eri era eravamo eravate
erano fui fosti fu fummo foste furono fossi fosse fossimo fossero
essendo faccio fai facciamo fanno faccia facciate facciano farò farai
farà faremo farete faranno facevo facevi faceva facevamo facevate
facevano feci facesti fece facemmo faceste fecero stai sta stiamo
stanno stia stiate stiano starò starai starà staremo starete staranno
stavo stavi stava stavamo stavate stavano stetti stesti stette stemmo
steste stettero
""".split())

PORTUGUESE_STOP_WORDS = frozenset("""
de a o que e do da em um para é com não uma os no se na por mais as dos
como mas foi ao ele das tem à seu sua ou ser quando muito há nos já
está eu também só pelo pela até isso ela entre era depois sem mesmo aos
ter seus quem nas me esse eles estão você tinha foram essa num nem suas
meu às minha têm numa pelos elas havia seja qual será nós tenho lhe
deles essas esses pelas este fosse dele tu te vocês vos lhes meus
minhas teu tua teus tuas nosso nossa nossos nossas dela delas esta
estes estas aquele aquela aqueles aquelas isto aquilo estou estamos
estive esteve estivemos estiveram estava estávamos estavam esteja
estejamos estejam estivesse estivéssemos estivessem hei havemos hão
houve houvemos houveram houvera houvéramos haja hajamos hajam houvesse
houvéssemos houvessem sou somos são era éramos eram fui foi fomos
seja sejamos sejam fosse fôssemos fossem serei seremos serão seria
seríamos seriam tenho tem temos tém tinha tínhamos tinham tive teve
tivemos tiveram tenha tenhamos tenham tivesse tivéssemos tivessem
terei terá teremos terão teria teríamos teriam
""".split())

ITALIAN_ARTICLES = frozenset(
    "c l all dall dell nell sull coll pell gl agl dagl degl negl sugl "
    "un m t s v d".split())


def spanish_light_stem(s: str) -> str:
    """``es/SpanishLightStemmer.kt`` (Savoy CLEF-2001)."""
    if len(s) < 5:
        return s
    s = s.translate(_FOLD_5V)
    c = s[-1]
    if c in "oae":
        return s[:-1]
    if c == "s":
        if s[-2] == "e" and s[-3] == "s" and s[-4] == "e":
            return s[:-2]
        if s[-2] == "e" and s[-3] == "c":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


def italian_light_stem(s: str) -> str:
    """``it/ItalianLightStemmer.kt``."""
    if len(s) < 6:
        return s
    s = s.translate(_FOLD_5V)
    c, p = s[-1], s[-2]
    if c == "e":
        return s[:-2] if p in "ih" else s[:-1]
    if c == "i":
        return s[:-2] if p in "hi" else s[:-1]
    if c in "ao":
        return s[:-2] if p == "i" else s[:-1]
    return s


def _pt_remove_suffix(s: str) -> str:
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in "rslz":
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-3] + "al"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    n = len(s)
    if n > 7 and (s.endswith("inha") or s.endswith("iaca") or
                  s.endswith("eira")):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(s: str) -> str:
    """``pt/PortugueseLightStemmer.kt`` — accent fold runs LAST, after
    the rewrites that INTRODUCE accented chars (ões→ão, esa→ês)."""
    if len(s) < 4:
        return s
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_FOLD_PT)


def _elide_it(tok: str) -> str:
    for apo in ("'", "’"):
        i = tok.find(apo)
        if 0 < i and tok[:i] in ITALIAN_ARTICLES and i + 1 < len(tok):
            return tok[i + 1:]
    return tok


class _RomanceAnalyzer:
    """Shared chain shape: [elision →] stop → per-unique-token stem."""

    name = "romance"
    stop_words: frozenset[str] = frozenset()
    elide = None  # optional per-token elision fn

    def __init__(self):
        self.stop_set = frozenset(self.stop_words)
        self.stop = sorted(self.stop_set)

    def _stem(self, tok: str) -> str:  # pragma: no cover - overridden
        return tok

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            if self.elide is not None:
                t = self.elide(t)
            if t not in self.stop_set:
                out.append(self._stem(t))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc

        from .standard import StandardAnalyzer
        doc_lengths, flat, doc_of, positions = \
            StandardAnalyzer().analyze_flat(texts)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        if self.elide is not None:
            dict_arr = flat.dictionary_encode()
            elided = pa.array([self.elide(t) for t in
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
        stemmed = pa.array([self._stem(t) for t in
                            dict2.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict2.indices, stemmed) \
            .cast(pa.string())
        return norm_lengths, flat, doc_of, positions


class SpanishAnalyzer(_RomanceAnalyzer):
    name = "spanish"
    stop_words = SPANISH_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return spanish_light_stem(tok)


class ItalianAnalyzer(_RomanceAnalyzer):
    name = "italian"
    stop_words = ITALIAN_STOP_WORDS
    elide = staticmethod(_elide_it)

    def _stem(self, tok: str) -> str:
        return italian_light_stem(tok)


class PortugueseAnalyzer(_RomanceAnalyzer):
    name = "portuguese"
    stop_words = PORTUGUESE_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return portuguese_light_stem(tok)
