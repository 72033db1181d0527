"""Estonian analysis chain.

Reference chain (``/root/reference/analysis/common/.../et/EstonianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(EstonianStemmer).

EstonianStemmer (``tartarus/snowball/ext/EstonianStemmer.kt``, Snowball
2.2):

- verb_exceptions: a whole-word table of irregular verbs (jooma,
  saama, …) rewrites and STOPS all further processing;
- R1 = after the first non-vowel following the first vowel
  (V1 = a e i o u ä õ ö ü);
- emphasis: gi/ki clitic (R1-bounded, stem ≥ 4 chars, preceding char
  class, gi additionally not after a long vowel);
- verb suffixes (R1): delete, akse→a, da/b/me/n after a V1 vowel;
- else the substantive pipeline, each stage on the evolving word:
  special noun endings (lane→lase families), case endings (t needs a
  4-char stem; ga/ta/le/sse/… after an RV vowel or long vowel), the
  d/de/te plurals (te: stems under 4 chars → t, stems ending las/lis/
  mis → e, stems ending t → untouched, else deleted), degrees
  (ma / m·mai after an RV vowel), i-plural after an RV vowel, and
  va/du/nu/tu;
- undouble kk/pp/tt before a final vowel (p1 ≤ position).

SQL mirror: ``oracle.bm25_estonian_topk``.  Parity fuzzing lives in
tests/test_estonian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

# the reference's DEFAULT_STOPWORD_DATA is a 3-word placeholder list
# (EstonianAnalyzer.kt:79-84) — kept verbatim for parity
ESTONIAN_STOP_WORDS = frozenset("alla all alt".split())

ET_V1 = frozenset("aeiouäõöü")
ET_RV = frozenset("aeiou")
ET_KI = frozenset("bdfghkpstzš")
ET_GI = frozenset("aceijlmnoqruvwxäõö")
ET_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "õõ",
            "öö", "üü")

# (suffix, action) tables, longest-first
ET_VERB = [("nuksime", 1), ("nuksite", 1), ("nuksid", 1),
           ("dakse", 1), ("takse", 1), ("ksime", 1), ("ksite", 1),
           ("nuksin", 1), ("mata", 1), ("ksid", 1), ("sime", 1),
           ("akse", 2), ("site", 1), ("ksin", 1), ("daks", 1),
           ("taks", 1), ("sin", 1), ("da", 3), ("me", 3),
           ("b", 3), ("n", 3)]
ET_SPECIAL = [("lasse", "lase"), ("lisse", "lise"),
              ("misse", "mise"), ("lane", "lase"), ("line", "lise"),
              ("mine", "mise"), ("lasi", "lase"), ("lisi", "lise"),
              ("misi", "mise"), ("last", "lase"), ("list", "lise"),
              ("mist", "mise")]
ET_CASE = [("sse", 1), ("ga", 1), ("ta", 1), ("le", 1), ("ks", 1),
           ("lt", 1), ("st", 1), ("l", 1), ("s", 1), ("t", 2)]
ET_PLURAL = [("ikkude", 1), ("ikke", 1), ("ike", 1), ("sid", 2),
             ("de", 4), ("te", 3), ("d", 4)]
ET_NU = ("va", "du", "nu", "tu")
ET_DEGREES = [("mai", 1), ("ma", 2), ("m", 1)]

ET_VERB_EXCEPTIONS = {}
_ET_EXC_STEMS = {1: "joo", 2: "saa", 3: "viima", 4: "keesi",
                 5: "löö", 6: "lõi", 7: "loo", 8: "käisi",
                 9: "söö", 10: "too", 11: "võisi", 12: "jääma",
                 13: "müüsi", 14: "luge", 15: "põde",
                 16: "ladu", 17: "tegi", 18: "nägi"}
_ET_EXC_WORDS = {
    1: """joob jood joodakse jooma joomata joome joon joote joovad
          juua juuakse jõi jõid jõime jõin jõite""",
    2: """saab saad saada saadakse saadi saaks saaksid saaksime
          saaksin saaksite saama saamata saame saan saate saavad sai
          said saime sain saite""",
    3: """viia viiakse viib viid viidi viiks viiksid viiksime
          viiksin viiksite viima viimata viime viin viisime viisin
          viisite viite viivad""",
    4: """keeb keed keedakse keeks keeksid keeksime keeksin keeksite
          keema keemata keeme keen kees keeta keete keevad""",
    5: """lööb lööd löödakse löödi lööks lööksid lööksime
          lööksin lööksite lööma löömata lööme löön lööte
          löövad lüüa lüüakse""",
    6: """lõi lõid lõime lõin lõite""",
    7: """loob lood loodi looks looksid looksime looksin looksite
          looma loomata loome loon loote loovad luua luuakse""",
    8: """käia käiakse käib käid käidi käiks käiksid käiksime
          käiksin käiksite käima käimata käime käin käis käite
          käivad""",
    9: """sõi sõid sõime sõin sõite sööb sööd söödakse söödi
          sööks sööksid sööksime sööksin sööksite sööma söömata
          sööme söön sööte söövad süüa süüakse""",
    10: """toob tood toodi tooks tooksid tooksime tooksin tooksite
           tooma toomata toome toon toote toovad tuua tuuakse tõi
           tõid tõime tõin tõite""",
    11: """võib võid võida võidakse võidi võiks võiksid võiksime
           võiksin võiksite võima võimata võime võin võis võite
           võivad""",
    12: """jäi jäid jäime jäin jäite jääb jääd jääda jäädakse
           jäädi jääks jääksid jääksime jääksin jääksite jääma
           jäämata jääme jään jääte jäävad""",
    13: """müüa müüakse müüb müüd müüdi müüks müüksid müüksime
           müüksin müüksite müüma müümata müüme müün müüs müüte
           müüvad""",
    14: """loeb loed loeks loeksid loeksime loeksin loeksite loeme
           loen loete loevad""",
    15: """põeb põed põeks põeksid põeksime põeksin põeksite põeme
           põen põete põevad""",
    16: """laob laod laoks laoksid laoksime laoksin laoksite laome
           laon laote laovad""",
    17: """teeb teed teeks teeksid teeksime teeksin teeksite teeme
           teen teete teevad tegema tegemata teha tehakse tehti""",
    18: """näeb näed näeks näeksid näeksime näeksin näeksite näeme
           näen näete näevad nägema nägemata näha nähakse nähti""",
}
for _r, _ws in _ET_EXC_WORDS.items():
    for _w in _ws.split():
        ET_VERB_EXCEPTIONS[_w] = _ET_EXC_STEMS[_r]


def _et_p1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in ET_V1:
        i += 1
    while i < n and w[i] in ET_V1:
        i += 1
    return n if i == n else i + 1


def _et_longv_before(w: str, s: int) -> bool:
    return s >= 2 and w[s - 2:s] in ET_LONGV


def _et_emphasis(w: str, p1: int) -> str:
    for sfx, act in (("gi", 1), ("ki", 2)):
        if len(w) - 2 >= p1 and w.endswith(sfx):
            s = len(w) - 2
            if s < 4:
                return w
            if act == 1:
                if (s >= 1 and w[s - 1] in ET_GI
                        and not _et_longv_before(w, s)):
                    return w[:s]
            else:
                if s >= 1 and w[s - 1] in ET_KI:
                    return w[:s]
            return w
    return w


def _et_verb(w: str, p1: int) -> tuple[str, bool]:
    for sfx, act in ET_VERB:
        if len(w) - len(sfx) >= p1 and w.endswith(sfx):
            s = len(w) - len(sfx)
            if act == 1:
                return w[:s], True
            if act == 2:
                return w[:s] + "a", True
            if s >= 1 and w[s - 1] in ET_V1:
                return w[:s], True
            return w, False
    return w, False


def _et_special(w: str, p1: int) -> str:
    for sfx, repl in ET_SPECIAL:
        if len(w) - len(sfx) >= p1 and w.endswith(sfx):
            return w[:len(w) - len(sfx)] + repl
    return w


def _et_case(w: str, p1: int) -> str:
    for sfx, act in ET_CASE:
        if len(w) - len(sfx) >= p1 and w.endswith(sfx):
            s = len(w) - len(sfx)
            if act == 1:
                if not ((s >= 1 and w[s - 1] in ET_RV)
                        or _et_longv_before(w, s)):
                    return w
            else:       # 't' needs a stem of at least 4 chars
                if s < 4:
                    return w
            return w[:s]
    return w


def _et_plural(w: str, p1: int) -> str:
    for sfx, act in ET_PLURAL:
        if len(w) - len(sfx) >= p1 and w.endswith(sfx):
            s = len(w) - len(sfx)
            if act == 1:
                return w[:s] + "iku"
            if act == 2:
                if _et_longv_before(w, s):
                    return w
                return w[:s]
            if act == 3:   # te
                if s >= 4:
                    stem = w[:s]
                    if stem.endswith(("las", "lis", "mis")):
                        return stem + "e"
                    if stem.endswith("t"):
                        return w      # a_6 't' entry: no action
                    return stem       # the empty among entry: delete
                return w[:s] + "t"
            # act 4: d / de
            if ((s >= 1 and w[s - 1] in ET_RV)
                    or _et_longv_before(w, s)):
                return w[:s]
            return w
    return w


def _et_degrees(w: str, p1: int) -> str:
    for sfx, act in ET_DEGREES:
        if len(w) - len(sfx) >= p1 and w.endswith(sfx):
            s = len(w) - len(sfx)
            if act == 1:
                if s >= 1 and w[s - 1] in ET_RV:
                    return w[:s]
                return w
            return w[:s]
    return w


def _et_i_plural(w: str, p1: int) -> str:
    if len(w) - 1 >= p1 and w.endswith("i") and len(w) >= 2 \
            and w[-2] in ET_RV:
        return w[:-1]
    return w


def _et_nu(w: str, p1: int) -> str:
    for sfx in ET_NU:
        if len(w) - 2 >= p1 and w.endswith(sfx):
            return w[:-2]
    return w


def _et_undouble(w: str, p1: int) -> str:
    if len(w) >= 1 and w[-1] in ET_V1 and p1 <= len(w) - 1:
        for sfx, repl in (("kk", "k"), ("pp", "p"), ("tt", "t")):
            if w[:-1].endswith(sfx):
                return w[:len(w) - 3] + repl + w[-1]
    return w


def estonian_stem(w: str) -> str:
    exc = ET_VERB_EXCEPTIONS.get(w)
    if exc is not None:
        return exc
    p1 = _et_p1(w)
    w = _et_emphasis(w, p1)
    w2, verbed = _et_verb(w, p1)
    if verbed:
        w = w2
    else:
        w = _et_special(w, p1)
        w = _et_case(w, p1)
        w = _et_plural(w, p1)
        w = _et_degrees(w, p1)
        w = _et_i_plural(w, p1)
        w = _et_nu(w, p1)
    return _et_undouble(w, p1)


class EstonianAnalyzer(_RomanceAnalyzer):
    name = "estonian"
    stop_words = ESTONIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return estonian_stem(tok)
