"""Romanian analysis chain (snowball RomanianStemmer, kmp semantics).

Reference chain (``/root/reference/analysis/common/.../ro/RomanianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → RomanianNormalization (cedilla
ş/ţ → comma ș/ț) → SnowballFilter(RomanianStemmer).

The stemmer is ported to the REFERENCE KOTLIN's exact behavior
(``tartarus/snowball/ext/RomanianStemmer.kt``), which differs from
upstream snowball in four label-flattened spots we mirror faithfully:

- ``combo_suffix`` runs ONCE, not ``repeat`` (kt lines 573-583);
- ``verb_suffix`` is attempted regardless of B_standard_suffix_removed
  (kt 674-688);
- verb action 1 requires a preceding 'u' (the non-vowel alternative is
  flattened away, kt 623-637);
- ``postlude`` examines only the first character (kt 475-497) — and
  since the prelude never marks position 0, the I/U markers REMAIN in
  emitted terms.

Everything else is standard snowball Romanian: norm (replace all ş→ș,
ţ→ț), prelude (u/i between vowels → U/I), RV/R1/R2 regions, step_0
plural/article removal (R1), combo+standard suffixes (R1/R2), verb
suffixes (in RV), final vowel removal (RV).

The oracle mirror (``oracle.bm25_romanian_topk``) GENERATES the same
cascades (recursive-CTE prelude, staged CASE steps).  Vectors from
TestRomanianAnalyzer.kt live in tests/test_romanian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

ROMANIAN_STOP_WORDS = frozenset("""
acea aceasta această aceea acei aceia acel acela acele acelea acest acesta aceste acestea aceşti aceştia acești aceștia acolo acum ai aia aibă aici al ale alea altceva altcineva am ar are asemenea asta astea astăzi asupra au avea avem aveţi aveți azi aş aşadar aţi aș așadar ați bine bucur bună ca care ce cel ceva chiar cine cineva contra cu cum cumva curând curînd când cât câte câtva câţi câți cînd cît cîte cîtva cîţi cîți că căci cărei căror cărui către da dacă dar datorită de deci deja deoarece departe deşi deși din dinaintea dintr dintre drept după dă ea ei el ele eram este eu eşti ești face fi fie fiecare fii fim fiţi fiți fără iar ieri la le li lor lui lângă lîngă mea mei mele mereu meu mi mine mult multă mulţi mulți mâine mă ne nici nicăieri nimeni nişte niște noastre noastră noi nostru noştri noștri nu ori oricare orice oricine oricum oricând oricât oricînd oricît oriunde pe pentru peste poate pot prea prima primul prin printr până pînă sa sale sau se spre sub sunt suntem sunteţi sunteți sînt sîntem sînteţi sînteți să săi său ta tale te tine toate toată tot totuşi totuși toţi toți tu tăi tău un una unde undeva unei unele uneori unor vi voastre voastră voi vostru vouă voştri voștri vreo vreun vă îi îl îmi împotriva în înainte înaintea încotro încât încît între întrucât întrucît îţi îți ăla ălea ăsta ăstea ăştia ăștia şi ţi ţie și ți ție
""".split())

RO_VOWELS = frozenset("aeiou\u00e2\u00ee\u0103")
_RO_NORM = str.maketrans("\u015e\u015f\u0162\u0163",
                         "\u0218\u0219\u021a\u021b")

# among tables (longest-first), actions per the kt `when` blocks
RO_STEP0 = [('iilor', 4), ('ația', 7), ('ație', 7), ('iile', 4), ('atei', 6), ('ului', 1), ('elor', 3), ('ilor', 4), ('aua', 2), ('iua', 4), ('ele', 3), ('ile', 5), ('iei', 4), ('ea', 3), ('ii', 4), ('ul', 1)]
RO_COMBO = [('abilitate', 1), ('ibilitate', 2), ('abilitati', 1), ('abilități', 1), ('abilităi', 1), ('icitate', 4), ('ivitate', 3), ('icatori', 4), ('icitati', 4), ('ivitati', 3), ('icități', 4), ('ivități', 3), ('ațiune', 5), ('ițiune', 6), ('atoare', 5), ('itoare', 6), ('ătoare', 5), ('icităi', 4), ('ivităi', 3), ('icator', 4), ('icala', 4), ('iciva', 4), ('ativa', 5), ('itiva', 6), ('icale', 4), ('icive', 4), ('ative', 5), ('itive', 6), ('icali', 4), ('atori', 5), ('itori', 6), ('ători', 5), ('icivi', 4), ('ativi', 5), ('itivi', 6), ('icală', 4), ('icivă', 4), ('ativă', 5), ('itivă', 6), ('ical', 4), ('ator', 5), ('itor', 6), ('ător', 5), ('iciv', 4), ('ativ', 5), ('itiv', 6)]
RO_STD = [('abila', 1), ('ibila', 1), ('abile', 1), ('ibile', 1), ('itate', 1), ('abili', 1), ('ibili', 1), ('atori', 1), ('itati', 1), ('ități', 1), ('abilă', 1), ('ibilă', 1), ('oasa', 1), ('anta', 1), ('ista', 3), ('isme', 3), ('iune', 2), ('oase', 1), ('ante', 1), ('iste', 3), ('iuni', 2), ('anti', 1), ('isti', 3), ('iști', 3), ('ităi', 1), ('abil', 1), ('ibil', 1), ('ator', 1), ('oasă', 1), ('antă', 1), ('istă', 3), ('ica', 1), ('ata', 1), ('ita', 1), ('uta', 1), ('iva', 1), ('ice', 1), ('ate', 1), ('ite', 1), ('ute', 1), ('ive', 1), ('ici', 1), ('osi', 1), ('ati', 1), ('iti', 1), ('uti', 1), ('ivi', 1), ('oși', 1), ('ism', 3), ('ant', 1), ('ist', 3), ('ică', 1), ('ată', 1), ('ită', 1), ('ută', 1), ('ivă', 1), ('ic', 1), ('os', 1), ('at', 1), ('it', 1), ('ut', 1), ('iv', 1)]
RO_VERB = [('seserăți', 2), ('aserăți', 1), ('iserăți', 1), ('userăți', 1), ('âserăți', 1), ('seserăm', 2), ('seseși', 2), ('serăți', 2), ('aserăm', 1), ('iserăm', 1), ('userăm', 1), ('âserăm', 1), ('seseră', 2), ('aseși', 1), ('iseși', 1), ('useși', 1), ('âseși', 1), ('arăți', 1), ('irăți', 1), ('urăți', 1), ('ârăți', 1), ('sesem', 2), ('serăm', 2), ('ească', 1), ('aseră', 1), ('iseră', 1), ('useră', 1), ('âseră', 1), ('sese', 2), ('ește', 1), ('ăște', 1), ('ești', 1), ('ăști', 1), ('seși', 2), ('eați', 1), ('iați', 1), ('asem', 1), ('isem', 1), ('usem', 1), ('âsem', 1), ('arăm', 1), ('irăm', 1), ('urăm', 1), ('ârăm', 1), ('indu', 1), ('ându', 1), ('seră', 2), ('ează', 1), ('esc', 1), ('ăsc', 1), ('ind', 1), ('ând', 1), ('are', 1), ('ere', 1), ('ire', 1), ('âre', 1), ('ase', 1), ('ise', 1), ('use', 1), ('âse', 1), ('eze', 1), ('eai', 1), ('iai', 1), ('sei', 2), ('ezi', 1), ('ași', 1), ('iși', 1), ('uși', 1), ('âși', 1), ('ați', 2), ('eți', 2), ('iți', 2), ('âți', 2), ('eam', 1), ('iam', 1), ('eau', 1), ('iau', 1), ('ară', 1), ('iră', 1), ('ură', 1), ('âră', 1), ('ea', 1), ('ia', 1), ('se', 2), ('ai', 1), ('ui', 1), ('âi', 1), ('am', 1), ('em', 2), ('im', 2), ('âm', 2), ('ăm', 2), ('au', 1), ('ez', 1)]
RO_FINAL_VOWEL = [('ie', 1), ('a', 1), ('e', 1), ('i', 1), ('ă', 1)]

RO_STEP0_REPL = {1: "", 2: "a", 3: "e", 4: "i", 5: "i", 6: "at",
                 7: "a\u021bi"}
RO_COMBO_REPL = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at",
                 6: "it"}


def _ro_prelude(w: str) -> str:
    out: list[str] = []
    n = len(w)
    for p, c in enumerate(w):
        if (c in "ui" and p > 0 and out[p - 1] in RO_VOWELS
                and p + 1 < n and w[p + 1] in RO_VOWELS):
            out.append("U" if c == "u" else "I")
        else:
            out.append(c)
    return "".join(out)


def _ro_rv(w: str) -> int:
    n = len(w)
    if n < 2:
        return n
    if w[0] in RO_VOWELS:
        if w[1] not in RO_VOWELS:
            i = 2
            while i < n and w[i] not in RO_VOWELS:
                i += 1
            return i + 1 if i < n else n
        i = 2
        while i < n and w[i] in RO_VOWELS:
            i += 1
        return i + 1 if i < n else n
    if w[1] not in RO_VOWELS:
        i = 2
        while i < n and w[i] not in RO_VOWELS:
            i += 1
        return i + 1 if i < n else n
    return 3 if n >= 3 else n


def _ro_r12(w: str) -> tuple[int, int]:
    n = len(w)

    def scan(i: int, want_vowel: bool) -> int:
        while i < n:
            if (w[i] in RO_VOWELS) == want_vowel:
                return i + 1
            i += 1
        return -1

    i = scan(0, True)
    if i < 0:
        return n, n
    i = scan(i, False)
    if i < 0:
        return n, n
    p1 = i
    j = scan(i, True)
    if j >= 0:
        j = scan(j, False)
    return p1, (j if j >= 0 else n)


def romanian_stem(word: str) -> str:
    w = word.translate(_RO_NORM)
    w = _ro_prelude(w)
    pv = _ro_rv(w)
    p1, p2 = _ro_r12(w)

    # step 0 — plural/article (R1)
    for sfx, act in RO_STEP0:
        if w.endswith(sfx):
            base = len(w) - len(sfx)
            if base >= p1:
                if act == 5 and w[:base].endswith("ab"):
                    break
                w = w[:base] + RO_STEP0_REPL[act]
            break

    # standard suffixes: combo ONCE (kt semantics), then a_4 in R2
    removed = False
    for sfx, act in RO_COMBO:
        if w.endswith(sfx):
            base = len(w) - len(sfx)
            if base >= p1:
                w = w[:base] + RO_COMBO_REPL[act]
                removed = True
            break
    for sfx, act in RO_STD:
        if w.endswith(sfx):
            base = len(w) - len(sfx)
            if base >= p2:
                if act == 1:
                    w = w[:base]
                    removed = True
                elif act == 2:
                    if base >= 1 and w[base - 1] == "\u021b":
                        w = w[:base - 1] + "t"
                        removed = True
                else:
                    w = w[:base] + "ist"
                    removed = True
            break

    # verb suffixes — attempted unconditionally (kt flattening).  The
    # among runs with limit_backward = pV, so the longest suffix that
    # fits ENTIRELY inside RV wins (unlike the other steps, where the
    # structural longest match wins and a failed region check is final)
    del removed  # kt's B flag ends up unused (see module docstring)
    for sfx, act in RO_VERB:
        base = len(w) - len(sfx)
        if base >= pv and w.endswith(sfx):
            if act == 1:
                if base - 1 >= pv and w[base - 1] == "u":
                    w = w[:base]
            else:
                w = w[:base]
            break

    # final vowel (RV)
    for sfx, _act in RO_FINAL_VOWEL:
        if w.endswith(sfx):
            base = len(w) - len(sfx)
            if base >= pv:
                w = w[:base]
            break

    # postlude (kt: first char only; unreachable in practice)
    if w.startswith("I"):
        w = "i" + w[1:]
    elif w.startswith("U"):
        w = "u" + w[1:]
    return w


class RomanianAnalyzer(_RomanceAnalyzer):
    name = "romanian"
    stop_words = ROMANIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return romanian_stem(tok)
