"""Greek analysis chain.

Reference chain (``/root/reference/analysis/common/.../el/GreekAnalyzer.kt``):
StandardTokenizer → GreekLowerCaseFilter → Stop → GreekStemFilter.

GreekLowerCaseFilter (``el/GreekLowerCaseFilter.kt``) lowercases,
strips the tonos/dialytika diacritics to the base lowercase vowel and
standardizes final sigma (ς → σ); it runs here as a fold table applied
after the tokenizer's built-in lowercase (uppercase accented forms
lower to the accented lowercase first, then fold to the base).

GreekStemmer (``el/GreekStemmer.kt``) is the Ntais/Saroukos stemmer:
22 ordered suffix rules with exception word/prefix sets and add-backs;
rule21 (generic verb/noun endings) runs only when rules 0-20 left the
LENGTH unchanged, and rule22 (comparatives) always runs.  Words shorter
than 4 chars are left alone.  The reference inherits upstream Lucene's
operator-precedence quirks in rules 0 and 8 (the length guard binds
only to the first suffix of the chain); this port reproduces them
faithfully and marks each with a ``# quirk`` comment.

SQL mirror: ``oracle.bm25_greek_topk`` — 23 chained CTE stages GENERATED
from the same suffix/exception tables.  Conformance vectors from
TestGreekStemmer.kt / TestGreekAnalyzer.kt live in
tests/test_greek_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

GREEK_STOP_WORDS = frozenset("""
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα
εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ
ομωσ ισωσ οσο οτι
""".split())

# lowercase accented → base (applied after str.lower()); ς → σ; the
# legacy U+03A2 (reserved capital final sigma) → ς for old-index parity
GREEK_FOLD = {
    "ά": "α", "έ": "ε", "ή": "η",
    "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "ό": "ο", "ώ": "ω", "ς": "σ",
    "΢": "ς",
}
_EL_TRANS = str.maketrans(GREEK_FOLD)

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def greek_lowercase(s: str) -> str:
    return s.lower().translate(_EL_TRANS)


def _ev(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS


def _evny(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS_NO_Y


# --- shared rule tables (each also feeds the SQL generator) ---------------
EL_R1 = (("αδεσ", "αδων"), ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ",
                                      "γιαγι", "νταντ", "κυρ", "θει",
                                      "πεθερ"), "αδ")
EL_R2 = (("εδεσ", "εδων"), ("οπ", "ιπ", "εμπ", "υπ", "γηπ",
                                      "δαπ", "κρασπ", "μιλ"), "εδ")
EL_R3 = (("ουδεσ", "ουδων"), ("αρκ", "καλιακ", "πεταλ", "λιχ",
                                        "πλεξ", "σκ", "σ", "φλ", "φρ",
                                        "βελ", "λουλ", "χν", "σπ",
                                        "τραγ", "φε"), "ουδ")
EL_EXC4 = ("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
EL_EXC6 = ("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
           "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν",
           "καταδ", "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ",
           "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ", "πικαντ",
           "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
           "υποδ", "φιλον", "φυλοδ", "χασ")
EL_EXC7 = ("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
           "πεθ", "πικρ", "ποτ", "σιχ", "χ")
EL_EXC8A = ("τρ", "τσ")
EL_EXC8B = ("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
            "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ",
            "μουσουλμ", "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ",
            "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ",
            "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
            "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ",
            "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ",
            "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ",
            "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ",
            "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ",
            "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ",
            "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ",
            "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ",
            "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
            "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ",
            "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ")
EL_EXC9 = ("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
           "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
           "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
           "εμ", "θαρρ", "θ")
EL_EXC9_SFX = ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ",
               "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ",
               "πυρ", "αιν", "συνδ", "συν", "συνθ", "χωρ", "πον",
               "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ",
               "βαρ", "βολ", "ωφελ")
EL_EXC12A = ("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
EL_EXC12B = ("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
             "προ", "νισ")
EL_EXC13 = ("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
EL_EXC13_SFX = ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
EL_EXC14 = ("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
            "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
            "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ",
            "δε", "δευτερευ", "καθαρευ", "πλε", "τσα")
EL_EXC14_SFX = ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ",
                "μαλλ", "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
EL_EXC15A = ("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ",
             "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ",
             "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ",
             "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
             "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
             "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ",
             "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
             "μ")
EL_EXC15A_SFX = ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ",
                 "πρ", "λοχ", "σμην")
EL_EXC15B = ("ψοφ", "ναυλοχ")
EL_EXC16 = ("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
            "επταν")
EL_EXC17 = ("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
            "ευχρ", "κοινοχρ", "παλιμψ")
EL_EXC18 = ("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
EL_EXC19 = ("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
            "ασουσ")
# rule21 cascade: (min_len_exclusive, suffixes, drop)
EL_R21 = [
    (9, ("ιοντουσαν",), 9),
    (8, ("ιομασταν", "ιοσασταν", "ιουμαστε",
         "οντουσαν"), 8),
    (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε",
         "ιοσουνα", "ιουνται", "ιουνταν", "ηθηκατε",
         "ομασταν", "οσασταν", "ουμαστε"), 7),
    (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε",
         "ηθηκαν", "ομουνα", "οσαστε", "οσουνα",
         "ουνται", "ουνταν", "ουσατε"), 6),
    (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν",
         "ιουμα", "ηθεισ", "ηθουν", "ηκατε", "ησατε",
         "ησουν", "ομουν", "ονται", "ονταν", "οσουν",
         "ουμαι", "ουσαν"), 5),
    (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι",
         "εται", "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν",
         "ησει", "ησεσ", "ομαι", "οταν"), 4),
    (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"), 3),
    (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ",
         "ου", "υσ", "ων"), 2),
]
EL_R22_5 = ("εστερ", "εστατ")
EL_R22_4 = ("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")


def _r0(s: str) -> str:
    n = len(s)
    if n > 9 and (s.endswith("καθεστωτοσ") or
                  s.endswith("καθεστωτων")):
        return s[:-4]
    if n > 8 and (s.endswith("γεγονοτοσ") or
                  s.endswith("γεγονοτων")):
        return s[:-4]
    if n > 8 and s.endswith("καθεστωτα"):
        return s[:-3]
    if n > 7 and (s.endswith("τατογιου") or s.endswith("τατογιων")):
        return s[:-4]
    if n > 7 and s.endswith("γεγονοτα"):
        return s[:-3]
    if n > 7 and s.endswith("καθεστωσ"):
        return s[:-2]
    # quirk: the len guard binds only to the first suffix (upstream parity)
    if ((n > 6 and s.endswith("σκαγιου")) or s.endswith("σκαγιων")
            or s.endswith("ολογιου") or s.endswith("ολογιων")
            or s.endswith("κρεατοσ") or s.endswith("κρεατων")
            or s.endswith("περατοσ") or s.endswith("περατων")
            or s.endswith("τερατοσ") or s.endswith("τερατων")):
        return s[:-4]
    if n > 6 and s.endswith("τατογια"):
        return s[:-3]
    if n > 6 and s.endswith("γεγονοσ"):
        return s[:-2]
    if n > 5 and (s.endswith("φαγιου") or s.endswith("φαγιων") or
                  s.endswith("σογιου") or s.endswith("σογιων")):
        return s[:-4]
    if n > 5 and (s.endswith("σκαγια") or s.endswith("ολογια") or
                  s.endswith("κρεατα") or s.endswith("περατα") or
                  s.endswith("τερατα")):
        return s[:-3]
    if n > 4 and (s.endswith("φαγια") or s.endswith("σογια") or
                  s.endswith("φωτοσ") or s.endswith("φωτων")):
        return s[:-3]
    if n > 4 and (s.endswith("κρεασ") or s.endswith("περασ") or
                  s.endswith("τερασ")):
        return s[:-2]
    if n > 3 and s.endswith("φωτα"):
        return s[:-2]
    if n > 2 and s.endswith("φωσ"):
        return s[:-1]
    return s


def _strip_addback(s: str, suffixes, exc_prefixes, addback, min_len,
                   invert=False) -> str:
    """rules 1-3 shape: strip a suffix; add back when the stem does
    (invert=False: does NOT) end with an exception prefix."""
    if len(s) > min_len and any(s.endswith(x) for x in suffixes):
        k = len(suffixes[0])
        s = s[:-k]
        hit = any(s.endswith(p) for p in exc_prefixes)
        if hit if invert else not hit:
            s += addback
    return s


def _r4(s: str) -> str:
    if len(s) > 3 and (s.endswith("εωσ") or s.endswith("εων")):
        s = s[:-3]
        if s in EL_EXC4:
            s += "ε"
    return s


def _r5(s: str) -> str:
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if _ev(s):
            s += "ι"
    elif len(s) > 3 and (s.endswith("ιου") or s.endswith("ιων")):
        s = s[:-3]
        if _ev(s):
            s += "ι"
    return s


def _r6(s: str) -> str:
    removed = False
    if len(s) > 3 and (s.endswith("ικα") or s.endswith("ικο")):
        s, removed = s[:-3], True
    elif len(s) > 4 and (s.endswith("ικου") or s.endswith("ικων")):
        s, removed = s[:-4], True
    if removed and (_ev(s) or s in EL_EXC6):
        s += "ικ"
    return s


def _r7(s: str) -> str:
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and (s.endswith("αγαμε") or s.endswith("ησαμε")
                         or s.endswith("ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        s = s[:-3]
        if s in EL_EXC7:
            s += "αμ"
    return s


def _r8(s: str) -> str:
    removed = False
    n = len(s)
    if n > 8 and s.endswith("ιουντανε"):
        s, removed = s[:-8], True
    # quirk ×3: guards bind only to the first suffix of each chain
    elif ((n > 7 and s.endswith("ιοντανε")) or s.endswith("ουντανε")
          or s.endswith("ηθηκανε")):
        s, removed = s[:-7], True
    elif ((n > 6 and s.endswith("ιοτανε")) or s.endswith("οντανε")
          or s.endswith("ουσανε")):
        s, removed = s[:-6], True
    elif ((n > 5 and s.endswith("αγανε")) or s.endswith("ησανε")
          or s.endswith("οτανε") or s.endswith("ηκανε")):
        s, removed = s[:-5], True
    if removed and s in EL_EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if _evny(s) or s in EL_EXC8B:
            s += "αν"
    return s


def _r9(s: str) -> str:
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if (s in EL_EXC9 or _evny(s)
                or any(s.endswith(x) for x in EL_EXC9_SFX)):
            s += "ετ"
    return s


def _r10(s: str) -> str:
    if len(s) > 5 and (s.endswith("οντασ") or s.endswith("ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s += "οντ"
        if s.endswith("κρε"):
            s += "ωντ"
    return s


def _r11(s: str) -> str:
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    return s


def _r12(s: str) -> str:
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in EL_EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in EL_EXC12B:
            s += "εστ"
    return s


def _r13(s: str) -> str:
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and (s.endswith("ηθηκα") or s.endswith("ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s, removed = s[:-4], True
    elif len(s) > 3 and (s.endswith("ηκα") or s.endswith("ηκε")):
        s, removed = s[:-3], True
    if removed and (s in EL_EXC13
                    or any(s.endswith(x) for x in EL_EXC13_SFX)):
        s += "ηκ"
    return s


def _r14(s: str) -> str:
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s, removed = s[:-5], True
    elif len(s) > 4 and (s.endswith("ουσα") or s.endswith("ουσε")):
        s, removed = s[:-4], True
    if removed and (s in EL_EXC14 or _ev(s)
                    or any(s.endswith(x) for x in EL_EXC14_SFX)):
        s += "ουσ"
    return s


def _r15(s: str) -> str:
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s, removed = s[:-4], True
    elif len(s) > 3 and (s.endswith("αγα") or s.endswith("αγε")):
        s, removed = s[:-3], True
    if removed:
        cond1 = (s in EL_EXC15A
                 or any(s.endswith(x) for x in EL_EXC15A_SFX))
        cond2 = s in EL_EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


def _r16(s: str) -> str:
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s, removed = s[:-4], True
    elif len(s) > 3 and (s.endswith("ησε") or s.endswith("ησα")):
        s, removed = s[:-3], True
    if removed and s in EL_EXC16:
        s += "ησ"
    return s


def _r17(s: str) -> str:
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in EL_EXC17:
            s += "ηστ"
    return s


def _r18(s: str) -> str:
    removed = False
    if len(s) > 6 and (s.endswith("ησουνε") or s.endswith("ηθουνε")):
        s, removed = s[:-6], True
    elif len(s) > 4 and s.endswith("ουνε"):
        s, removed = s[:-4], True
    if removed and s in EL_EXC18:
        s += "ουν"
    return s


def _r19(s: str) -> str:
    removed = False
    if len(s) > 6 and (s.endswith("ησουμε") or s.endswith("ηθουμε")):
        s, removed = s[:-6], True
    elif len(s) > 4 and s.endswith("ουμε"):
        s, removed = s[:-4], True
    if removed and s in EL_EXC19:
        s += "ουμ"
    return s


def _r20(s: str) -> str:
    if len(s) > 5 and (s.endswith("ματων") or s.endswith("ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


def _r21(s: str) -> str:
    for min_len, suffixes, drop in EL_R21:
        if len(s) > min_len and any(s.endswith(x) for x in suffixes):
            return s[:-drop]
    if len(s) > 1 and _ev(s):
        return s[:-1]
    return s


def _r22(s: str) -> str:
    if any(s.endswith(x) for x in EL_R22_5):
        return s[:-5]
    if any(s.endswith(x) for x in EL_R22_4):
        return s[:-4]
    return s


def greek_stem(s: str) -> str:
    if len(s) < 4:
        return s
    orig_len = len(s)
    s = _r0(s)
    s = _strip_addback(s, *EL_R1, min_len=4)
    s = _strip_addback(s, *EL_R2, min_len=4, invert=True)
    s = _strip_addback(s, *EL_R3, min_len=5, invert=True)
    s = _r4(s)
    s = _r5(s)
    s = _r6(s)
    s = _r7(s)
    s = _r8(s)
    s = _r9(s)
    s = _r10(s)
    s = _r11(s)
    s = _r12(s)
    s = _r13(s)
    s = _r14(s)
    s = _r15(s)
    s = _r16(s)
    s = _r17(s)
    s = _r18(s)
    s = _r19(s)
    s = _r20(s)
    if len(s) == orig_len:
        s = _r21(s)
    return _r22(s)


class GreekAnalyzer(_RomanceAnalyzer):
    """greek lowercase fold → stop (folded list) → Ntais stem."""
    name = "greek"
    stop_words = GREEK_STOP_WORDS
    elide = staticmethod(greek_lowercase)

    def _stem(self, tok: str) -> str:
        return greek_stem(tok)
