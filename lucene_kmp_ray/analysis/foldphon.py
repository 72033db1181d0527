"""ICU-style folding and phonetic (Double Metaphone) filters.

The reference's ``analysis/icu`` and ``analysis/phonetic`` modules are
unported placeholders (empty ``build.gradle.kts`` stubs), so these
implement the ROLE from the public specifications:

- ``icu_fold``: the ICUFoldingFilter contract (UTR #30 foldings as
  Lucene applies them): compatibility decomposition, diacritic removal,
  case folding, then composition — implemented with unicodedata
  (NFKD -> strip Mn marks -> casefold -> NFKC). This covers the
  accent/width/case foldings the filter is used for; exotic UTR30
  single-char foldings beyond NFKC_CaseFold are out of scope and
  documented here.
- ``double_metaphone``: Lawrence Philips' Double Metaphone (2000), the
  algorithm behind Lucene's phonetic module default encoder
  (commons-codec DoubleMetaphone). Returns (primary, alternate) codes,
  4 chars max by default. Validated against commons-codec's published
  vectors in tests/test_foldphon.py.
- ``PhoneticAnalyzer``: PhoneticFilter semantics with inject=true —
  each token is followed by its phonetic code(s) at the same position.
"""

from __future__ import annotations

import unicodedata

VOWELS = "AEIOUY"


def icu_fold(text: str) -> str:
    d = unicodedata.normalize("NFKD", text)
    stripped = "".join(c for c in d if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFKC", stripped.casefold())


class ICUFoldingAnalyzer:
    """StandardTokenizer -> ICU folding per token."""

    name = "icu_folding"

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        return [f for f in (icu_fold(t) for t in tokenize(text)) if f]


def _sw(s: str, i: int, *prefixes: str) -> bool:
    return any(s.startswith(p, i) for p in prefixes)


def double_metaphone(word: str, max_len: int = 4) -> tuple[str, str]:
    """Double Metaphone (Philips 2000). Returns (primary, alternate)."""
    w = "".join(c for c in unicodedata.normalize("NFKD", word.upper())
                if "A" <= c <= "Z" or c in "ÇÑ")
    n = len(w)
    if n == 0:
        return "", ""
    pad = w + "     "
    pri: list[str] = []
    alt: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        alt.append(p if a is None else a)

    slavo_germanic = any(x in w for x in ("W", "K", "CZ", "WITZ"))
    i = 0
    # skip silent letters at start
    if _sw(w, 0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    if w[0] == "X":  # initial X -> S (as in Xavier)
        add("S")
        i = 1

    while i < n and (len(pri) < max_len or len(alt) < max_len):
        c = w[i]
        if c in "AEIOUY":
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if pad[i + 1] == "B" else 1
            continue
        if c == "Ç":
            add("S")
            i += 1
            continue
        if c == "C":
            # various germanic
            if (i > 1 and pad[i - 2] not in VOWELS
                    and _sw(w, i - 1, "ACH")
                    and pad[i + 2] != "I"
                    and (pad[i + 2] != "E"
                         or _sw(w, i - 2, "BACHER", "MACHER"))):
                add("K")
                i += 2
                continue
            if i == 0 and _sw(w, i, "CAESAR"):
                add("S")
                i += 2
                continue
            if _sw(w, i, "CHIA"):  # italian
                add("K")
                i += 2
                continue
            if _sw(w, i, "CH"):
                if i > 0 and _sw(w, i, "CHAE"):  # michael
                    add("K", "X")
                    i += 2
                    continue
                if (i == 0
                        and (_sw(w, i + 1, "HARAC", "HARIS")
                             or _sw(w, i + 1, "HOR", "HYM", "HIA", "HEM"))
                        and not _sw(w, 0, "CHORE")):
                    add("K")  # greek roots
                    i += 2
                    continue
                if ((_sw(w, 0, "VAN ", "VON ") or _sw(w, 0, "SCH"))
                        or _sw(w, i - 2, "ORCHES", "ARCHIT", "ORCHID")
                        or pad[i + 2] in ("T", "S")
                        or ((i == 0 or pad[i - 1] in "AOUE")
                            and pad[i + 2] in "LRNMBHFVW ")):
                    add("K")
                else:
                    if i > 0:
                        if _sw(w, 0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if _sw(w, i, "CZ") and not _sw(w, i - 2, "WICZ"):
                add("S", "X")
                i += 2
                continue
            if _sw(w, i + 1, "CIA"):
                add("X")
                i += 3
                continue
            if _sw(w, i, "CC") and not (i == 1 and w[0] == "M"):
                if pad[i + 2] in "IEH" and not _sw(w, i + 2, "HU"):
                    if ((i == 1 and pad[i - 1] == "A")
                            or _sw(w, i - 1, "UCCEE", "UCCES")):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if _sw(w, i, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if _sw(w, i, "CI", "CE", "CY"):
                if _sw(w, i, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _sw(w, i + 1, " C", " Q", " G"):
                i += 3
            elif pad[i + 1] in "CKQ" and not _sw(w, i + 1, "CE", "CI"):
                i += 2
            else:
                i += 1
            continue
        if c == "D":
            if _sw(w, i, "DG"):
                if pad[i + 2] in "IEY":
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if _sw(w, i, "DT", "DD") else 1
            continue
        if c == "F":
            add("F")
            i += 2 if pad[i + 1] == "F" else 1
            continue
        if c == "G":
            if pad[i + 1] == "H":
                if i > 0 and pad[i - 1] not in VOWELS:
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if pad[i + 2] == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                if ((i > 1 and pad[i - 2] in "BHD")
                        or (i > 2 and pad[i - 3] in "BHD")
                        or (i > 3 and pad[i - 4] in "BH")):
                    i += 2
                    continue
                if i > 2 and pad[i - 1] == "U" and pad[i - 3] in "CGLRT":
                    add("F")  # laugher, cough...
                elif i > 0 and pad[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if pad[i + 1] == "N":
                if i == 1 and w[0] in VOWELS and not slavo_germanic:
                    add("KN", "N")
                elif not _sw(w, i + 2, "EY") and pad[i + 1] != "Y" \
                        and not slavo_germanic:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if _sw(w, i + 1, "LI") and not slavo_germanic:
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (pad[i + 1] == "Y"
                           or _sw(w, i + 1, "ES", "EP", "EB", "EL", "EY",
                                  "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
                continue
            if ((_sw(w, i + 1, "ER") or pad[i + 1] == "Y")
                    and not _sw(w, 0, "DANGER", "RANGER", "MANGER")
                    and pad[i - 1] not in "EI"
                    and not _sw(w, i - 1, "RGY", "OGY")):
                add("K", "J")
                i += 2
                continue
            if pad[i + 1] in "EIY" or _sw(w, i - 1, "AGGI", "OGGI"):
                if _sw(w, 0, "VAN ", "VON ") or _sw(w, 0, "SCH") \
                        or _sw(w, i + 1, "ET"):
                    add("K")
                elif _sw(w, i + 1, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if pad[i + 1] == "G" else 1
            continue
        if c == "H":
            if (i == 0 or pad[i - 1] in VOWELS) and pad[i + 1] in VOWELS:
                add("H")
                i += 2
            else:
                i += 1
            continue
        if c == "J":
            if _sw(w, i, "JOSE") or _sw(w, 0, "SAN "):
                if (i == 0 and pad[i + 4] == " ") or _sw(w, 0, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and not _sw(w, i, "JOSE"):
                add("J", "A")
            elif (pad[i - 1] in VOWELS and not slavo_germanic
                    and pad[i + 1] in "AO"):
                add("J", "H")
            elif i == n - 1:
                add("J", " ")
            elif pad[i + 1] not in "LTKSNMBZ" and pad[i - 1] not in "SKL":
                add("J")
            i += 2 if pad[i + 1] == "J" else 1
            continue
        if c == "K":
            add("K")
            i += 2 if pad[i + 1] == "K" else 1
            continue
        if c == "L":
            if pad[i + 1] == "L":
                # spanish 'll' endings
                if ((i == n - 3 and _sw(w, i - 1, "ILLO", "ILLA", "ALLE"))
                        or ((_sw(w, n - 2, "AS", "OS")
                             or pad[n - 1] in "AO")
                            and _sw(w, i - 1, "ALLE"))):
                    add("L", " ")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue
        if c == "M":
            add("M")
            if (_sw(w, i - 1, "UMB")
                    and (i + 1 == n - 1 or _sw(w, i + 2, "ER"))) \
                    or pad[i + 1] == "M":
                i += 2
            else:
                i += 1
            continue
        if c == "N":
            add("N")
            i += 2 if pad[i + 1] == "N" else 1
            continue
        if c == "Ñ":
            add("N")
            i += 1
            continue
        if c == "P":
            if pad[i + 1] == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if pad[i + 1] in "PB" else 1
            continue
        if c == "Q":
            add("K")
            i += 2 if pad[i + 1] == "Q" else 1
            continue
        if c == "R":
            if (i == n - 1 and not slavo_germanic
                    and _sw(w, i - 2, "IER")
                    and not _sw(w, i - 4, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            i += 2 if pad[i + 1] == "R" else 1
            continue
        if c == "S":
            if _sw(w, i - 1, "ISL", "YSL"):  # silent: island
                i += 1
                continue
            if i == 0 and _sw(w, i, "SUGAR"):
                add("X", "S")
                i += 1
                continue
            if _sw(w, i, "SH"):
                if _sw(w, i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            if _sw(w, i, "SIO", "SIA") or _sw(w, i, "SIAN"):
                if slavo_germanic:
                    add("S")
                else:
                    add("S", "X")
                i += 3
                continue
            if (i == 0 and pad[i + 1] in "MNLW") or pad[i + 1] == "Z":
                add("S", "X")
                i += 2 if pad[i + 1] == "Z" else 1
                continue
            if _sw(w, i, "SC"):
                if pad[i + 2] == "H":
                    if _sw(w, i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if _sw(w, i + 3, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and w[3] not in VOWELS and w[3] != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                    continue
                if pad[i + 2] in "IEY":
                    add("S")
                else:
                    add("SK")
                i += 3
                continue
            if i == n - 1 and _sw(w, i - 2, "AIS", "OIS"):
                add("", "S")  # french: louis
            else:
                add("S")
            i += 2 if pad[i + 1] in "SZ" else 1
            continue
        if c == "T":
            if _sw(w, i, "TION") or _sw(w, i, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if _sw(w, i, "TH") or _sw(w, i, "TTH"):
                if _sw(w, i + 2, "OM", "AM") or _sw(w, 0, "VAN ", "VON ") \
                        or _sw(w, 0, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if pad[i + 1] in "TD" else 1
            continue
        if c == "V":
            add("F")
            i += 2 if pad[i + 1] == "V" else 1
            continue
        if c == "W":
            if _sw(w, i, "WR"):
                add("R")
                i += 2
                continue
            if i == 0 and (pad[i + 1] in VOWELS or _sw(w, i, "WH")):
                if pad[i + 1] in VOWELS:
                    add("A", "F")
                else:
                    add("A")
            if (i == n - 1 and pad[i - 1] in VOWELS) \
                    or _sw(w, i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
                    or _sw(w, 0, "SCH"):
                add("", "F")
                i += 1
                continue
            if _sw(w, i, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if c == "X":
            if not (i == n - 1
                    and (_sw(w, i - 3, "IAU", "EAU")
                         or _sw(w, i - 2, "AU", "OU"))):
                add("KS")
            i += 2 if pad[i + 1] in "CX" else 1
            continue
        if c == "Z":
            if pad[i + 1] == "H":
                add("J")
                i += 2
                continue
            if _sw(w, i + 1, "ZO", "ZI", "ZA") \
                    or (slavo_germanic and i > 0 and pad[i - 1] != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if pad[i + 1] == "Z" else 1
            continue
        i += 1

    return ("".join(pri)[:max_len], "".join(alt)[:max_len])


class PhoneticAnalyzer:
    """StandardTokenizer -> lowercase token + injected Double Metaphone
    code(s) (PhoneticFilter inject=true semantics: original token kept,
    codes follow at the same position)."""

    name = "phonetic"

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out = []
        for t in tokenize(text):
            out.append(t)
            p, a = double_metaphone(t)
            if p:
                out.append(p)
            if a and a != p:
                out.append(a)
        return out
