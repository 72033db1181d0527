"""ICU-style folding + Double Metaphone conformance.

The reference's icu/phonetic modules are unported placeholders; these
validate against the public specifications instead: commons-codec's
published Double Metaphone vectors and the strip_accents+lower SQL
equivalence the icu_fold oracle relies on."""

import duckdb
import pytest

from lucene_kmp_ray.analysis.foldphon import (
    ICUFoldingAnalyzer,
    PhoneticAnalyzer,
    double_metaphone,
    icu_fold,
)

# commons-codec DoubleMetaphoneTest vectors
DM_VECTORS = {
    "smith": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
    "snider": ("SNTR", "XNTR"), "fisher": ("FXR", "FXR"),
    "school": ("SKL", "SKL"), "thomas": ("TMS", "TMS"),
    "lewis": ("LS", "LS"), "jose": ("HS", "HS"),
    "cambrillo": ("KMPR", "KMPR"), "otto": ("AT", "AT"),
    "aegir": ("AJR", "AKR"), "lincoln": ("LNKL", "LNKL"),
    "ghiradelli": ("JRTL", "JRTL"), "ghislane": ("JLN", "JLN"),
    "wachtler": ("AKTL", "FKTL"), "wechsler": ("AKSL", "FKSL"),
    "tichner": ("TXNR", "TKNR"), "xavier": ("SF", "SFR"),
    "jumped": ("JMPT", "AMPT"), "gough": ("KF", "KF"),
    "dumb": ("TM", "TM"), "campbell": ("KMPL", "KMPL"),
    "maurice": ("MRS", "MRS"), "aubrey": ("APR", "APR"),
    "dougal": ("TKL", "TKL"), "edgar": ("ATKR", "ATKR"),
    "michael": ("MKL", "MXL"), "knox": ("NKS", "NKS"),
}


@pytest.mark.parametrize("word", sorted(DM_VECTORS))
def test_double_metaphone_vectors(word):
    assert double_metaphone(word) == DM_VECTORS[word]


def test_metaphone_edge_cases():
    assert double_metaphone("") == ("", "")
    assert double_metaphone("a") == ("A", "A")
    assert double_metaphone("1234") == ("", "")


def test_phonetic_analyzer_injects():
    a = PhoneticAnalyzer()
    out = a("smith school")
    assert out == ["smith", "SM0", "XMT", "school", "SKL"]


def test_icu_fold_basics():
    assert icu_fold("Café") == "cafe"
    assert icu_fold("Ⅻ") == "xii"        # compat decomposition
    assert icu_fold("ＦＵＬＬ") == "full"  # width fold
    assert icu_fold("STRASSE") == "strasse"
    assert icu_fold("straße") == "strasse"  # casefold ß -> ss


def test_icu_analyzer():
    a = ICUFoldingAnalyzer()
    assert a("Ångström Café") == ["angstrom", "cafe"]


def test_fold_matches_sql_strip_accents():
    from __ray_entry__ import ICU_FOLD_WORDS
    con = duckdb.connect()
    for w in ICU_FOLD_WORDS + [x.upper() for x in ICU_FOLD_WORDS]:
        (sql,) = con.execute("SELECT strip_accents(lower(?))",
                             [w]).fetchone()
        assert sql == icu_fold(w), w
