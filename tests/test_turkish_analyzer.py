"""TurkishAnalyzer conformance: reference vectors from
TestTurkishAnalyzer.kt / TestTurkishLowerCaseFilter.kt and SQL-mirror
parity for the snowball TurkishStemmer port."""

import random
import re

import duckdb
import pytest

from lucene_kmp_ray.analysis.turkish import (TurkishAnalyzer, apostrophe,
                                             turkish_lower, turkish_stem)


def test_basics_reference_vectors():
    a = TurkishAnalyzer()
    # TestTurkishAnalyzer.testBasics
    assert a("ağacı") == ["ağaç"]
    assert a("ağaç") == ["ağaç"]
    assert a("dolayı") == []            # stopword
    assert a("Kıbrıs'ta") == ["kıbrıs"]  # apostrophe
    assert a("Van Gölü'ne") == ["van", "göl"]


def test_turkish_lowercase_filter_vectors():
    # TestTurkishLowerCaseFilter
    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("İZMİR") == "izmir"
    assert turkish_lower("ISPARTA") == "ısparta"
    # decomposed I + combining dot above
    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("İ") == "i"
    # other combining marks between I and the dot (testDecomposed2)
    assert turkish_lower("İ̖STANBUL") == \
        "i̖stanbul"
    assert turkish_lower("I̖SPARTA") == "ı̖sparta"


def test_apostrophe_filter():
    assert apostrophe("Kıbrıs'ta") == "Kıbrıs"
    assert apostrophe("a’b’c") == "a"
    assert apostrophe("plain") == "plain"


def test_stem_false_keeps_original():
    # fewer than two syllables → stem() false → original token
    assert turkish_stem("ev") == "ev"
    assert turkish_stem("spark") == "spark"
    # reserved words after stripping → original
    assert turkish_stem("adı") == "adı"
    assert turkish_stem("soyadı") == "soyadı"
    # lAr nominal-verb branch clears the continue flag → original
    assert turkish_stem("okurlar") == "okurlar"


def test_known_stems():
    assert turkish_stem("kitapları") == "kitap"
    assert turkish_stem("evlerinden") == "ev"
    assert turkish_stem("arabada") == "araba"
    assert turkish_stem("ağacı") == "ağaç"  # yU strip + c→ç devoice


@pytest.mark.slow
def test_sql_mirror_parity_fuzz():
    """oracle._tr_stem_ctes must reproduce turkish_stem exactly —
    including ki chains and harmony-gated suffixes — on a fuzzed set of
    suffix-stacked words."""
    from lucene_kmp_ray.oracle import _tr_stem_ctes

    rng = random.Random(7)
    alpha = "abdegiklmnorstuyzçğıöşü"
    sufs = ["lar", "ler", "ki", "da", "nda", "ları", "in", "ün", "dan",
            "sı", "ım", "dır", "mış", "dı", "sa", "casına", "la", "ca",
            "sın", "ız", "sınız", "m", "mız", "ya", "a", "ı", "ü", "ken"]
    words = {"evdekiler", "kapıdaki", "gemidekiler", "evindekilerin",
             "çocuklarımızın", "değildir", "anlayabileceğimiz"}
    while len(words) < 150:
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 6)))
        words.add(base + "".join(rng.choice(sufs)
                                 for _ in range(rng.randint(0, 3))))
    words = sorted(words)
    ctes = _tr_stem_ctes()
    last = re.findall(r"(trs\d+) AS MATERIALIZED", ctes)[-1]
    ctes = ctes[:ctes.index("rterms AS MATERIALIZED")]
    vals = ",".join(f"'{w}'" for w in words)
    sql = f"""
WITH rkept AS (SELECT 1 AS doc_id, t0 FROM
               (SELECT unnest([{vals}]) AS t0)),
{ctes}
dummy AS (SELECT 1)
SELECT t0, stem FROM {last}
"""
    got = dict(duckdb.sql(sql).fetchall())
    mismatches = [(w, got.get(w), turkish_stem(w))
                  for w in words if got.get(w) != turkish_stem(w)]
    assert not mismatches, mismatches[:10]
