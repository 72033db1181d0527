"""TamilAnalyzer conformance: TestTamilAnalyzer.kt vectors and SQL-mirror
parity for the snowball TamilStemmer port."""

import random
import re

import duckdb

from lucene_kmp_ray.analysis.tamil import TamilAnalyzer, tamil_stem


def test_basics_reference_vectors():
    a = TamilAnalyzer()
    # TestTamilAnalyzer.kt
    assert a("நண்பன்") == ["நண்"]
    assert a("நண்பர்கள்") == ["நண்"]
    assert a("௧௨௩௪") == ["1234"]   # DecimalDigitFilter
    assert a("FIFA") == ["fifa"]
    assert a("ஒரு") == []           # stopword


def test_short_words_keep_original():
    # stem() false below the 4-char gate → original token
    assert tamil_stem("கதை") == "கதை"
    assert tamil_stem("via") == "via"


def test_latin_tokens_are_identity():
    for w in ("merge", "spark", "window", "buildings"):
        assert tamil_stem(w) == w


def test_sql_mirror_parity_fuzz():
    from lucene_kmp_ray.analysis.tamil import (A5, A13, A14, A17, A20,
                                               A25, A26)
    from lucene_kmp_ray.oracle import _ta_stem_pipe

    rng = random.Random(11)
    bases = ["நண்பன்", "நண்பர்கள்", "கதை", "வீடு", "மரம்", "பள்ளி",
             "புத்தகம்", "அவர்", "எங்கு", "உயிர்", "தமிழ்", "கோயில்"]
    sufs = [s for s, _ in A5 + A13 + A14 + A17 + A20 + A25 + A26 if s] + \
        ["ும்", "ின்", "ை", "பி", "வி"]
    syll = list("கதபமவரலனடசாிு்ைேோ")
    words = set(bases)
    while len(words) < 150:
        base = "".join(rng.choice(syll) for _ in range(rng.randint(2, 5)))
        words.add(base + "".join(rng.choice(sufs)
                                 for _ in range(rng.randint(0, 2))))
    words = sorted(words)
    ctes, last = _ta_stem_pipe()
    vals = ",".join("'" + w.replace("'", "''") + "'" for w in words)
    sql = f"""
WITH rkept AS (SELECT 1 AS doc_id, t0 FROM
               (SELECT unnest([{vals}]) AS t0)),
uniq AS (SELECT DISTINCT t0, t0 AS w FROM rkept),
{ctes}
SELECT t0, stem FROM {last}
"""
    got = dict(duckdb.sql(sql).fetchall())
    mism = [(w, got.get(w), tamil_stem(w))
            for w in words if got.get(w) != tamil_stem(w)]
    assert not mism, mism[:10]
