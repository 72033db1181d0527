"""KStem (Krovetz 1993) — dictionary-validated English stemmer.

Ground truth: the reference's live test vector
(TestKStemFilterFactory.kt:23-30 "bricks"->"brick"), the shipped
exception / direct-conflation / country-nationality tables (exact
input->output pairs, KStemmer.kt:786-1299), and single-lookup rule
derivations whose dictionary membership is the shipped KStemData
(see each case's comment). TestKStemmer.kt's own bulk vocabulary test
is @Ignore'd in the reference; these tables ARE the shipped truth."""

import gzip
from pathlib import Path

import pytest

from lucene_kmp_ray.analysis.kstem import KStemAnalyzer, KStemmer, kstem

DATA = Path("lucene_kmp_ray/analysis/data/kstem.txt.gz")


def _entries():
    out = []
    for line in gzip.decompress(DATA.read_bytes()).decode().splitlines():
        out.append(line.split())
    return out


def test_reference_live_vector():
    # TestKStemFilterFactory.kt:23-30
    assert kstem("bricks") == "brick"


def test_exception_words_map_to_themselves():
    # KStemmer.kt:786-828 — DictEntry(word, exception=true)
    for parts in _entries():
        if parts[0] == "E":
            assert kstem(parts[1]) == parts[1]


def test_conflation_tables_exact():
    # directConflations + countryNationality (KStemmer.kt:1105-1299):
    # a dict hit with a root returns the root verbatim
    n = 0
    for parts in _entries():
        if parts[0] == "C":
            assert kstem(parts[1]) == parts[2], parts
            n += 1
    assert n == 189  # 40 direct + 149 nationality pairs


def test_head_words_are_identity():
    # dict hit with null root -> unchanged (KStemmer.kt:717-724)
    for parts in _entries():
        if parts[0] == "D":
            assert kstem(parts[1]) == parts[1]


def test_plural_rules():
    # -ies -> -y when the y-form is a head word (KStemmer.kt:92-99):
    # 'studie' absent, 'study' in KStemData
    assert kstem("studies") == "study"
    # plain -s strip to a head word (KStemmer.kt:117-121)
    assert kstem("computers") == "computer"
    assert kstem("windows") == "window"
    # -es: try the -e form first, then the bare stem (KStemmer.kt:100-115)
    assert kstem("boxes") == "box"
    assert kstem("churches") == "church"
    # -s plural resolving to an exception entry: root returned
    assert kstem("aides") == "aide"
    assert kstem("steppes") == "steppe"
    # '-ous' and "...ss" words are never stripped (KStemmer.kt:117)
    assert kstem("famous") == "famous"
    assert kstem("glass") == "glass"


def test_suffix_rules_single_lookup():
    # each resolves at the rule's first dictionary probe; membership of
    # the probed form is the shipped KStemData (asserted here too)
    words = {p[1] for p in _entries()}
    assert "nationalle" not in words and "national" in words
    assert kstem("nationally") == "national"       # lyEndings
    assert "divisional" not in words and "division" in words
    assert kstem("divisional") == "division"       # alEndings
    assert "amazement" not in words and "amaze" in words
    assert kstem("amazement") == "amaze"           # mentEndings


def test_length_and_alpha_gates():
    # k <= 1 or k >= 49 -> unchanged (KStemmer.kt:712-715)
    assert kstem("go") == "go"
    assert kstem("ab") == "ab"
    long = "a" * 60
    assert kstem(long) == long
    # any non a-z char -> unchanged (KStemmer.kt:728-731)
    assert kstem("2024") == "2024"
    assert kstem("spark2") == "spark2"
    assert kstem("années") == "années"
    assert kstem("") == ""


def test_corpus_vocab_identity():
    # the bm25_kstem_top10 oracle (oracle.kstem_preamble) relies on this:
    # every synthetic-corpus vocabulary word is a head word or rule-inert
    import duckdb
    con = duckdb.connect()
    rows = con.sql("""
    WITH toks AS (
      SELECT unnest(string_split(
        regexp_replace(text, '[^A-Za-z ]', ' ', 'g'), ' ')) AS t
      FROM '/root/testdata/sf0.001/documents.parquet')
    SELECT DISTINCT lower(t) FROM toks WHERE t <> ''
    """).fetchall()
    assert len(rows) >= 30
    for (w,) in rows:
        assert kstem(w) == w, w


def test_analyzer_chain():
    a = KStemAnalyzer()
    # possessive strip + stop removal + stem, EnglishAnalyzer chain shape
    assert a("the spark's window") == ["spark", "window"]
    assert a("Aging BRICKS") == ["age", "brick"]
    assert a("") == []


def test_analyze_flat_agrees_with_callable():
    a = KStemAnalyzer()
    texts = ["the spark's window", "aging bricks", "", "studies of boxes"]
    lengths, flat, doc_of, positions = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_of):
        per_doc[d].append(t)
    for i, text in enumerate(texts):
        assert per_doc[i] == a(text)
        assert lengths[i] == len(per_doc[i])


def test_stemmer_never_crashes_on_variants():
    s = KStemmer()
    for parts in _entries()[:2000]:
        w = parts[1]
        for v in (w + "s", w + "es", w + "ed", w + "ing", w + "ly",
                  w + "ness", w + "ity", w + "ment", w + "able",
                  w + "ization", w + "ion"):
            r = s.stem(v)
            assert isinstance(r, str) and r


@pytest.mark.parametrize("seed", range(3))
def test_random_strings_no_crash(seed):
    # TestKStemmer.kt testRandomStrings role
    import random
    rng = random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz'sé-"
    for _ in range(500):
        w = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 20)))
        r = kstem(w)
        assert isinstance(r, str)
