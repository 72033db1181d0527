"""Danish / Norwegian / Swedish snowball chains.

Conformance vectors from the reference analyzer tests
(analysis/common/src/commonTest/.../da/TestDanishAnalyzer.kt,
sv/TestSwedishAnalyzer.kt, no/TestNorwegianAnalyzer.kt) plus
hand-traced snowball-algorithm cases, and a Python↔SQL parity sweep
that proves oracle._nordic_stem_ctes implements the same stemmer.
"""

import random

import duckdb
import pytest

from lucene_kmp_ray.analysis import nordic as nd
from lucene_kmp_ray.oracle import _nordic_stem_ctes


def test_danish_stem_vectors():
    # TestDanishAnalyzer.kt testBasics
    assert nd.danish_stem("undersøg") == "undersøg"
    assert nd.danish_stem("undersøgelse") == "undersøg"
    # snowball algorithm cases
    assert nd.danish_stem("følelse") == "føl"          # e + els
    assert nd.danish_stem("indtagelse") == "indtag"
    assert nd.danish_stem("kærlighed") == "kær"         # hed, then lig
    assert nd.danish_stem("venligst") == "ven"          # igst → ig, then lig
    assert nd.danish_stem("løst") == "løst"             # R1 empty at len 4? p1=3, 'løst' start 0 < 3
    assert nd.danish_stem("frisk") == "frisk"
    assert nd.danish_stem("friskt") == "frisk"          # consonant pair kt
    assert nd.danish_stem("sikkerhedens") == "sikker"   # hedens, then undouble? kk before R1 end


def test_danish_s_ending():
    # 's' deletes only after a valid s-ending (valid: ...k...)
    assert nd.danish_stem("hestens") == "hest"          # ens
    assert nd.danish_stem("bogs") == "bog"              # g is valid s-ending
    # 'i' is NOT a Danish s-ending: trailing s stays
    w = "skis"  # p1=3, suffix 's' at 3, prev 'i' invalid
    assert nd.danish_stem(w) == "skis"


def test_danish_undouble():
    # doubled consonant at R1 end loses one
    assert nd.danish_stem("bekendtgørelsessnitt")[-2:] != "tt"


def test_norwegian_stem_vectors():
    # TestNorwegianAnalyzer.kt testBasics uses havnedistriktene/havnedistrikt
    assert nd.norwegian_stem("havnedistriktene") == "havnedistrikt"
    assert nd.norwegian_stem("havnedistrikt") == "havnedistrikt"
    assert nd.norwegian_stem("hetene") == "het"         # ene lies in R1 (p1=3)
    assert nd.norwegian_stem("klarhetene") == "klar"    # hetene in R1
    assert nd.norwegian_stem("forskert") == "forsker"   # ert → er
    assert nd.norwegian_stem("tilhørighetslov") == "tilhørig"  # hetslov


def test_norwegian_s_rules():
    # s after valid s-ending deletes
    assert nd.norwegian_stem("hunds") == "hund"
    # s after k requires a NON-vowel before the k
    assert nd.norwegian_stem("boks") == "boks"          # o-k-s: vowel before k
    assert nd.norwegian_stem("fisks") == "fisk"         # s-k-s: consonant before k


def test_swedish_stem_vectors():
    # TestSwedishAnalyzer.kt testBasics
    assert nd.swedish_stem("jaktkarlarne") == "jaktkarl"
    assert nd.swedish_stem("jaktkarlens") == "jaktkarl"
    assert nd.swedish_stem("klokheten") == "klok"
    assert nd.swedish_stem("fullt") == "fullt"          # start < p1 → untouched
    assert nd.swedish_stem("sorgfullt") == "sorgfull"   # fullt → full in R1
    assert nd.swedish_stem("tryggt") == "trygg"         # consonant pair gt
    assert nd.swedish_stem("höst") == "höst"            # öst not in R1 (and h not ost-ending)


def test_chain_stop_and_stem():
    # stopwords removed, remainder stemmed, tokens lowercased
    a = nd.DanishAnalyzer()
    assert a("på undersøgelse og") == ["undersøg"]
    b = nd.SwedishAnalyzer()
    assert b("och jaktkarlarne") == ["jaktkarl"]
    c = nd.NorwegianAnalyzer()
    assert c("og havnedistriktene") == ["havnedistrikt"]


def test_analyze_flat_matches_scalar():
    texts = ["på undersøgelse og kærlighed venligst",
             "friskt hestens bogs skis", ""]
    a = nd.DanishAnalyzer()
    lengths, flat, doc_of, positions = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for tok, d in zip(flat.to_pylist(), doc_of):
        per_doc[d].append(tok)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(a(t)) for t in texts]


@pytest.mark.parametrize("lang,fn", [
    ("danish", nd.danish_stem),
    ("norwegian", nd.norwegian_stem),
    ("swedish", nd.swedish_stem),
])
def test_sql_mirror_parity(lang, fn):
    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyzæøåäö"
    roots = ["under", "hus", "kvind", "arbejd", "frisk", "jaktkarl",
             "havnedistrikt", "løs", "full", "trygg", "fisk", "venn",
             "öst", "köst", "sk", "b"]
    sufs = ["", "e", "et", "erendes", "heden", "s", "es", "ens", "ig",
            "lig", "els", "igst", "løst", "ert", "erte", "ene", "arne",
            "heterna", "fullt", "öst", "ast", "dt", "gt", "kt", "tt",
            "hetslov", "ks"]
    words = sorted({r + s for r in roots for s in sufs})
    words += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
              for _ in range(500)]
    con = duckdb.connect()
    con.execute("CREATE TABLE words(doc_id INTEGER, t0 VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?, ?)",
                    list(enumerate(words)))
    sql = ("WITH rkept AS (SELECT doc_id, t0 FROM words), "
           + _nordic_stem_ctes(lang)
           + " SELECT doc_id, term FROM rterms ORDER BY doc_id")
    for i, term in con.execute(sql).fetchall():
        assert term == fn(words[i]), (lang, words[i])
