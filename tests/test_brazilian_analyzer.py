"""BrazilianAnalyzer conformance: the full vector suite from the
reference's TestBrazilianAnalyzer.kt plus generated-SQL parity fuzz."""

import random

from lucene_kmp_ray.analysis.brazilian import (BR_STEP1, BR_STEP2,
                                               BrazilianAnalyzer,
                                               brazilian_stem)

VECTORS = [
    ("boa", "boa"),
    ("boainain", "boainain"),
    ("boas", "boas"),
    ("bôas", "boas"),
    ("boassu", "boassu"),
    ("boataria", "boat"),
    ("boate", "boat"),
    ("boates", "boat"),
    ("boatos", "boat"),
    ("bob", "bob"),
    ("boba", "bob"),
    ("bobagem", "bobag"),
    ("bobagens", "bobagens"),
    ("bobalhões", "bobalho"),
    ("bobear", "bob"),
    ("bobeira", "bobeir"),
    ("bobinho", "bobinh"),
    ("bobinhos", "bobinh"),
    ("bobo", "bob"),
    ("bobs", "bobs"),
    ("boca", "boc"),
    ("bocadas", "boc"),
    ("bocadinho", "bocadinh"),
    ("bocado", "boc"),
    ("bocaiúva", "bocaiuv"),
    ("boçal", "bocal"),
    ("bocarra", "bocarr"),
    ("bocas", "boc"),
    ("bode", "bod"),
    ("bodoque", "bodoqu"),
    ("body", "body"),
    ("boeing", "boeing"),
    ("boem", "boem"),
    ("boemia", "boem"),
    ("boêmio", "boemi"),
    ("bogotá", "bogot"),
    ("boi", "boi"),
    ("bóia", "boi"),
    ("boiando", "boi"),
    ("quiabo", "quiab"),
    ("quicaram", "quic"),
    ("quickly", "quickly"),
    ("quieto", "quiet"),
    ("quietos", "quiet"),
    ("quilate", "quilat"),
    ("quilates", "quilat"),
    ("quilinhos", "quilinh"),
    ("quilo", "quil"),
    ("quilombo", "quilomb"),
    ("quilométricas", "quilometr"),
    ("quilométricos", "quilometr"),
    ("quilômetro", "quilometr"),
    ("quilômetros", "quilometr"),
    ("quilos", "quil"),
    ("quimica", "quimic"),
    ("quilos", "quil"),
    ("quimica", "quimic"),
    ("quimicas", "quimic"),
    ("quimico", "quimic"),
    ("quimicos", "quimic"),
    ("quimioterapia", "quimioterap"),
    ("quimioterápicos", "quimioterap"),
    ("quimono", "quimon"),
    ("quincas", "quinc"),
    ("quinhão", "quinha"),
    ("quinhentos", "quinhent"),
    ("quinn", "quinn"),
    ("quino", "quin"),
    ("quinta", "quint"),
    ("quintal", "quintal"),
    ("quintana", "quintan"),
    ("quintanilha", "quintanilh"),
    ("quintão", "quinta"),
    ("quintessência", "quintessente"),
    ("quintino", "quintin"),
    ("quinto", "quint"),
    ("quintos", "quint"),
    ("quintuplicou", "quintuplic"),
    ("quinze", "quinz"),
    ("quinzena", "quinzen"),
    ("quiosque", "quiosqu"),
    ("Brasil", "brasil"),
    ("Brasília", "brasil"),
    ("quimio5terápicos", "quimio5terapicos"),
    ("áá", "áá"),
    ("ááá", "aaa"),
]


def _full(w):
    s = brazilian_stem(w)
    return w if s is None or s == w else s


def test_reference_vectors():
    for w, exp in VECTORS:
        assert _full(w.lower()) == exp, w


def test_non_indexable_kept():
    assert _full("ab") == "ab"            # too short
    assert _full("x" * 30) == "x" * 30    # too long
    assert brazilian_stem("ab1cd") == "ab1cd"   # non-letters: folded form


def test_analyzer_chain():
    a = BrazilianAnalyzer()
    assert a("uma boataria") == ["boat"]   # 'uma' is a stop word


def test_sql_stemmer_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(51)
    alphabet = "aeioubcdfglmnpqrstvz"
    sfx = ([s for s, _, _, _, _ in BR_STEP1] + list(BR_STEP2) +
           ["e", "gue", "cie", "os", "a", "i", "o", "ci", "", ""])
    words = [w.lower() for w, _ in VECTORS]
    for _ in range(500):
        base = "".join(random.choice(alphabet)
                       for _ in range(random.randint(0, 8)))
        words.append(base + random.choice(sfx))
    words = sorted(set(w for w in words if w))
    sql = f"""
WITH rkept AS (SELECT row_number() OVER () AS doc_id, t0
               FROM (SELECT unnest(?) AS t0)),
{oracle._br_stem_ctes()}
SELECT term FROM rterms ORDER BY doc_id
"""
    got = [r[0] for r in duckdb.connect().execute(
        sql.format(oracle=oracle), [words]).fetchall()]
    exp = [w if brazilian_stem(w) is None else brazilian_stem(w)
           for w in words]
    assert got == exp
