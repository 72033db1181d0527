"""VietnameseAnalyzer conformance: vectors from
TestVietnameseAnalyzer.kt plus generated-SQL parity fuzz of the
URL-aware bigram-merging tokenizer."""

import random

from lucene_kmp_ray.analysis.vietnamese import (VietnameseAnalyzer,
                                                vietnamese_tokenize)


def test_reference_vectors():
    a = VietnameseAnalyzer()
    assert vietnamese_tokenize("công nghệ thông tin Việt Nam") == [
        "công nghệ", "thông tin", "việt nam"]
    assert a("công nghệ thông tin Việt Nam") == [
        "cong nghe", "thong tin", "viet nam"]
    assert a("Công nghệ thông tin Việt Nam https://duydo.me") == [
        "cong nghe", "thong tin", "viet nam", "https", "duydo", "me"]
    assert a("điện thoại Việt") == ["dien thoai", "viet"]


def test_merge_rules():
    # punctuation between words blocks the merge
    assert vietnamese_tokenize("a, b c") == ["a", "b c"]
    # greedy non-overlapping pairing
    assert vietnamese_tokenize("a b c") == ["a b", "c"]
    assert vietnamese_tokenize("a b c d") == ["a b", "c d"]


def test_sql_parity():
    import collections

    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(141)
    a = VietnameseAnalyzer()
    words = ["công", "nghệ", "việt", "bị", "các", "an",
             "the", "1a", "x"]
    texts = ["công nghệ thông tin Việt Nam",
             "Công nghệ https://duydo.me xong rồi", "a, b c"]
    for _ in range(400):
        parts = []
        for _ in range(random.randint(1, 8)):
            parts.append(random.choice(words))
            parts.append(random.choice([" ", "  ", ", ", ".", " . "]))
        texts.append("".join(parts))
    # run the oracle pipeline over a tiny synthetic corpus view
    sql = oracle.vietnamese_token_counts()
    con = duckdb.connect()
    con.execute("CREATE TABLE vitexts (t VARCHAR)")
    con.executemany("INSERT INTO vitexts VALUES (?)",
                    [(t,) for t in texts])
    con.execute("""CREATE VIEW documents AS
        SELECT row_number() OVER () - 1 AS doc_id,
               'u' AS source, t AS text, 'vi' AS lang
        FROM vitexts""")
    got = dict(con.execute(sql).fetchall())
    exp: collections.Counter = collections.Counter()
    for t in texts:
        exp.update(a(t))
    assert got == dict(exp)
