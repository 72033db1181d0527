"""Core analyzer conformance (Keyword/Whitespace/Simple/Stop/Limit).

Semantics per reference ``analysis/core`` + ``TestKeywordAnalyzer`` /
``TestStopAnalyzer`` / ``TestWhitespaceAnalyzer`` /
``TestLimitTokenCountAnalyzer`` shapes.
"""

import numpy as np

from lucene_kmp_ray.analysis.core import (ENGLISH_STOP_WORDS_SET,
                                          KeywordAnalyzer,
                                          LimitTokenCountAnalyzer,
                                          SimpleAnalyzer, StopAnalyzer,
                                          UnicodeWhitespaceAnalyzer,
                                          WhitespaceAnalyzer)


def test_whitespace():
    a = WhitespaceAnalyzer()
    assert a("Foo Bar  baz\tqux") == ["Foo", "Bar", "baz", "qux"]
    # Character.isWhitespace excludes NBSP — it stays inside a token
    assert a("a b c") == ["a b", "c"]
    assert a("") == []


def test_unicode_whitespace():
    a = UnicodeWhitespaceAnalyzer()
    assert a("a b c") == ["a", "b", "c"]


def test_simple():
    a = SimpleAnalyzer()
    assert a("Foo123Bar, baz!") == ["foo", "bar", "baz"]
    assert a("don't") == ["don", "t"]


def test_stop():
    a = StopAnalyzer()
    assert a("The quick AND the dead") == ["quick", "dead"]
    assert "the" in ENGLISH_STOP_WORDS_SET
    b = StopAnalyzer(stop_words={"quick"})
    assert b("The quick dead") == ["the", "dead"]


def test_keyword():
    a = KeywordAnalyzer()
    assert a("Foo Bar") == ["Foo Bar"]
    assert a("") == []


def test_limit_token_count():
    a = LimitTokenCountAnalyzer(WhitespaceAnalyzer(), 2)
    assert a("1 2 3 4 5") == ["1", "2"]


def test_255_chunking():
    a = WhitespaceAnalyzer()
    long = "x" * 600
    toks = a(long + " y")
    assert toks == ["x" * 255, "x" * 255, "x" * 90, "y"]


def test_stop_positions_keep_gaps():
    a = StopAnalyzer()
    lengths, flat, doc_of, pos = a.analyze_flat(["the quick the dead"])
    assert flat.to_pylist() == ["quick", "dead"]
    assert list(pos) == [1, 3]  # gaps where stop words sat


def test_analyze_flat_agrees_with_call():
    texts = ["Foo Bar  baz", "", "The quick AND the dead",
             "x" * 300 + " tail"]
    for a in (WhitespaceAnalyzer(), UnicodeWhitespaceAnalyzer(),
              SimpleAnalyzer(), StopAnalyzer(), KeywordAnalyzer(),
              LimitTokenCountAnalyzer(SimpleAnalyzer(), 3)):
        lengths, flat, doc_of, _pos = a.analyze_flat(texts)
        toks = flat.to_pylist()
        per_doc = [[] for _ in texts]
        for t, d in zip(toks, doc_of):
            per_doc[d].append(t)
        want = [a(t) for t in texts]
        assert per_doc == want, type(a).__name__
        assert list(lengths) == [len(x) for x in want]


def test_index_roundtrip(tmp_path, ray_session):
    """A WhitespaceAnalyzer index built through the real builder."""
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery

    docs = [{"doc_id": i, "url": f"u{i}", "text": t}
            for i, t in enumerate(["Foo bar", "bar Baz", "foo foo"])]
    ds = rd.from_items(docs)
    idx = str(tmp_path / "idx")
    build_index(ds, idx, segment_size=10, analyzer=WhitespaceAnalyzer())
    s = Searcher(IndexReader(idx))
    assert s.search(TermQuery("bar"), k=5).total_hits == 2
    # case NOT folded by the whitespace analyzer
    assert s.search(TermQuery("Foo"), k=5).total_hits == 1
    assert s.search(TermQuery("foo"), k=5).total_hits == 1
