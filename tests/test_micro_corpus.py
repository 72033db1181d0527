"""Golden micro-corpus assertions ported from the reference's own tests.

Corpus = the 7 docs of ``TestSearch.kt:88-96``; assertion style from
``TestSearch.kt`` (hit counts, score-then-id order) and
``TestBooleanQuery.kt`` (MUST_NOT exclusion :190-224, FILTER behaves like
MUST for matching :404, FILTER does not affect score :497). Also exercises
F6's multi-segmentation equivalence: the same corpus built as 1 vs 3
segments returns identical per-doc scores.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BooleanQuery, Occur, PhraseQuery,
                                   Searcher, TermQuery)

DOCS = [
    "a b c d e",
    "a b c d e a b c d e",
    "a b c d e f g h i j",
    "a c e",
    "e c a",
    "a c e a c e",
    "a c e a b c",
]


def _build(tmp_path, name, seg_bounds):
    idx = str(tmp_path / name)
    manifests = []
    for seg, (lo, hi) in enumerate(seg_bounds):
        t = pa.table({
            "doc_id": pa.array(range(lo, hi), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(lo, hi)], pa.string()),
            "text": pa.array(DOCS[lo:hi], pa.string()),
        })
        manifests.append(build_and_write_segment(t, seg, idx))
    commit_index(idx, manifests)
    return Searcher(IndexReader(idx))


@pytest.fixture(scope="module")
def micro(tmp_path_factory):
    base = tmp_path_factory.mktemp("micro")
    return _build(base, "one", [(0, 7)])


def test_term_hit_counts(micro):
    # TestSearch.kt buildQueries: every doc contains 'a' except doc 4? no —
    # all 7 contain 'a'; only doc 2 contains 'f'
    assert micro.search(TermQuery("a"), k=10).total_hits == 7
    assert micro.search(TermQuery("f"), k=10).total_hits == 1
    assert micro.search(TermQuery("f"), k=10).score_docs[0].doc_id == 2
    assert micro.search(TermQuery("z"), k=10).total_hits == 0


def test_must_must(micro):
    q = BooleanQuery.build((Occur.MUST, TermQuery("b")),
                           (Occur.MUST, TermQuery("e")))
    td = micro.search(q, k=10)
    # docs containing both b and e: 0, 1, 2, 6? doc6="a c e a b c" has b,e ✓
    assert sorted(h.doc_id for h in td.score_docs) == [0, 1, 2, 6]


def test_must_not_exclusion(micro):
    q = BooleanQuery.build((Occur.MUST, TermQuery("a")),
                           (Occur.MUST_NOT, TermQuery("b")))
    td = micro.search(q, k=10)
    assert sorted(h.doc_id for h in td.score_docs) == [3, 4, 5]


def test_filter_behaves_like_must_for_matching(micro):
    # TestBooleanQuery.kt:404
    m = BooleanQuery.build((Occur.MUST, TermQuery("a")),
                           (Occur.MUST, TermQuery("f")))
    f = BooleanQuery.build((Occur.MUST, TermQuery("a")),
                           (Occur.FILTER, TermQuery("f")))
    assert {h.doc_id for h in micro.search(m, k=10).score_docs} == \
        {h.doc_id for h in micro.search(f, k=10).score_docs}


def test_filter_does_not_affect_score(micro):
    # TestBooleanQuery.kt:497
    plain = micro.search(TermQuery("a"), k=10)
    filt = micro.search(BooleanQuery.build(
        (Occur.MUST, TermQuery("a")),
        (Occur.FILTER, TermQuery("e"))), k=10)
    plain_scores = {h.doc_id: h.score for h in plain.score_docs}
    for h in filt.score_docs:
        assert h.score == plain_scores[h.doc_id]


def test_phrase_hits_and_freq(micro):
    td = micro.search(PhraseQuery(("a", "b", "c")), k=10)
    assert sorted(h.doc_id for h in td.score_docs) == [0, 1, 2, 6]
    # doc 1 contains the phrase twice → highest tf; with equal dl? doc1 is
    # longer, so just assert the distributed phrase freq directly
    from lucene_kmp_ray.search.searcher import _exact_phrase
    sr = micro.reader.segment_readers[0]
    docs, freqs = _exact_phrase(sr, ["a", "b", "c"])
    assert dict(zip(docs.tolist(), freqs.tolist())) == {0: 1, 1: 2, 2: 1, 6: 1}
    # 'c a' consecutive: only doc4 "e c a"; doc5 "a c e a c e" has them
    # two apart, doc6 none
    td_ca = micro.search(PhraseQuery(("c", "a")), k=10)
    assert td_ca.total_hits == 1
    assert [h.doc_id for h in td_ca.score_docs] == [4]


def test_segmentation_invariance(tmp_path_factory, micro):
    base = tmp_path_factory.mktemp("micro3")
    s3 = _build(base, "three", [(0, 3), (3, 5), (5, 7)])
    for q in (TermQuery("a"), TermQuery("e"),
              BooleanQuery.build((Occur.SHOULD, TermQuery("b")),
                                 (Occur.SHOULD, TermQuery("f"))),
              PhraseQuery(("a", "b", "c"))):
        t1 = micro.search(q, k=10)
        t3 = s3.search(q, k=10)
        assert t1.total_hits == t3.total_hits
        assert {h.doc_id: h.score for h in t1.score_docs} == \
            {h.doc_id: h.score for h in t3.score_docs}


def test_scores_sorted_score_then_docid(micro):
    td = micro.search(TermQuery("a"), k=10)
    pairs = [(-h.score, h.doc_id) for h in td.score_docs]
    assert pairs == sorted(pairs)


def test_multi_phrase(micro):
    """MultiPhraseQuery: "a (b|c) c|e"-style slot alternatives over the
    TestSearch micro-corpus."""
    from lucene_kmp_ray.search import MultiPhraseQuery, PhraseQuery
    # slots: a, then (b or c): "a b" docs 0,1,2,6; "a c" docs 3,5,6
    q = MultiPhraseQuery((("a",), ("b", "c")))
    td = micro.search(q, k=10)
    assert sorted(h.doc_id for h in td.score_docs) == [0, 1, 2, 3, 5, 6]
    # freq adds alignments: doc6 "a c e a b c" has a-c@0 and a-b@3 → freq 2
    from lucene_kmp_ray.search.searcher import _exact_multi_phrase
    sr = micro.reader.segment_readers[0]
    docs, freqs = _exact_multi_phrase(sr, (("a",), ("b", "c")))
    assert dict(zip(docs.tolist(), freqs.tolist()))[6] == 2
    # single-alternative slots degrade to exact phrase matching
    d1, f1 = _exact_multi_phrase(sr, (("a",), ("b",), ("c",)))
    from lucene_kmp_ray.search.searcher import _exact_phrase
    d2, f2 = _exact_phrase(sr, ["a", "b", "c"])
    assert d1.tolist() == d2.tolist() and f1.tolist() == f2.tolist()
    # absent alternative is ignored; absent whole slot matches nothing
    d3, _ = _exact_multi_phrase(sr, (("a", "zzz"), ("b",), ("c",)))
    assert d3.tolist() == d2.tolist()
    d4, _ = _exact_multi_phrase(sr, (("zzz",), ("b",)))
    assert d4.tolist() == []
