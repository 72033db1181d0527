"""CombinedFieldQuery (BM25F) + BlendedTermQuery conformance
(ref: search/CombinedFieldQuery.kt, search/BlendedTermQuery.kt,
TestBlendedTermQuery.kt:60-91 testBlendedScores)."""

import numpy as np
import pytest
import ray.data as rd

from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BlendedTermQuery, CombinedFieldQuery,
                                   Searcher, TermQuery)


@pytest.fixture(scope="module")
def mini_index(ray_session, tmp_path_factory):
    """TestBlendedTermQuery fixture: 1 doc with 'a', 10 docs with 'b'."""
    rows = [{"doc_id": 0, "url": "u0", "text": "a", "title": "a"}]
    rows += [{"doc_id": i, "url": f"u{i}", "text": "b", "title": "b"}
             for i in range(1, 11)]
    idx = str(tmp_path_factory.mktemp("blend") / "idx")
    build_index(rd.from_items(rows), idx, segment_size=100,
                fields=("text", "title"))
    return idx


def test_blended_scores_equal(mini_index):
    # TestBlendedTermQuery.kt:60-91: with blended stats (df = max over
    # terms) and tie breaker 0, the rare 'a' doc and the common 'b'
    # docs all score IDENTICALLY
    s = Searcher(IndexReader(mini_index))
    q = BlendedTermQuery((("a", "text", 1.0), ("b", "text", 1.0)),
                         tie_breaker=0.0)
    td = s.search(q, k=20)
    assert td.total_hits == 11
    scores = [h.score for h in td.score_docs]
    assert all(sc == scores[0] for sc in scores)


def test_blended_vs_plain_term(mini_index):
    # without blending, the rare term out-scores the common one
    s = Searcher(IndexReader(mini_index))
    rare = s.search(TermQuery("a"), k=1).score_docs[0].score
    common = s.search(TermQuery("b"), k=1).score_docs[0].score
    assert rare > common


def test_blended_boolean_rewrite_sums(mini_index):
    s = Searcher(IndexReader(mini_index))
    q_max = BlendedTermQuery((("a", "text", 1.0), ("a", "title", 1.0)),
                             tie_breaker=0.0)
    q_sum = BlendedTermQuery((("a", "text", 1.0), ("a", "title", 1.0)),
                             boolean_rewrite=True)
    mx = s.search(q_max, k=1).score_docs[0].score
    sm = s.search(q_sum, k=1).score_docs[0].score
    assert sm > mx  # sum of two positive parts beats their max


def test_combined_field_matches_union(built_index):
    # BM25F matches every doc containing the term in ANY weighted field
    s = Searcher(IndexReader(built_index))
    q = CombinedFieldQuery(("spark",), (("text", 1.0), ("title", 2.0)))
    td = s.search(q, k=10_000)
    t_text = s.search(TermQuery("spark", "text"), k=10_000)
    t_title = s.search(TermQuery("spark", "title"), k=10_000)
    union = {h.doc_id for h in t_text.score_docs} | \
        {h.doc_id for h in t_title.score_docs}
    assert {h.doc_id for h in td.score_docs} == union


def test_combined_field_weight_validation():
    with pytest.raises(ValueError, match="greater or equal to 1"):
        CombinedFieldQuery(("a",), (("text", 0.5),))


def test_combined_field_equal_weights_symmetric(mini_index):
    # doc 0 has 'a' in both fields with w=1 each: freq = 2, norm =
    # encode(dl_text + dl_title) — scoring must run through the pseudo
    # stats, producing one deterministic positive score
    s = Searcher(IndexReader(mini_index))
    q = CombinedFieldQuery(("a",), (("text", 1.0), ("title", 1.0)))
    td = s.search(q, k=5)
    assert td.total_hits == 1 and td.score_docs[0].doc_id == 0
    assert td.score_docs[0].score > 0


def test_combined_field_single_field_reduces_to_term(built_index):
    # with ONE field at weight 1 the pseudo stats equal the field stats,
    # so BM25F degenerates to the plain TermQuery ranking
    s = Searcher(IndexReader(built_index))
    q = CombinedFieldQuery(("spark",), (("text", 1.0),))
    a = s.search(q, k=10)
    b = s.search(TermQuery("spark", "text"), k=10)
    assert [h.doc_id for h in a.score_docs] == \
        [h.doc_id for h in b.score_docs]
    np.testing.assert_allclose([h.score for h in a.score_docs],
                               [h.score for h in b.score_docs], rtol=1e-6)
