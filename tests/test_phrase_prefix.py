"""Phrase-prefix via MultiPhraseQuery — reference vectors.

ref: core/src/commonTest/.../search/TestPhrasePrefixQuery.kt
(testPhrasePrefix: blueberry pi* matches pie+pizza, strawberry pi*
matches nothing) over the MultiTerms prefix walk + MultiPhraseQuery.
"""
import pyarrow as pa


def _index(tmp_path):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    texts = ["blueberry pie", "blueberry strudel", "blueberry pizza",
             "blueberry chewing gum", "piccadilly circus"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "pp")
    build_index(ds, idx, segment_size=2)
    return idx


def test_phrase_prefix(ray_session, tmp_path):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import MultiPhraseQuery
    from lucene_kmp_ray.search.searcher import Searcher

    s = Searcher(IndexReader(_index(tmp_path)))
    # the TermsEnum walk of the test gives piccadilly, pie, pizza
    expanded = s.expand_prefix("pi")
    assert expanded == ("piccadilly", "pie", "pizza")

    q1 = MultiPhraseQuery(slots=(("blueberry",), expanded))
    hits = s.search(q1, k=1000).score_docs
    assert sorted(h.doc_id for h in hits) == [0, 2]  # pie, pizza

    q2 = MultiPhraseQuery(slots=(("strawberry",), expanded))
    assert s.search(q2, k=1000).score_docs == []


def test_expand_prefix_max_and_union(ray_session, tmp_path):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search.searcher import Searcher

    s = Searcher(IndexReader(_index(tmp_path)))
    # union across segments (segment_size=2 → 3 segments), sorted
    assert s.expand_prefix("b") == ("blueberry",)
    assert s.expand_prefix("pi", max_expansions=2) == ("piccadilly", "pie")
    assert s.expand_prefix("zz") == ()
