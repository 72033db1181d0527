"""ParallelReader: field-union over same-doc indexes equals one
combined index (TestParallelLeafReader / TestParallelCompositeReader
scenarios — testQueries' field-by-field equality and the
incompatible-reader IllegalArgumentException)."""

import shutil

import numpy as np
import pytest

from lucene_kmp_ray.index.parallel import ParallelReader
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BooleanQuery, Occur, PhraseQuery,
                                   Searcher, TermQuery)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_indexes(ray_session, tmp_path_factory):
    """Index A carries only the text field, index B only the title
    field — same corpus, same segmentation."""
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.sources.corpus import corpus_dataset

    root = tmp_path_factory.mktemp("parallel")
    a, b = str(root / "text_idx"), str(root / "title_idx")
    for d, flds in ((a, ("text",)), (b, ("title",))):
        shutil.rmtree(d, ignore_errors=True)
        build_index(corpus_dataset(SF), d, segment_size=100, fields=flds)
    return a, b


def _hits(searcher, q, k=400):
    td = searcher.search(q, k=k)
    return [(h.doc_id, h.score) for h in td.score_docs]


def test_parallel_equals_combined(split_indexes, built_index):
    a, b = split_indexes
    par = Searcher(ParallelReader.open([a, b]))
    single = Searcher(IndexReader(built_index))
    queries = [
        TermQuery("spark"),
        TermQuery("spark", field="title"),
        PhraseQuery(("big", "scan")),
        BooleanQuery.build((Occur.MUST, TermQuery("spark")),
                           (Occur.MUST, TermQuery("join", field="title"))),
        BooleanQuery.build((Occur.SHOULD, TermQuery("window")),
                           (Occur.SHOULD, TermQuery("scan", field="title"))),
    ]
    for q in queries:
        hp, hs = _hits(par, q), _hits(single, q)
        assert [d for d, _ in hp] == [d for d, _ in hs], q
        np.testing.assert_array_equal(
            np.array([s for _, s in hp], dtype=np.float32),
            np.array([s for _, s in hs], dtype=np.float32))


def test_field_ownership_and_stats(split_indexes, built_index):
    a, b = split_indexes
    pr = ParallelReader.open([a, b])
    combined = IndexReader(built_index)
    assert pr.fields() == ["text", "title"]
    assert pr.doc_count == combined.doc_count
    for field in ("text", "title"):
        assert pr.field_stats(field) == combined.field_stats(field)
        assert pr.term_stats(["spark", "join"], field) == \
            combined.term_stats(["spark", "join"], field)


def test_doc_meta_union(split_indexes):
    a, b = split_indexes
    pr = ParallelReader.open([a, b])
    cols = pr.segment_readers[0].doc_meta.column_names
    assert "norm" in cols and "norm_title" in cols  # fields of BOTH sides


def test_incompatible_segmentation_rejected(split_indexes, ray_session,
                                            tmp_path):
    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.sources.corpus import corpus_dataset

    a, _ = split_indexes
    other = str(tmp_path / "idx250")
    build_index(corpus_dataset(SF), other, segment_size=250,
                fields=("title",))
    with pytest.raises(ValueError, match="segmentation"):
        ParallelReader.open([a, other])


def test_first_reader_wins_on_conflict(split_indexes, built_index):
    # both carry "text": the first reader owns it (putIfAbsent contract)
    a, _ = split_indexes
    pr = ParallelReader.open([a, built_index])
    assert pr._field_owner["text"].index_dir == a
    assert pr._field_owner["title"].index_dir == built_index
    s = Searcher(pr)
    assert _hits(s, TermQuery("spark"))  # still searchable
