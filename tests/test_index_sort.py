"""Index sort within segments (index/Sorter.kt /
IndexWriterConfig.setIndexSort role): build-time doc ordering by a meta
key, preservation through merges, and early-terminated sorted search."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.check import check_index
from lucene_kmp_ray.index.merge import force_merge
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import BooleanQuery, Occur, Searcher, TermQuery
from lucene_kmp_ray.sources.corpus import corpus_dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_idx(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "sorted")
    build_index(corpus_dataset(SF), idx, segment_size=100,
                index_sort=(("url", False),))
    return idx


@pytest.fixture(scope="module")
def plain_idx(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "plain")
    build_index(corpus_dataset(SF), idx, segment_size=100)
    return idx


def _seg_dirs(idx):
    return sorted(glob.glob(os.path.join(idx, "segments", "seg=*")))


def test_docs_ordered_by_sort_key(sorted_idx):
    for d in _seg_dirs(sorted_idx):
        t = pq.read_table(os.path.join(d, "docs.parquet"))
        urls = t["url"].to_pylist()
        assert urls == sorted(urls)
        man = json.load(open(os.path.join(d, "manifest.json")))
        assert man["index_sort"] == [["url", False]]
        ids = t["doc_id"].to_numpy()
        assert man["doc_id_min"] == int(ids.min())
        assert man["doc_id_max"] == int(ids.max())


def test_search_results_equal_plain_index(sorted_idx, plain_idx):
    qs = [TermQuery("spark"),
          BooleanQuery.build((Occur.MUST, TermQuery("spark")),
                             (Occur.MUST, TermQuery("join")))]
    s_sorted = Searcher(IndexReader(sorted_idx))
    s_plain = Searcher(IndexReader(plain_idx))
    for q in qs:
        a = s_sorted.search(q, k=10)
        b = s_plain.search(q, k=10)
        assert a.total_hits == b.total_hits
        assert [(h.doc_id, round(h.score, 5)) for h in a.score_docs] == \
            [(h.doc_id, round(h.score, 5)) for h in b.score_docs]


def test_merge_preserves_index_sort(sorted_idx, tmp_path):
    idx = str(tmp_path / "m")
    shutil.copytree(sorted_idx, idx)
    before = Searcher(IndexReader(idx)).search(TermQuery("spark"), k=10)
    force_merge(idx, max_segments=1)
    segs = _seg_dirs(idx)
    assert len(segs) == 1
    t = pq.read_table(os.path.join(segs[0], "docs.parquet"))
    urls = t["url"].to_pylist()
    assert urls == sorted(urls)
    man = json.load(open(os.path.join(segs[0], "manifest.json")))
    assert man["index_sort"] == [["url", False]]
    report = check_index(idx)
    assert report["ok"], report
    after = Searcher(IndexReader(idx)).search(TermQuery("spark"), k=10)
    assert before.total_hits == after.total_hits
    assert sorted(h.doc_id for h in before.score_docs) == \
        sorted(h.doc_id for h in after.score_docs)


def test_mixed_sort_merge_rejected(sorted_idx, plain_idx, tmp_path):
    from lucene_kmp_ray.index.merge import add_indexes
    idx = str(tmp_path / "mix")
    shutil.copytree(sorted_idx, idx)
    add_indexes(idx, [plain_idx])
    with pytest.raises(ValueError, match="differing index sorts"):
        force_merge(idx, max_segments=1)


def test_early_terminated_sorted_search_matches_full(sorted_idx, plain_idx):
    from lucene_kmp_ray.search.ray_search import (SortField,
                                                  search_sorted_by_fields)
    fast = search_sorted_by_fields(
        sorted_idx, TermQuery("spark"), (SortField("url"),), k=15)
    full = search_sorted_by_fields(
        plain_idx, TermQuery("spark"), (SortField("url"),), k=15)
    assert fast["doc_id"].tolist() == full["doc_id"].tolist()
    assert fast["url"].tolist() == full["url"].tolist()


def test_explain_finds_doc_in_sorted_segment(sorted_idx):
    s = Searcher(IndexReader(sorted_idx))
    td = s.search(TermQuery("spark"), k=1)
    doc = td.score_docs[0].doc_id
    ex = s.explain(TermQuery("spark"), doc)
    assert ex["value"] > 0
