"""MultiReader — virtual cross-index composite (``index/MultiReader.kt``).

The contract: searching a MultiReader over indexes A and B returns
exactly what searching the physical union (``add_indexes`` — already
bit-equivalence-tested) returns, because collection and term statistics
SUM across sub-readers (BaseCompositeReader.docFreq/totalTermFreq) and
the match set is the union of the subs' segments.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.merge import add_indexes
from lucene_kmp_ray.index.reader import IndexReader, MultiReader
from lucene_kmp_ray.search import (BooleanQuery, Occur, PhraseQuery,
                                   Searcher, TermQuery)


def _mk(tmp_path, name, texts, base):
    idx = str(tmp_path / name)
    docs = pa.table({
        "doc_id": pa.array(range(base, base + len(texts)), pa.int64()),
        "url": [f"u{base + i}" for i in range(len(texts))],
        "text": texts,
    })
    man = build_and_write_segment(docs, 0, idx)
    commit_index(idx, [man])
    return idx


TEXTS_A = ["grape melon grape", "melon kiwi", "grape kiwi melon kiwi"]
TEXTS_B = ["kiwi kiwi grape", "melon", "grape grape melon kiwi melon"]


@pytest.fixture()
def two_indexes(tmp_path, ray_session):
    a = _mk(tmp_path, "a", TEXTS_A, 0)
    b = _mk(tmp_path, "b", TEXTS_B, 10)
    return a, b


def _results(searcher, query, k=20):
    td = searcher.search(query, k=k)
    return [(h.doc_id, round(h.score, 10)) for h in td.score_docs]


def test_multireader_stats_sum(two_indexes):
    a, b = two_indexes
    mr = MultiReader.open([a, b])
    assert mr.doc_count == 6
    ra, rb = IndexReader(a), IndexReader(b)
    assert mr.sum_total_term_freq == \
        ra.sum_total_term_freq + rb.sum_total_term_freq
    sa = ra.term_stats(["grape"])["grape"]
    sb = rb.term_stats(["grape"])["grape"]
    sm = mr.term_stats(["grape"])["grape"]
    assert sm == (sa[0] + sb[0], sa[1] + sb[1])


def test_multireader_matches_physical_union(two_indexes, tmp_path):
    a, b = two_indexes
    import shutil
    union = str(tmp_path / "union")
    shutil.copytree(a, union)
    add_indexes(union, [b])
    s_virt = Searcher(MultiReader.open([a, b]))
    s_phys = Searcher(IndexReader(union))
    for q in (TermQuery("grape"),
              TermQuery("kiwi"),
              PhraseQuery(("melon", "kiwi")),
              BooleanQuery.build((Occur.MUST, TermQuery("grape")),
                                 (Occur.SHOULD, TermQuery("melon")))):
        assert _results(s_virt, q) == _results(s_phys, q)


def test_multireader_respects_sub_deletes(two_indexes):
    from lucene_kmp_ray.index.deletes import delete_by_url

    a, b = two_indexes
    delete_by_url(a, ["u0"], parallel=False)
    s = Searcher(MultiReader.open([a, b]))
    ids = [h.doc_id for h in s.search(TermQuery("grape"), k=20).score_docs]
    assert 0 not in ids and 10 in ids
