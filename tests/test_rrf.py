"""Reciprocal Rank Fusion — reference vectors.

ref: core/src/commonTest/.../search/TestTopDocsRRF.kt (testBasics,
testShardIndex, testInconsistentShardIndex, testInvalidTopN, testInvalidK)
against TopDocs.rrf semantics in search/TopDocs.kt:339-392.
"""
import numpy as np
import pytest

from lucene_kmp_ray.search import rrf
from lucene_kmp_ray.search.searcher import ScoreDoc, TopDocs

GTE = "GREATER_THAN_OR_EQUAL_TO"


def f32(x: float) -> float:
    return float(np.float32(x))


def test_basics():
    # TestTopDocsRRF.kt testBasics: shardIndex unset (-1) everywhere
    td1 = TopDocs(100, GTE, [ScoreDoc(10.0, -1, 42),
                             ScoreDoc(5.0, -1, 10),
                             ScoreDoc(3.0, -1, 20)])
    td2 = TopDocs(80, GTE, [ScoreDoc(10.0, -1, 10),
                            ScoreDoc(5.0, -1, 20)])
    out = rrf(3, 20, [td1, td2])
    assert out.total_hits == 100 and out.relation == GTE
    sds = out.score_docs
    assert len(sds) == 3
    assert (sds[0].doc, sds[0].seg) == (10, -1)
    assert sds[0].score == f32(1.0 / (20 + 2) + 1.0 / (20 + 1))
    assert (sds[1].doc, sds[1].seg) == (20, -1)
    assert sds[1].score == f32(1.0 / (20 + 3) + 1.0 / (20 + 2))
    assert (sds[2].doc, sds[2].seg) == (42, -1)
    assert sds[2].score == f32(1.0 / (20 + 1))


def test_shard_index():
    # TestTopDocsRRF.kt testShardIndex: same doc on different shards is
    # a DIFFERENT document (identity = (shardIndex, doc))
    td1 = TopDocs(100, GTE, [ScoreDoc(10.0, 0, 42),
                             ScoreDoc(5.0, 1, 10),
                             ScoreDoc(3.0, 0, 20)])
    td2 = TopDocs(80, GTE, [ScoreDoc(10.0, 1, 10),
                            ScoreDoc(5.0, 1, 20)])
    out = rrf(3, 20, [td1, td2])
    assert out.total_hits == 100
    sds = out.score_docs
    assert len(sds) == 3
    assert (sds[0].doc, sds[0].seg) == (10, 1)
    assert sds[0].score == f32(1.0 / (20 + 2) + 1.0 / (20 + 1))
    # (42, shard 0) rank-1 in td1 beats (20, shard 1) rank-2 in td2:
    # 1/21 > 1/22; and (20, shard 0) rank-3 gets 1/23
    assert (sds[1].doc, sds[1].seg) == (42, 0)
    assert sds[1].score == f32(1.0 / (20 + 1))
    assert (sds[2].doc, sds[2].seg) == (20, 1)
    assert sds[2].score == f32(1.0 / (20 + 2))


def test_inconsistent_shard_index():
    td1 = TopDocs(100, GTE, [ScoreDoc(10.0, 0, 42)])
    td2 = TopDocs(80, GTE, [ScoreDoc(10.0, -1, 10)])
    with pytest.raises(ValueError, match="shardIndex"):
        rrf(3, 20, [td1, td2])


def test_invalid_top_n():
    td = TopDocs(100, GTE, [])
    with pytest.raises(ValueError, match="topN"):
        rrf(0, 20, [td, td])


def test_invalid_k():
    td = TopDocs(100, GTE, [])
    with pytest.raises(ValueError, match="k"):
        rrf(3, 0, [td, td])


def test_tie_break_doc_then_shard():
    # equal fused scores order by (doc asc, shardIndex asc)
    # (TopDocs.kt:372-375)
    td1 = TopDocs(2, GTE, [ScoreDoc(9.0, 1, 7), ScoreDoc(8.0, 0, 7)])
    out = rrf(2, 10, [td1])
    # doc 7 on both shards: rank1 (shard 1) = 1/11 > rank2 (shard 0)
    assert [(s.doc, s.seg) for s in out.score_docs] == [(7, 1), (7, 0)]
    td2 = TopDocs(2, GTE, [ScoreDoc(9.0, 1, 3)])
    td3 = TopDocs(2, GTE, [ScoreDoc(9.0, 0, 5)])
    out = rrf(2, 10, [td2, td3])  # both rank-1 → same score → doc asc
    assert [(s.doc, s.seg) for s in out.score_docs] == [(3, 1), (5, 0)]
