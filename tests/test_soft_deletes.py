"""Soft deletes + retention merges.

Reference scenarios: ``TestSoftDeletesDirectoryReaderWrapper.kt``
(testMixSoftAndHardDeletes, testAvoidWrappingReadersWithoutSoftDeletes)
and ``TestSoftDeletesRetentionMergePolicy.kt`` (testFieldBasedRetention,
testKeepAllDocsAcrossMerges, testSoftDeleteWithRetention,
testUndeleteDocument role via value semantics, testMixedSoftDeletes-
AndHardDeletes). Engine form: markers are doc-values update generations
(index/softdeletes.py), the wrapped reader folds them into tombstones,
and merges reclaim non-retained soft deletes while carrying retained
markers into the new segment.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.deletes import delete_by_url
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.merge import run_merges
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.index.softdeletes import (soft_delete_by_url,
                                              soft_deleted_docs,
                                              soft_deleted_values)
from lucene_kmp_ray.search import Searcher, TermQuery

F = "__soft_deletes"


def _mk_index(tmp_path, texts_by_seg, metas=False):
    idx = str(tmp_path / "idx")
    mans, base = [], 0
    for seg, texts in enumerate(texts_by_seg):
        n = len(texts)
        cols = {
            "doc_id": pa.array(range(base, base + n), pa.int64()),
            "url": [f"u{base + i}" for i in range(n)],
            "text": texts,
        }
        meta_cols = ()
        if metas:
            cols["stamp"] = pa.array(
                [base + i for i in range(n)], pa.int64())
            meta_cols = ("stamp",)
        mans.append(build_and_write_segment(pa.table(cols), seg, idx,
                                            meta_cols=meta_cols))
        base += n
    commit_index(idx, mans)
    return idx


def _hits(idx, term, **reader_kw):
    s = Searcher(IndexReader(idx, **reader_kw))
    td = s.search(TermQuery(term), k=100)
    return sorted(h.doc_id for h in td.score_docs)


def test_wrapper_masks_soft_deleted(tmp_path, ray_session):
    idx = _mk_index(tmp_path, [["apple pie", "apple tart"],
                               ["apple cake", "plum cake"]])
    assert _hits(idx, "apple") == [0, 1, 2]
    n = soft_delete_by_url(idx, ["u1", "u2"], parallel=False)
    assert n == 2
    # unwrapped reader still sees everything
    # (testAvoidWrappingReadersWithoutSoftDeletes: no field → no wrap)
    assert _hits(idx, "apple") == [0, 1, 2]
    # wrapped reader hides the soft-deleted docs
    assert _hits(idx, "apple", soft_deletes_field=F) == [0]


def test_mix_soft_and_hard_deletes(tmp_path, ray_session):
    # testMixSoftAndHardDeletes: live = hard-live AND not-soft-deleted
    idx = _mk_index(tmp_path, [["a b", "a c", "a d", "a e"]])
    soft_delete_by_url(idx, ["u1"], parallel=False)
    delete_by_url(idx, ["u2"], parallel=False)
    assert _hits(idx, "a", soft_deletes_field=F) == [0, 3]
    assert _hits(idx, "a") == [0, 1, 3]  # hard delete always applies


def test_merge_reclaims_soft_deletes(tmp_path, ray_session):
    """Without retention, merges reclaim soft-deleted docs like hard
    tombstones (PendingSoftDeletes: soft deletes count as deletes)."""
    idx = _mk_index(tmp_path, [["x one", "x two"], ["x three", "x four"]])
    soft_delete_by_url(idx, ["u0", "u3"], parallel=False)
    run_merges(idx, merges=[[0, 1]], soft_deletes_field=F)
    r = IndexReader(idx, soft_deletes_field=F)
    assert len(r.segment_readers) == 1
    assert r.doc_count == 2  # reclaimed from stats too
    assert _hits(idx, "x", soft_deletes_field=F) == [1, 2]
    # no markers survive (nothing was retained)
    assert len(soft_deleted_docs(r.segment_readers[0].dir, F)) == 0


def test_field_based_retention(tmp_path, ray_session):
    """testFieldBasedRetention / testSoftDeleteWithRetention: retained
    soft-deleted docs survive the merge (still hidden from a wrapped
    reader, still counted in stats); non-retained ones reclaim."""
    idx = _mk_index(tmp_path, [["k aa", "k bb"], ["k cc", "k dd"]],
                    metas=True)
    # soft-delete docs 0, 1, 2; retention keeps stamp >= 1
    soft_delete_by_url(idx, ["u0", "u1", "u2"], parallel=False)

    def retention(docs_table):
        return docs_table["stamp"].to_numpy() >= 1

    run_merges(idx, merges=[[0, 1]], soft_deletes_field=F,
               retention=retention)
    r = IndexReader(idx, soft_deletes_field=F)
    sd = r.segment_readers[0]
    # doc 0 reclaimed; docs 1, 2 retained but still soft-deleted
    assert r.doc_count == 3
    assert _hits(idx, "k", soft_deletes_field=F) == [3]
    # unwrapped reader sees the retained docs (testKeepAllDocsAcrossMerges
    # with a match-all retention would keep everything visible this way)
    assert _hits(idx, "k") == [1, 2, 3]
    ids, vals = soft_deleted_values(sd.dir, F)
    # carried markers remapped to the merged segment's local ids
    live_urls = sd.doc_meta["url"].to_pylist()
    assert [live_urls[i] for i in ids] == ["u1", "u2"]
    assert vals.tolist() == [1, 1]


def test_retention_keep_all_then_reclaim(tmp_path, ray_session):
    """testKeepAllDocsAcrossMerges then a second merge with no retention:
    the carried markers still count as deletes and reclaim later."""
    idx = _mk_index(tmp_path, [["m p", "m q"], ["m r", "m s"]])
    soft_delete_by_url(idx, ["u1", "u2"], parallel=False)
    run_merges(idx, merges=[[0, 1]], soft_deletes_field=F,
               retention=lambda t: np.ones(t.num_rows, dtype=bool))
    assert _hits(idx, "m", soft_deletes_field=F) == [0, 3]
    r = IndexReader(idx)
    assert r.doc_count == 4  # everything retained
    seg = r.manifest["segments"][0]["seg"]
    run_merges(idx, merges=[[seg]], soft_deletes_field=F)
    r2 = IndexReader(idx, soft_deletes_field=F)
    assert r2.doc_count == 2  # now reclaimed
    assert _hits(idx, "m", soft_deletes_field=F) == [0, 3]


def test_undelete_document(tmp_path, ray_session):
    """testUndeleteDocument role: our markers are value generations, so
    an 'undelete' is writing a generation that the wrapper ignores —
    here modeled as re-adding via a fresh value=0 convention is NOT
    Lucene's (any value = deleted), so undelete = advisory only; assert
    the any-value contract instead."""
    idx = _mk_index(tmp_path, [["z h", "z i"]])
    soft_delete_by_url(idx, ["u0"], value=0, parallel=False)
    # ANY value in the field counts as soft-deleted (FieldExistsQuery
    # contract), even 0
    assert _hits(idx, "z", soft_deletes_field=F) == [1]


def test_soft_deletes_distributed_topk(tmp_path, ray_session):
    """search_distributed honors the wrapper: per-actor readers open with
    the soft-deletes field and the hidden doc leaves the top-k."""
    from lucene_kmp_ray.search.ray_search import search_distributed
    from lucene_kmp_ray.search import TermQuery

    idx = _mk_index(tmp_path, [["w a", "w b"], ["w c", "w d"]])
    soft_delete_by_url(idx, ["u2"], parallel=False)
    df = search_distributed(idx, {"q": TermQuery("w")}, k=10,
                            soft_deletes_field=F).to_pandas()
    assert sorted(df["doc_id"]) == [0, 1, 3]
