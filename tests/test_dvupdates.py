"""Numeric doc-values updates — update a field without reindexing.

ref: index/IndexWriter.kt updateNumericDocValue +
TestNumericDocValuesUpdates semantics: the new value is visible to every
read path after the update; repeated updates resolve newest-wins;
merges bake updates into the new segment and drop the update files.
"""
import glob
import os

import pyarrow as pa


def _index(tmp_path):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(6)], pa.string()),
        "text": pa.array(["spark"] * 6, pa.string()),
        "score_dv": pa.array([10, 20, 30, 40, 50, 60], pa.int64())}))
    idx = str(tmp_path / "dvu")
    build_index(ds, idx, segment_size=2, meta_cols=("score_dv",))
    return idx


def _range_docs(idx, lo, hi):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import RangeFilterQuery
    from lucene_kmp_ray.search.searcher import Searcher
    s = Searcher(IndexReader(idx))
    q = RangeFilterQuery("score_dv", lo, hi)
    return sorted(h.doc_id for h in s.search(q, k=100).score_docs)


def test_update_visible_and_newest_wins(ray_session, tmp_path):
    from lucene_kmp_ray.index.dvupdates import update_numeric_doc_values
    idx = _index(tmp_path)
    assert _range_docs(idx, 100, None) == []

    n = update_numeric_doc_values(idx, "score_dv", {"u1": 100, "u4": 100})
    assert n == 2
    assert _range_docs(idx, 100, None) == [1, 4]
    # untouched docs unchanged
    assert _range_docs(idx, None, 10) == [0]

    # newest generation wins
    update_numeric_doc_values(idx, "score_dv", {"u1": 5})
    assert _range_docs(idx, 100, None) == [4]
    assert _range_docs(idx, None, 10) == [0, 1]


def test_update_by_term_and_merge_bakes(ray_session, tmp_path):
    from lucene_kmp_ray.index.dvupdates import (
        update_numeric_doc_values_by_term)
    idx = _index(tmp_path)

    # every doc containing 'spark' → score_dv 7 (the reference's exact
    # Term-addressed form)
    n = update_numeric_doc_values_by_term(idx, "spark", "score_dv", 7)
    assert n == 6
    assert _range_docs(idx, 7, 7) == [0, 1, 2, 3, 4, 5]
    assert glob.glob(os.path.join(idx, "segments", "*", "dv_*.parquet"))

    # merge all segments: values bake in, update files die with old dirs
    import json

    from lucene_kmp_ray.index.merge import run_merges
    with open(os.path.join(idx, "manifest.json")) as f:
        segs = [m["seg"] for m in json.load(f)["segments"]]
    run_merges(idx, merges=[segs])
    assert _range_docs(idx, 7, 7) == [0, 1, 2, 3, 4, 5]
    assert not glob.glob(os.path.join(idx, "segments", "*", "dv_*.parquet"))


def test_check_index_clean_after_updates(ray_session, tmp_path):
    # CheckIndex must stay clean with dv update generations present
    # (they overlay doc-meta values; postings/stats are untouched)
    from lucene_kmp_ray.index.check import check_index
    from lucene_kmp_ray.index.dvupdates import update_numeric_doc_values
    idx = _index(tmp_path)
    update_numeric_doc_values(idx, "score_dv", {"u0": 999, "u5": -1})
    rep = check_index(idx, parallel=False)
    assert rep["ok"], rep["errors"]
