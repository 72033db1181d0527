"""Groupby-term shuffle build (head-term skew splitting) must produce
file-identical segments to the in-task inversion path (TestDuelingCodecs
assertion style, SURVEY §5)."""

import json

import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.grouped import (build_index_grouped,
                                          estimate_head_terms)
from lucene_kmp_ray.sources.corpus import corpus_dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pair(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("grouped")
    a = str(base / "sharded")
    b = str(base / "grouped")
    build_index(corpus_dataset(SF), a, segment_size=100)
    # tiny salt_docs so head terms really split into multiple sub-lists
    build_index_grouped(corpus_dataset(SF), b, segment_size=100,
                        salt_docs=32, head_df_frac=0.05)
    return a, b


def test_head_terms_detected(ray_session):
    heads = estimate_head_terms(corpus_dataset(SF), head_df_frac=0.05)
    assert "the" in heads  # synthetic corpus: 'the' is in ~every doc


def test_identical_manifests(pair):
    a, b = pair
    with open(f"{a}/manifest.json") as f:
        ma = json.load(f)
    with open(f"{b}/manifest.json") as f:
        mb = json.load(f)
    for k in ("doc_count", "sum_total_term_freq", "sum_doc_freq"):
        assert ma[k] == mb[k]
    assert [s["seg"] for s in ma["segments"]] == \
        [s["seg"] for s in mb["segments"]]


def test_identical_segment_files(pair):
    a, b = pair
    with open(f"{a}/manifest.json") as f:
        segs = [s["dir"] for s in json.load(f)["segments"]]
    for d in segs:
        ta = pq.read_table(f"{a}/{d}/terms.parquet")
        tb = pq.read_table(f"{b}/{d}/terms.parquet")
        assert ta.equals(tb), f"terms mismatch in {d}"
        da = pq.read_table(f"{a}/{d}/docs.parquet")
        db = pq.read_table(f"{b}/{d}/docs.parquet")
        assert da.equals(db), f"docs mismatch in {d}"


def test_identical_term_stats(pair):
    a, b = pair
    assert pq.read_table(f"{a}/term_stats.parquet").equals(
        pq.read_table(f"{b}/term_stats.parquet"))
