"""SearcherLifetimeManager (search/SearcherLifetimeManager.kt role):
record/acquire by commit generation, prune-by-age, reopen of retained
generations after in-memory pruning."""
import pytest

from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.commits import SnapshotDeletionPolicy
from lucene_kmp_ray.index.merge import run_merges
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import Searcher, TermQuery
from lucene_kmp_ray.search.lifetime import (PruneByAge,
                                            SearcherLifetimeManager)
from lucene_kmp_ray.sources.corpus import corpus_dataset

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def idx(tmp_path, ray_session):
    d = str(tmp_path / "lifetime_idx")
    build_index(corpus_dataset(SF), d, segment_size=100)
    return d


def test_record_acquire_same_instance(idx):
    mgr = SearcherLifetimeManager()
    s1 = Searcher(IndexReader(idx))
    tok = mgr.record(s1, now=100.0)
    assert tok == 1
    assert mgr.acquire(tok) is s1
    assert mgr.acquire(999) is None
    # same gen, same searcher: idempotent; different instance: rejected
    assert mgr.record(s1, now=101.0) == tok
    with pytest.raises(ValueError):
        mgr.record(Searcher(IndexReader(idx)), now=102.0)


def test_paging_same_view_across_a_merge(idx):
    """The searchAfter-across-requests story: page 2 comes from the SAME
    recorded view even though a merge committed in between."""
    mgr = SearcherLifetimeManager()
    sdp = SnapshotDeletionPolicy()
    sdp.snapshot(idx)
    s1 = Searcher(IndexReader(idx))
    tok = mgr.record(s1, now=0.0)
    p1 = s1.search(TermQuery("the"), k=10)
    run_merges(idx, merges=[[0, 1], [2, 3]], deletion_policy=sdp)
    s_back = mgr.acquire(tok)
    p2 = s_back.search_after(p1.score_docs[-1], TermQuery("the"), k=10)
    # identical to paging on the original searcher, disjoint from page 1
    want = s1.search_after(p1.score_docs[-1], TermQuery("the"), k=10)
    assert [h.doc_id for h in p2.score_docs] == \
        [h.doc_id for h in want.score_docs]
    assert not ({h.doc_id for h in p1.score_docs} &
                {h.doc_id for h in p2.score_docs})


def test_prune_by_age_and_reopen_from_retained_commit(idx):
    mgr = SearcherLifetimeManager()
    sdp = SnapshotDeletionPolicy()
    sdp.snapshot(idx)
    s1 = Searcher(IndexReader(idx))
    tok1 = mgr.record(s1, now=0.0)
    n_old = s1.search(TermQuery("spark"), k=5).total_hits
    run_merges(idx, merges=[[0, 1]], deletion_policy=sdp)
    s2 = Searcher(IndexReader(idx))
    tok2 = mgr.record(s2, now=100.0)
    # prune: tok1 is 200s old -> dropped; newest (tok2) exempt even if old
    assert mgr.prune(PruneByAge(60.0), now=200.0) == [tok1]
    assert mgr.acquire(tok1) is None
    assert mgr.acquire(tok2) is s2
    # but the snapshot retained gen 1's commit: acquire reopens it
    s_re = mgr.acquire(tok1, index_dir=idx)
    assert s_re is not None
    assert len(s_re.reader.manifest["segments"]) == 5
    assert s_re.search(TermQuery("spark"), k=5).total_hits == n_old
    with pytest.raises(ValueError):
        PruneByAge(-1.0)
