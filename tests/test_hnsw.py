"""HNSW graph build/search (util/hnsw, the HnswGraphBuilder.kt /
HnswGraphSearcher.kt role) and its index integration: per-segment graph
sidecars, approximate KnnFloatVectorQuery, merge rebuild."""

import glob
import os
import shutil

import numpy as np
import pytest

from lucene_kmp_ray.util.hnsw import (build_graph, graph_from_table,
                                      graph_to_table, _normalize)

RNG = np.random.default_rng(7)


def _recall(g, v_norm, queries, k=10, ef=64):
    hits = 0
    for q in queries:
        qq = q / np.linalg.norm(q)
        exact = set(np.argsort(-(v_norm @ qq))[:k].tolist())
        ids, _ = g.search(q, k, ef=ef)
        hits += len(exact & set(ids.tolist()))
    return hits / (k * len(queries))


def test_recall_on_random_vectors():
    vecs = RNG.standard_normal((1500, 32)).astype(np.float32)
    g = build_graph(vecs)
    r = _recall(g, _normalize(vecs), RNG.standard_normal((30, 32)), ef=64)
    assert r >= 0.9, r


def test_exhaustive_ef_equals_exact():
    vecs = RNG.standard_normal((200, 16)).astype(np.float32)
    g = build_graph(vecs)
    v = _normalize(vecs)
    q = RNG.standard_normal(16)
    ids, sims = g.search(q, 10, ef=200)
    exact = np.argsort(-(v @ (q / np.linalg.norm(q))))[:10]
    assert ids.tolist() == exact.tolist()
    # similarities agree with the exact cosine
    want = (v @ (q / np.linalg.norm(q)))[exact]
    np.testing.assert_allclose(sims, want, atol=1e-5)


def test_build_deterministic_and_roundtrip():
    vecs = RNG.standard_normal((300, 8)).astype(np.float32)
    g1 = build_graph(vecs, seed=5)
    g2 = build_graph(vecs, seed=5)
    assert g1.entry == g2.entry
    assert g1.neighbors == g2.neighbors
    t = graph_to_table(g1)
    g3 = graph_from_table(t, g1.v, g1.m, g1.entry)
    assert g3.neighbors == g1.neighbors
    q = RNG.standard_normal(8)
    assert g3.search(q, 5, ef=32)[0].tolist() == \
        g1.search(q, 5, ef=32)[0].tolist()


SF = "/root/testdata/sf0.001"


def _build(idx, hnsw=None):
    from lucene_kmp_ray.index.builder import build_index_sharded
    from lucene_kmp_ray.sources.corpus import corpus_shards
    shards, make_docs = corpus_shards(SF, segment_size=100,
                                      with_vectors=True)
    build_index_sharded(shards, make_docs, idx, vector_col="embedding",
                        hnsw=hnsw)


@pytest.fixture(scope="module")
def hnsw_idx(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "hnsw")
    _build(idx, hnsw={"m": 8, "ef_construction": 60})
    return idx


@pytest.fixture(scope="module")
def exact_idx(ray_session, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "exact")
    _build(idx)
    return idx


def _qvec(sf=SF):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    return tuple(t["embedding"][0].as_py())


def test_graph_sidecars_written(hnsw_idx):
    segs = sorted(glob.glob(os.path.join(hnsw_idx, "segments", "seg=*")))
    assert segs
    for d in segs:
        assert os.path.exists(os.path.join(d, "graph.parquet"))
        import json
        man = json.load(open(os.path.join(d, "manifest.json")))
        assert man["hnsw"]["m"] == 8


def test_knn_query_uses_graph_and_matches_exact(hnsw_idx, exact_idx):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import KnnFloatVectorQuery, Searcher
    q = _qvec()
    # generous ef on a small corpus → identical to the exact path
    td_g = Searcher(IndexReader(hnsw_idx)).search(
        KnnFloatVectorQuery(q, k=10, ef_search=200), k=10)
    td_e = Searcher(IndexReader(exact_idx)).search(
        KnnFloatVectorQuery(q, k=10), k=10)
    assert [h.doc_id for h in td_g.score_docs] == \
        [h.doc_id for h in td_e.score_docs]
    np.testing.assert_allclose(
        [h.score for h in td_g.score_docs],
        [h.score for h in td_e.score_docs], rtol=1e-6)


def test_merge_rebuilds_graph(hnsw_idx, tmp_path):
    from lucene_kmp_ray.index.merge import force_merge
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import KnnFloatVectorQuery, Searcher
    idx = str(tmp_path / "m")
    shutil.copytree(hnsw_idx, idx)
    q = _qvec()
    before = Searcher(IndexReader(idx)).search(
        KnnFloatVectorQuery(q, k=10, ef_search=200), k=10)
    force_merge(idx, max_segments=1)
    segs = sorted(glob.glob(os.path.join(idx, "segments", "seg=*")))
    assert len(segs) == 1
    assert os.path.exists(os.path.join(segs[0], "graph.parquet"))
    after = Searcher(IndexReader(idx)).search(
        KnnFloatVectorQuery(q, k=10, ef_search=200), k=10)
    assert sorted(h.doc_id for h in before.score_docs) == \
        sorted(h.doc_id for h in after.score_docs)


def test_seeded_knn_matches_exact_with_generous_ef(hnsw_idx, exact_idx):
    # SeededKnnVectorQuery.kt: seed's top matches become layer-0 entry
    # points; with exhaustive ef the result equals the exact scan
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (KnnFloatVectorQuery, Searcher,
                                       SeededKnnVectorQuery, TermQuery)
    q = _qvec()
    td_s = Searcher(IndexReader(hnsw_idx)).search(
        SeededKnnVectorQuery(q, k=10, seed=TermQuery("spark"),
                             ef_search=200), k=10)
    td_e = Searcher(IndexReader(exact_idx)).search(
        KnnFloatVectorQuery(q, k=10), k=10)
    assert [h.doc_id for h in td_s.score_docs] == \
        [h.doc_id for h in td_e.score_docs]
    np.testing.assert_allclose(
        [h.score for h in td_s.score_docs],
        [h.score for h in td_e.score_docs], rtol=1e-6)


def test_seeded_knn_empty_seed_falls_back_to_descent(hnsw_idx):
    # a seed with no matches must behave exactly like the unseeded query
    # (the reference contract: the format is free to ignore the seed)
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (KnnFloatVectorQuery, Searcher,
                                       SeededKnnVectorQuery, TermQuery)
    q = _qvec()
    s = Searcher(IndexReader(hnsw_idx))
    td_s = s.search(SeededKnnVectorQuery(q, k=10,
                                         seed=TermQuery("zzz_nope"),
                                         ef_search=64), k=10)
    td_u = s.search(KnnFloatVectorQuery(q, k=10, ef_search=64), k=10)
    assert [h.doc_id for h in td_s.score_docs] == \
        [h.doc_id for h in td_u.score_docs]


def test_seeded_entry_points_reach_result_without_descent():
    # unit level: seeding from the true nearest node returns it first
    # even with a tiny beam
    vecs = RNG.standard_normal((400, 16)).astype(np.float32)
    g = build_graph(vecs)
    v = _normalize(vecs)
    q = vecs[123] + 0.01 * RNG.standard_normal(16).astype(np.float32)
    ids, _ = g.search(q, 1, ef=1, entry_points=[123])
    exact = int(np.argmax(v @ (q / np.linalg.norm(q))))
    assert ids[0] == exact == 123


def test_filtered_knn_exact_equals_graph_paths(hnsw_idx, exact_idx):
    # AbstractKnnVectorQuery.kt:26-31: the filter runs per leaf first.
    # With a generous ef the filtered graph result equals the filtered
    # exact scan; both must only return docs matching the filter.
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (KnnFloatVectorQuery, Searcher,
                                       TermQuery)
    q = _qvec()
    flt = TermQuery("spark")
    td_g = Searcher(IndexReader(hnsw_idx)).search(
        KnnFloatVectorQuery(q, k=10, ef_search=200, filter=flt), k=10)
    se = Searcher(IndexReader(exact_idx))
    td_e = se.search(KnnFloatVectorQuery(q, k=10, filter=flt), k=10)
    assert [h.doc_id for h in td_g.score_docs] == \
        [h.doc_id for h in td_e.score_docs]
    matching = {h.doc_id
                for h in se.search(TermQuery("spark"), k=10_000).score_docs}
    assert all(h.doc_id in matching for h in td_e.score_docs)
    # and the filtered top-10 differs from the unfiltered one whenever
    # the unfiltered top-10 contains non-matching docs
    td_u = se.search(KnnFloatVectorQuery(q, k=10), k=10)
    if any(h.doc_id not in matching for h in td_u.score_docs):
        assert [h.doc_id for h in td_u.score_docs] != \
            [h.doc_id for h in td_e.score_docs]


def test_filtered_knn_small_filter_takes_exact_path(hnsw_idx, exact_idx):
    # a filter matching fewer docs than k → the exactSearch branch; the
    # result is exactly the filter's doc set ranked by cosine
    import pyarrow.parquet as pq

    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (KnnFloatVectorQuery,
                                       RangeFilterQuery, Searcher)
    q = _qvec()
    flt = RangeFilterQuery("doc_id", 100, 104)  # 5 docs < k=10
    td = Searcher(IndexReader(hnsw_idx)).search(
        KnnFloatVectorQuery(q, k=10, ef_search=16, filter=flt), k=10)
    assert sorted(h.doc_id for h in td.score_docs) == [100, 101, 102,
                                                       103, 104]
    td_e = Searcher(IndexReader(exact_idx)).search(
        KnnFloatVectorQuery(q, k=10, filter=flt), k=10)
    assert [(h.doc_id, round(h.score, 9)) for h in td.score_docs] == \
        [(h.doc_id, round(h.score, 9)) for h in td_e.score_docs]


def test_filtered_byte_knn(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_kmp_ray.index.builder import build_index_sharded
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (KnnByteVectorQuery, Searcher,
                                       TermQuery)
    from lucene_kmp_ray.sources.corpus import corpus_shards
    from lucene_kmp_ray.util.quantize import (ScalarQuantizer,
                                              dot_product_score)
    idx = str(tmp_path / "bq")
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    mat = np.vstack(t["embedding"].combine_chunks()
                    .to_numpy(zero_copy_only=False)).astype(np.float64)
    sq = ScalarQuantizer(float(mat.min()), float(mat.max()), 7)
    shards, make_docs = corpus_shards(SF, segment_size=100,
                                      with_vectors=True)
    build_index_sharded(shards, make_docs, idx, vector_col="embedding",
                        quantize={"lo": sq.lo, "hi": sq.hi, "bits": 7})
    qall, _ = sq.quantize(mat)
    s = Searcher(IndexReader(idx))
    matching = {h.doc_id
                for h in s.search(TermQuery("spark"), k=10_000).score_docs}
    td = s.search(KnnByteVectorQuery(tuple(int(x) for x in qall[0]), k=10,
                                     filter=TermQuery("spark")), k=10)
    assert all(h.doc_id in matching for h in td.score_docs)
    sims = dot_product_score(qall[0], qall)
    ok = np.array(sorted(matching))
    order = ok[np.lexsort((ok, -sims[ok]))][:10]
    assert [h.doc_id for h in td.score_docs] == [int(i) for i in order]
