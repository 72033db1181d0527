"""Seeded nearest-centroid clustering vs brute force."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _vecs():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return t["vec_id"].to_numpy(), m / n


def test_cluster_assign_matches_brute(ray_session):
    from lucene_kmp_ray.pipelines.ann import CLUSTER_K, cluster_assign
    got = cluster_assign(SF).to_pandas().set_index("vec_id")["cluster"]
    ids, x = _vecs()
    want = np.argmax(x @ x[:CLUSTER_K].T, axis=1)
    assert len(got) == len(ids)
    assert (got.loc[ids].to_numpy() == want).all()
    # seeds land in their own cluster; every cluster is populated
    assert (want[:CLUSTER_K] == np.arange(CLUSTER_K)).all()
    assert len(np.unique(want)) == CLUSTER_K


def test_cluster_sizes_sum_to_corpus(ray_session):
    from lucene_kmp_ray.pipelines.ann import CLUSTER_K, cluster_sizes
    cs = cluster_sizes(SF).to_pandas()
    assert sorted(cs["cluster"]) == list(range(CLUSTER_K))
    assert cs["n"].sum() == len(_vecs()[0])
