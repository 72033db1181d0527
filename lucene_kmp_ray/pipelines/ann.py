"""Approximate-nearest-neighbor search over the embeddings table.

Baseline: brute-force cosine top-k — the query matrix (small) is broadcast
once with ``ray.put``; every batch does one numpy matmul against it and emits
per-batch partial top-k (the combiner), then a tiny groupby(query) merge
picks the global top-k. Shuffle volume = k rows per (query, batch) — never
the embeddings themselves.

Scale path: LSH-bucketed variant — signed-random-projection bucket per
vector (deterministic seed), ``groupby(bucket)`` co-locates candidates and
each query probes only its own + neighboring buckets. Implemented as
``ann_lsh_topk`` (same output contract; recall < 1 by construction,
documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util.pool import pool_size as _pool_size


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceScorer:
    """Actor-pool stage: query matrix loaded once per actor."""

    def __init__(self, queries_ref, k: int):
        import ray
        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _norm_rows(np.asarray(qmat, dtype=np.float64))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy()
        mat = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        sims = _norm_rows(mat) @ self.q.T  # (batch, nq)
        out = {"query_id": [], "vec_id": [], "score": []}
        k = min(self.k, len(vec_ids))
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            sel = np.argpartition(-col, k - 1)[:k] if len(col) > k \
                else np.arange(len(col))
            for i in sel:
                out["query_id"].append(qid)
                out["vec_id"].append(int(vec_ids[i]))
                out["score"].append(float(col[i]))
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "score": pa.array(out["score"], pa.float64())})


def _merge_topk_factory(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "score"]]
    return merge


def ann_brute_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                   concurrency: int | None = None):
    """Cosine top-k of every embedding vs the first ``n_queries`` vectors
    (deterministic query set: vec_id 0..n_queries-1)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qt = qt.slice(0, 0) if qt.num_rows == 0 else qt
    df = qt.to_pandas().sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].tolist()
    qmat = np.vstack(df["embedding"].to_numpy())
    queries_ref = ray.put((qids, qmat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(BruteForceScorer,
                             fn_constructor_args=(queries_ref, k),
                             batch_format="pyarrow", batch_size=1024,
                             concurrency=_pool_size(concurrency))
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


# ----------------------------------------------------------- LSH variant ---
N_PLANES = 8  # 256 buckets


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(42)  # fixed seed → deterministic buckets
    return rng.standard_normal((N_PLANES, dim))


def ann_lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 concurrency: int | None = None):
    """Signed-random-projection LSH: vectors bucketed by sign pattern;
    each query scores only its own bucket (approximate — recall measured
    against ann_brute_topk in tests)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    df = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].tolist()
    qmat = np.vstack(df["embedding"].to_numpy())
    dim = qmat.shape[1]
    planes = _planes(dim)
    qbuckets = ((qmat @ planes.T) > 0) @ (1 << np.arange(N_PLANES))
    queries_ref = ray.put((qids, qmat, qbuckets))

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False))
        b = ((mat @ planes.T) > 0) @ (1 << np.arange(N_PLANES))
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    class BucketScorer:
        def __init__(self):
            import ray as _ray
            self.qids, qmat_, self.qbuckets = _ray.get(queries_ref)
            self.q = _norm_rows(np.asarray(qmat_, dtype=np.float64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"].to_numpy()
            buckets = batch["bucket"].to_numpy()
            mat = _norm_rows(np.vstack(
                batch["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64))
            out = {"query_id": [], "vec_id": [], "score": []}
            for j, qid in enumerate(self.qids):
                mask = buckets == self.qbuckets[j]
                if not mask.any():
                    continue
                col = mat[mask] @ self.q[j]
                ids = vec_ids[mask]
                sel = np.argsort(-col)[:k]
                out["query_id"].extend([qid] * len(sel))
                out["vec_id"].extend(ids[sel].tolist())
                out["score"].extend(col[sel].tolist())
            return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                             "vec_id": pa.array(out["vec_id"], pa.int64()),
                             "score": pa.array(out["score"], pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(add_bucket, batch_format="pyarrow") \
                .map_batches(BucketScorer, batch_format="pyarrow",
                             batch_size=1024, concurrency=_pool_size(concurrency))
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


# ----------------------------------------------------------- IVF variant ---
IVF_CELLS = 16
IVF_NPROBE = 4
IVF_KMEANS_ITERS = 8
IVF_TRAIN_SAMPLE = 2048


def _train_centroids(sf_dir: str, n_cells: int = IVF_CELLS) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a sample (the IVF
    training step — at 100 TB this samples ~1M vectors to the driver or a
    single trainer task; centroids are tiny and broadcast)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(IVF_TRAIN_SAMPLE)
    x = _norm_rows(np.vstack(df["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(42)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(x @ cent.T, axis=1)  # cosine assignment
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _norm_rows(cent)
    return cent


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 nprobe: int = IVF_NPROBE, concurrency: int | None = None):
    """IVF scale path: a trained coarse quantizer assigns every vector to a
    cell (one vectorized matmul per batch); each query scores only its
    ``nprobe`` nearest cells. The assignment stage is the partitioner a
    100 TB deployment would write out as ``cell=N/`` Parquet partitions so
    queries read only probed cells; here cells stay in-stream and the
    mask is applied per batch. Approximate — recall vs ann_brute_topk is
    asserted in tests."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cent = _train_centroids(sf_dir)
    df = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").head(n_queries)
    qids = df["vec_id"].tolist()
    qmat = _norm_rows(np.vstack(df["embedding"].to_numpy())
                      .astype(np.float64))
    nprobe = min(nprobe, len(cent))
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    shared = ray.put((qids, qmat, qcells, cent))

    class IVFScorer:
        def __init__(self):
            import ray as _ray
            self.qids, self.q, self.qcells, self.cent = _ray.get(shared)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"].to_numpy()
            mat = _norm_rows(np.vstack(
                batch["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64))
            cells = np.argmax(mat @ self.cent.T, axis=1)
            out = {"query_id": [], "vec_id": [], "score": []}
            for j, qid in enumerate(self.qids):
                mask = np.isin(cells, self.qcells[j])
                if not mask.any():
                    continue
                col = mat[mask] @ self.q[j]
                ids = vec_ids[mask]
                sel = np.argsort(-col)[:k]
                out["query_id"].extend([qid] * len(sel))
                out["vec_id"].extend(ids[sel].tolist())
                out["score"].extend(col[sel].tolist())
            return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                             "vec_id": pa.array(out["vec_id"], pa.int64()),
                             "score": pa.array(out["score"], pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(IVFScorer, batch_format="pyarrow",
                             batch_size=1024, concurrency=_pool_size(concurrency))
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")
