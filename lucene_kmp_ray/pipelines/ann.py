"""Approximate-nearest-neighbor search over the embeddings table.

Baseline: brute-force cosine top-k — the query matrix (small) is broadcast
once with ``ray.put``; every batch does one numpy matmul against it and emits
per-batch partial top-k (the combiner), then a tiny groupby(query) merge
picks the global top-k. Shuffle volume = k rows per (query, batch) — never
the embeddings themselves.

Scale paths (the HnswGraphBuilder.kt role, graph tier designed out):

- ``ann_lsh_topk`` — signed-random-projection buckets with MULTI-PROBE
  (each query also probes every bucket within Hamming distance
  ``lsh_probe_hamming`` of its own — flipping 1-2 band bits recovers the
  near-miss buckets that single-bucket LSH loses).
- ``ann_ivf_topk`` — trained coarse quantizer, per-batch cell mask
  (in-stream form: one pass, no index on disk).
- ``ann_ivf_partitioned`` — the REAL 100 TB shape: vectors written once as
  a hive-partitioned ``cell=N/`` Parquet layout, each query batch then
  reads ONLY its probed cells (partition-pruned ``read_parquet`` filter).

Driver-side reads touch only the row groups that can contain the query
ids (Parquet min/max statistics) — never the whole embeddings table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util.pool import pool_size as _pool_size
from ..util.vecs import matrix_from_list_column as _dense


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _load_first_vectors(sf_dir: str, n: int):
    """(vec_ids, matrix) of the vectors with ``vec_id < n`` — the
    deterministic query/train set. Reads ONLY the row groups whose
    vec_id min-statistic admits such an id (row-group pruning via
    ``pq.ParquetFile``), never the full table: at 10^9 vectors this
    touches one row group, not the file."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    ci = pf.schema_arrow.names.index("vec_id")
    md = pf.metadata
    sel = []
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(ci).statistics
        if st is None or not st.has_min_max or st.min < n:
            sel.append(i)
    if not sel:
        return [], np.zeros((0, 1), dtype=np.float64)
    t = pf.read_row_groups(sel, columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < n].sort_values("vec_id")
    qids = df["vec_id"].tolist()
    qmat = np.vstack(df["embedding"].to_numpy()).astype(np.float64) \
        if len(df) else np.zeros((0, 1), dtype=np.float64)
    return qids, qmat


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
        mat = _dense(batch["embedding"])
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
    import ray
    import ray.data as rd

    queries_ref = ray.put(_load_first_vectors(sf_dir, n_queries))

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
LSH_PROBE_HAMMING = 2  # multi-probe radius: own bucket + 1-2 flipped bits


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(42)  # fixed seed → deterministic buckets
    return rng.standard_normal((N_PLANES, dim))


def _probe_buckets(qbuckets: np.ndarray, radius: int) -> list[np.ndarray]:
    """Per query: its bucket plus every bucket within Hamming distance
    ``radius`` (the multi-probe sequence — flipping the least-confident
    band bits; with 8 planes the full radius-2 ring is 37 buckets)."""
    flips = [0]
    if radius >= 1:
        flips += [1 << i for i in range(N_PLANES)]
    if radius >= 2:
        flips += [(1 << i) | (1 << j) for i in range(N_PLANES)
                  for j in range(i + 1, N_PLANES)]
    fl = np.array(flips, dtype=np.int64)
    return [np.unique(b ^ fl) for b in qbuckets]


def ann_lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 probe_hamming: int = LSH_PROBE_HAMMING,
                 concurrency: int | None = None):
    """Signed-random-projection LSH with multi-probe: vectors bucketed by
    sign pattern; each query scores its own bucket plus the Hamming-ring
    neighbors (approximate — recall measured against ann_brute_topk in
    tests)."""
    import ray
    import ray.data as rd

    qids, qmat = _load_first_vectors(sf_dir, n_queries)
    dim = qmat.shape[1]
    planes = _planes(dim)
    qbuckets = ((qmat @ planes.T) > 0) @ (1 << np.arange(N_PLANES))
    probes = _probe_buckets(qbuckets.astype(np.int64), probe_hamming)
    queries_ref = ray.put((qids, qmat, probes))

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = _dense(batch["embedding"])
        b = ((mat @ planes.T) > 0) @ (1 << np.arange(N_PLANES))
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    class BucketScorer:
        def __init__(self):
            import ray as _ray
            self.qids, qmat_, self.probes = _ray.get(queries_ref)
            self.q = _norm_rows(np.asarray(qmat_, dtype=np.float64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"].to_numpy()
            buckets = batch["bucket"].to_numpy()
            mat = _norm_rows(_dense(batch["embedding"]))
            out = {"query_id": [], "vec_id": [], "score": []}
            for j, qid in enumerate(self.qids):
                mask = np.isin(buckets, self.probes[j])
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
# nprobe default tuned for recall@10 >= 0.9 against brute force on the
# synthetic embeddings (near-uniform random — the adversarial case for a
# coarse quantizer; real web embeddings cluster and need far fewer probes)
IVF_NPROBE = 10
IVF_KMEANS_ITERS = 8
IVF_TRAIN_SAMPLE = 2048


def _train_centroids(sf_dir: str, n_cells: int = IVF_CELLS) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a sample (the IVF
    training step — at 100 TB this samples ~1M vectors to the driver or a
    single trainer task; centroids are tiny and broadcast). The sample
    read is row-group-pruned like the query read."""
    _, x = _load_first_vectors(sf_dir, IVF_TRAIN_SAMPLE)
    x = _norm_rows(x)
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


class _IVFScorer:
    """Score a batch against the queries whose probe set admits each
    row's cell (shared by the in-stream and partitioned paths)."""

    def __init__(self, shared_ref, k: int):
        import ray as _ray
        self.qids, self.q, self.qcells, self.cent = _ray.get(shared_ref)
        self.k = k

    def score(self, vec_ids, mat, cells) -> pa.Table:
        out = {"query_id": [], "vec_id": [], "score": []}
        for j, qid in enumerate(self.qids):
            mask = np.isin(cells, self.qcells[j])
            if not mask.any():
                continue
            col = mat[mask] @ self.q[j]
            ids = vec_ids[mask]
            sel = np.argsort(-col)[:self.k]
            out["query_id"].extend([qid] * len(sel))
            out["vec_id"].extend(ids[sel].tolist())
            out["score"].extend(col[sel].tolist())
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "vec_id": pa.array(out["vec_id"], pa.int64()),
                         "score": pa.array(out["score"], pa.float64())})


def _query_cells(sf_dir: str, n_queries: int, nprobe: int):
    cent = _train_centroids(sf_dir)
    qids, qmat = _load_first_vectors(sf_dir, n_queries)
    qmat = _norm_rows(qmat)
    nprobe = min(nprobe, len(cent))
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    return cent, qids, qmat, qcells


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 nprobe: int = IVF_NPROBE, concurrency: int | None = None):
    """IVF, in-stream form: the quantizer assigns every vector to a cell
    per batch (one matmul); each query scores only its ``nprobe`` nearest
    cells. One pass, no index on disk — ``ann_ivf_partitioned`` is the
    layout that avoids even reading unprobed vectors."""
    import ray
    import ray.data as rd

    cent, qids, qmat, qcells = _query_cells(sf_dir, n_queries, nprobe)
    shared = ray.put((qids, qmat, qcells, cent))

    class IVFScorer(_IVFScorer):
        def __init__(self):
            super().__init__(shared, k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"].to_numpy()
            mat = _norm_rows(_dense(batch["embedding"]))
            cells = np.argmax(mat @ self.cent.T, axis=1)
            return self.score(vec_ids, mat, cells)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    partial = ds.map_batches(IVFScorer, batch_format="pyarrow",
                             batch_size=1024, concurrency=_pool_size(concurrency))
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def ann_ivf_build(sf_dir: str, index_dir: str,
                  concurrency: int | None = None) -> np.ndarray:
    """Write the IVF layout: every vector assigned to its cell, stored as
    hive-partitioned Parquet ``index_dir/cell=N/...`` (the ``cell=N/``
    layout the 100 TB deployment queries). Idempotent: an existing
    ``_CENTROIDS.npy`` marker short-circuits (same deterministic quantizer
    → same layout), so a failed run resumes for free."""
    import ray.data as rd

    marker = os.path.join(index_dir, "_CENTROIDS.npy")
    if os.path.exists(marker):
        return np.load(marker)
    cent = _train_centroids(sf_dir)

    def assign(batch: pa.Table) -> pa.Table:
        mat = _norm_rows(_dense(batch["embedding"]))
        cells = np.argmax(mat @ cent.T, axis=1)
        # 'cell' becomes the hive partition key (dropped from the files);
        # 'c' keeps the id readable in-file without re-deriving partitions
        batch = batch.append_column("cell", pa.array(cells, pa.int64()))
        return batch.append_column("c", pa.array(cells, pa.int64()))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # range-shuffle on the cell id before the partitioned write: without
    # it every (input block × cell) pair becomes its own tiny file (.44
    # files/vector observed at sf0.1 — per-file open cost then dominates
    # the probed read). sort() keeps block sizes bounded, so huge cells
    # still split into multiple target-sized files at 100 TB.
    ds.map_batches(assign, batch_format="pyarrow") \
        .sort("cell") \
        .write_parquet(index_dir, partition_cols=["cell"])
    os.makedirs(index_dir, exist_ok=True)
    np.save(marker, cent)
    return cent


def ann_ivf_partitioned(sf_dir: str, n_queries: int = 5, k: int = 10,
                        nprobe: int = IVF_NPROBE,
                        index_dir: str | None = None,
                        concurrency: int | None = None):
    """IVF over the partitioned ``cell=N/`` layout: the scan lists ONLY
    the cell directories some query probes (explicit path-level partition
    pruning) — at 10^9+ vectors per-query work is nprobe/IVF_CELLS of the
    corpus, and unprobed partitions never leave storage. Same output
    contract as ``ann_brute_topk``; recall vs brute is asserted in
    tests."""
    import ray
    import ray.data as rd

    if index_dir is None:
        index_dir = os.path.join(
            "/tmp", "ivf_index",
            os.path.basename(os.path.normpath(sf_dir)) + f"_c{IVF_CELLS}")
    cent = ann_ivf_build(sf_dir, index_dir, concurrency=concurrency)

    qids, qmat = _load_first_vectors(sf_dir, n_queries)
    qmat = _norm_rows(qmat)
    nprobe = min(nprobe, len(cent))
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    shared = ray.put((qids, qmat, qcells, cent))
    probed = sorted(set(int(c) for row in qcells for c in row))

    class CellScorer(_IVFScorer):
        def __init__(self):
            super().__init__(shared, k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"].to_numpy()
            mat = _norm_rows(_dense(batch["embedding"]))
            return self.score(vec_ids, mat, batch["c"].to_numpy())

    # path-level pruning: only probed cell dirs are even listed
    import glob
    paths = [f for c in probed for f in
             sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*")))]
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "c"])
    partial = ds.map_batches(CellScorer, batch_format="pyarrow",
                             batch_size=1024,
                             concurrency=_pool_size(concurrency,
                                                    work_items=len(paths)))
    return partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


# ------------------------------------------------- corpus clustering ------
CLUSTER_K = 8


def cluster_assign(sf_dir: str, k: int = CLUSTER_K):
    """Seeded nearest-centroid corpus clustering — the coarse
    corpus-organization step of a curation pipeline (and the assignment
    half of the IVF trainer above, exposed as a first-class operator).

    Centroids are the vectors with ``vec_id < k`` (the deterministic
    seed set, loaded with the same row-group-pruned read as the query
    sets), broadcast via ``ray.put``; assignment is one vectorized
    cosine matmul per batch with FIRST-max tie-break (np.argmax), so the
    output is pure integers: (vec_id, cluster). Oracle:
    oracle.cluster_assign mirrors the first-argmax with an unrolled
    CASE chain over list_cosine_similarity columns.
    """
    import ray
    import ray.data as rd

    _, cent = _load_first_vectors(sf_dir, k)
    cent_ref = ray.put(_norm_rows(np.asarray(cent, dtype=np.float64)))

    class Assign:
        def __init__(self):
            import ray as _ray
            self.cent = _ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = batch["vec_id"]
            sims = _norm_rows(_dense(batch["embedding"])) @ self.cent.T
            return pa.table({
                "vec_id": vec_ids,
                "cluster": pa.array(np.argmax(sims, axis=1)
                                    .astype(np.int64)),
            })

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .map_batches(Assign, batch_format="pyarrow", batch_size=1024,
                     concurrency=2)


def cluster_sizes(sf_dir: str, k: int = CLUSTER_K):
    """Per-cluster member counts of cluster_assign — the balance check a
    curation pipeline runs before per-cluster sampling. One tiny
    groupby over the assignment stream (k rows out)."""
    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cluster", "n"])

    return cluster_assign(sf_dir, k).groupby("cluster").count() \
        .map_batches(rename, batch_format="pyarrow")
