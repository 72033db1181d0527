"""Deduplication pipelines for the training-data path.

Scale notes — each documented with its shuffle shape:

- **Exact** dedup: hash-partition on the key (url or content fingerprint),
  keep one winner per group — ``groupby(key).map_groups(head-by-rule)``.
  Shuffle = one all-to-all on the key; per-group work O(group). This is the
  reference's ``updateDocument(term, doc)`` upsert semantics
  (IndexWriter.kt:1641 — delete-by-key + add == keep latest per key).
- **MinHash + LSH** near-dup: per-batch shingle→minhash (vectorized md5-based
  permutation hashes), explode to (band_id, band_hash, doc_id) rows —
  b bands of r rows each — ``groupby(band)`` produces candidate buckets,
  verified with exact shingle-Jaccard. Shuffle moves only b rows per doc.
- **SimHash**: 64-bit weighted-projection signature per doc; near-dups =
  equal bands of the signature (Hamming ≤ 3 via 4-band exact-match trick).
- **n-gram Jaccard**: exact pairwise verification over candidate pairs that
  share at least one shingle — groupby(shingle) → pairs → aggregate
  intersection counts; |A∪B| via per-doc shingle counts broadcast.

Hash functions are md5-derived (stable across Python/numpy/DuckDB) so the
DuckDB oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis.standard import tokenize

N_SHINGLE = 3          # token 3-grams
MINHASH_PERMS = 12     # b=6 bands × r=2 rows
LSH_BANDS = 6
LSH_ROWS = 2


def _shingles(text: str) -> list[str]:
    toks = tokenize(text or "")
    if len(toks) < N_SHINGLE:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + N_SHINGLE])
            for i in range(len(toks) - N_SHINGLE + 1)]


def _md5_hex8(s: str) -> str:
    """First 8 hex chars of md5 — stable across Python and DuckDB
    (``substr(md5(s), 1, 8)``); lexicographic min on the lowercase hex is
    the permutation-min (hex order == numeric order at fixed width)."""
    return hashlib.md5(s.encode()).hexdigest()[:8]


def minhash_signature(text: str) -> list[str]:
    """MinHash: one md5 per distinct shingle; permutation p reads the 8-hex
    window at offset 2p of the digest (overlapping windows of one md5 are
    cheap stand-in permutations — 12× fewer digests than salting the
    shingle per permutation, and the SQL mirror is
    ``min(substr(md5(shingle), 1+2p, 8))``). Lexicographic min on
    fixed-width lowercase hex == numeric min."""
    sh = set(_shingles(text))
    if not sh:
        return ["" for _ in range(MINHASH_PERMS)]
    digests = [hashlib.md5(s.encode()).hexdigest() for s in sh]
    return [min(d[2 * p:2 * p + 8] for d in digests)
            for p in range(MINHASH_PERMS)]


def simhash64(text: str) -> int:
    """64-bit SimHash over shingle md5 hashes with tf weights (one md5 per
    distinct shingle, bit unpacking vectorized across shingles)."""
    from collections import Counter
    tf = Counter(_shingles(text))
    if not tf:
        return 0
    hs = np.array([int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
                   for s in tf], dtype=np.uint64)
    w = np.fromiter(tf.values(), dtype=np.int64, count=len(tf))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)        # (n, 64)
    acc = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    return int("".join("1" if b > 0 else "0" for b in acc[::-1]), 2)


# ---------------------------------------------------------------- exact ----
def dedup_exact(ds, key: str = "fingerprint", order_col: str = "doc_id",
                keep: str = "min"):
    """Keep one row per key: the min/max ``order_col`` winner.

    groupby(key) hash shuffle; winner rule is deterministic so retries are
    idempotent. ``keep='max'`` + order_col='warc_ts' == "latest crawl wins"
    (the updateDocument upsert)."""
    asc = keep == "min"

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, ascending=asc, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(pick, batch_format="pandas")


# ------------------------------------------------------------- minhash ----
def minhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, band, band_hash) rows — LSH_BANDS rows per doc."""
    out_doc, out_band, out_hash = [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(),
                         batch["text"].to_pylist()):
        if not _shingles(text):
            continue  # no shingles → no signature (oracle parity)
        sig = minhash_signature(text)
        for b in range(LSH_BANDS):
            band_vals = sig[b * LSH_ROWS:(b + 1) * LSH_ROWS]
            out_doc.append(did)
            out_band.append(b)
            out_hash.append("-".join(band_vals))
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "band": pa.array(out_band, pa.int64()),
                     "band_hash": pa.array(out_hash, pa.string())})


def minhash_batch_ds(sf_dir: str):
    """(doc_id, band, band_hash) rows as a Dataset (LSH explode stage)."""
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
             .map_batches(minhash_batch, batch_format="pyarrow")


def minhash_candidate_pairs(sf_dir: str):
    """Near-dup candidate pairs (a < b) sharing any LSH band bucket."""
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    bands = ds.map_batches(minhash_batch, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
        return pd.DataFrame({"a": list(a), "b": list(b)})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # dedupe pairs found in multiple bands
    return cand.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ------------------------------------------------------------- simhash ----
def simhash_batch(batch: pa.Table) -> pa.Table:
    sigs = [simhash64(t) for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(np.array(sigs, dtype=np.uint64))})


def simhash_signatures(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
             .map_batches(simhash_batch, batch_format="pyarrow")


# ------------------------------------------------------- ngram jaccard ----
def jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """Exact token-3-gram Jaccard over all pairs sharing a shingle.

    Shuffle = groupby(shingle) then groupby(pair); per-shingle groups are
    candidate generators (head shingles are the skew risk — at scale cap
    bucket size / drop ultra-common shingles, the standard LSH trick; the
    sf-scale exact version keeps everything so the oracle can match).
    Output: (a, b, jaccard) for pairs with jaccard >= threshold.
    """
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_sh = [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            for s in set(_shingles(text)):
                out_doc.append(did)
                out_sh.append(s)
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "shingle": pa.array(out_sh, pa.string())})

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow")

    # per-doc distinct-shingle counts (for |A| + |B|), broadcast to verifiers
    import ray
    sizes_df = rows.groupby("doc_id").count().to_pandas()
    sizes = dict(zip(sizes_df["doc_id"], sizes_df["count()"]))
    sizes_ref = ray.put(sizes)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
        return pd.DataFrame({"a": list(a), "b": list(b)})

    pairs = rows.groupby("shingle").map_groups(bucket_pairs,
                                               batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        sz = _ray.get(sizes_ref)
        a = int(g["a"].iloc[0])
        b = int(g["b"].iloc[0])
        inter = len(g)  # one row per shared shingle
        j = inter / (sz[a] + sz[b] - inter)
        if j >= threshold:
            return pd.DataFrame({"a": [a], "b": [b], "jaccard": [j]})
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    return pairs.groupby(["a", "b"]).map_groups(verify, batch_format="pandas")


# -------------------------------------------------- near-dup clusters ----
def near_dup_clusters(sf_dir: str):
    """Connected components over the MinHash-LSH candidate pairs → one row
    per clustered doc: (doc_id, cluster_id = min doc_id in its component).

    The candidate-pair edge list is SPARSE by construction (LSH emits only
    likely near-dups), so the components run driver-side over the collected
    pairs (union-find) — the standard final step of a web-scale dedup
    pipeline (keep one representative per cluster). At 100 TB, swap the
    driver fold for the large-star/small-star iteration: alternate
    ``groupby(node).min`` label propagation over the (still sparse) edge
    Dataset until no label changes; the output contract is identical.
    Docs in no pair are not emitted (their cluster is themselves).
    """
    import pandas as pd

    pairs = minhash_candidate_pairs(sf_dir).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:  # deterministic: smaller id wins
                parent[rb] = ra
            else:
                parent[ra] = rb
    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame({"doc_id": [n for n, _ in rows],
                         "cluster_id": [c for _, c in rows]})


# ------------------------------------------- embedding-cosine near-dup ----
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95,
                        concurrency: int | None = None):
    """Embedding-cosine near-duplicate pairs: (a, b, cos) for all vector
    pairs with cosine ≥ threshold, a < b.

    Each batch multiplies against the full normalized matrix broadcast once
    via ``ray.put`` (at sf scale the matrix is small; at 100 TB replace the
    broadcast side with LSH/IVF buckets — ``pipelines.ann`` holds both
    bucketing schemes — so each batch multiplies only against its bucket).
    Scores rounded to 6dp: float dot products are summation-order-dependent.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..util.pool import pool_size

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id")
    ids_all = df["vec_id"].to_numpy()
    mat = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    shared = ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            import ray as _ray
            self.ids, self.mat = _ray.get(shared)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy()
            m = np.vstack(batch["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = (m / n) @ self.mat.T              # (batch, all)
            ii, jj = np.nonzero(sims >= threshold)
            a = vid[ii]
            b = self.ids[jj]
            keep = a < b                              # each pair once
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cos_r": pa.array(np.round(sims[ii, jj][keep], 6)),
            })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ds.map_batches(PairFinder, batch_format="pyarrow",
                          batch_size=1024,
                          concurrency=pool_size(concurrency))


def simhash_candidate_pairs(sf_dir: str):
    """SimHash near-dup candidates: the 4-band exact-match trick — two
    64-bit signatures within Hamming distance 3 must agree exactly on at
    least one of four 16-bit bands (pigeonhole). Explode each doc to 4
    (band, band_bits) rows, groupby buckets → pairs, verified by the true
    Hamming distance. Shuffle moves 4 rows per doc.
    """
    import ray.data as rd

    def bands(batch: pa.Table) -> pa.Table:
        sigs = np.array([simhash64(t) for t in batch["text"].to_pylist()],
                        dtype=np.uint64)
        doc = batch["doc_id"].to_numpy()
        out_doc, out_band, out_bits, out_sig = [], [], [], []
        for b in range(4):
            out_doc.append(doc)
            out_band.append(np.full(len(doc), b, dtype=np.int64))
            out_bits.append(((sigs >> np.uint64(16 * b)) &
                             np.uint64(0xFFFF)).astype(np.int64))
            out_sig.append(sigs.astype(np.int64))  # two's-complement carry
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "band": pa.array(np.concatenate(out_band), pa.int64()),
            "band_bits": pa.array(np.concatenate(out_bits), pa.int64()),
            "sig": pa.array(np.concatenate(out_sig), pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = ds.map_batches(bands, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(ids)):
            x = sigs[i] ^ sigs[i + 1:]
            hd = np.array([bin(int(v)).count("1") for v in x])
            hit = np.flatnonzero(hd <= 3)
            for j in hit:
                out["a"].append(int(ids[i]))
                out["b"].append(int(ids[i + 1 + j]))
                out["hamming"].append(int(hd[j]))
        return pd.DataFrame(out)

    cand = rows.groupby(["band", "band_bits"]).map_groups(
        pairs, batch_format="pandas")
    return cand.groupby(["a", "b"]).map_groups(lambda g: g.head(1),
                                               batch_format="pandas")
