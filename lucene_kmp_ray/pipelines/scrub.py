"""Corpus-scrub operators for the training-data path.

Three operators a large-scale LLM-data pipeline runs between crawl and
training, each Arrow-vectorized and shuffle-annotated:

- **C4-style duplicate-span scrub** (``c4_span_scrub``): the C4 dataset
  rule — any span that occurs more than once in the corpus keeps its
  FIRST occurrence (global (doc_id, position) order) and every other
  occurrence is scrubbed. The reference unit here is a non-overlapping
  ``SCRUB_WINDOW``-token window (the corpus has no sentence/line breaks;
  C4 used three-sentence spans). Shuffle shape: one all-to-all on the
  span hash (span rows ≈ tokens/W — 10× smaller than the shingle
  exchange MinHash already pays) + one tiny per-doc aggregation; the
  driver holds nothing.
- **Document chunking with overlap** (``chunk_documents``): the
  embedding-prep flat_map — fixed ``CHUNK_TOKENS``-token chunks every
  ``CHUNK_STRIDE`` tokens, last chunk ragged. Embarrassingly parallel:
  zero shuffle, one pass, output rows carry (chunk token count, md5)
  so a downstream embedder is the only consumer of the text itself.
- **Bucketed SemDeDup** (``semdedup_pairs``): SemDeDup (Abbas et al.
  2023) prunes semantic duplicates inside embedding-space clusters. The
  deterministic stand-in for k-means here is signed-random-projection
  bucketing (same fixed-seed planes as pipelines/ann.py): within a
  bucket, a vector is a duplicate iff some SMALLER vec_id in the bucket
  has cosine ≥ threshold; the kept representative is the min such id.
  Shuffle shape: one groupby(bucket); per-bucket work is a dense gram
  matrix, so bucket population is capped (``SEM_MAX_BUCKET``, mirrored
  in SQL) and at real scale the plane count grows with the corpus
  (buckets = 2^planes ≈ n / target_bucket_size).

All hashes are md5 (stable across Python and DuckDB); every operator has
a bit-exact DuckDB mirror in oracle.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.standard import StandardAnalyzer
from ..util.vecs import matrix_from_list_column as _dense
from .ann import _planes
from .dedup import _doc_rows, _partition_apply, _read_docs

SCRUB_WINDOW = 10      # tokens per non-overlapping scrub span
CHUNK_TOKENS = 64      # chunk length (tokens)
CHUNK_STRIDE = 48      # chunk start step => 16-token overlap
SEM_N_PLANES = 4       # 16 buckets at sf scale; grows with corpus size
SEM_THRESHOLD = 0.4    # cosine duplicate threshold (synthetic embeddings
                       # top out at ~0.51; nearest observed gap ≥ 5e-4)
SEM_MAX_BUCKET = 4096  # gram-matrix population cap (mirrored in SQL)


def _md5_list(strings: pa.Array, digits: int = 16) -> np.ndarray:
    """md5-hex prefixes of a batch of strings, one digest per DISTINCT
    value (dictionary-encode first — duplicate spans share the work)."""
    enc = strings.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    dig = np.array([hashlib.md5(s.encode()).hexdigest()[:digits]
                    for s in uniq], dtype=object)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return dig[idx] if len(idx) else dig[:0]


# ------------------------------------------------- C4-style span scrub ----
def _span_rows(batch: pa.Table, window: int) -> pa.Table:
    """One row per doc (win_id = -1, carries n_spans) plus one row per
    non-overlapping ``window``-token span (win_id ≥ 0, carries the span's
    md5-16). ``k`` is the downstream partition key: span rows co-locate by
    span hash, per-doc rows ride under their own unique key (no skew)."""
    doc_ids = batch["doc_id"].to_numpy()
    dl, flat, doc_of, pos = StandardAnalyzer().analyze_flat(
        batch["text"].to_pylist())
    n_spans = (dl // window).astype(np.int64)

    starts = np.flatnonzero((pos % window == 0) &
                            (pos + window <= dl[doc_of]))
    if len(starts):
        cols = [flat.take(pa.array(starts + i, pa.int64()))
                for i in range(window)]
        spans = _md5_list(pc.binary_join_element_wise(*cols, " "))
        sdoc = doc_ids[doc_of[starts]]
        swin = pos[starts] // window
    else:
        spans = np.array([], dtype=object)
        sdoc = swin = np.array([], dtype=np.int64)

    k = np.concatenate([
        np.char.add("d", doc_ids.astype(str)).astype(object),
        np.char.add("s", spans.astype(str)).astype(object)
        if len(spans) else np.array([], dtype=object)])
    return pa.table({
        "k": pa.array(k, pa.string()),
        "doc_id": pa.array(np.concatenate([doc_ids, sdoc]), pa.int64()),
        "win_id": pa.array(np.concatenate(
            [np.full(len(doc_ids), -1, dtype=np.int64), swin]), pa.int64()),
        "n_spans": pa.array(np.concatenate(
            [n_spans, np.zeros(len(sdoc), dtype=np.int64)]), pa.int64()),
    })


def c4_span_scrub(sf_dir: str, window: int = SCRUB_WINDOW):
    """C4 duplicate-span scrub report: per doc, how many spans it has and
    how many are scrubbed (non-first global occurrences of a repeated
    span; first = min (doc_id, win_id)). Two coarse hash-partitioned
    aggregations (see _partition_apply), no driver state.
    Oracle: oracle.c4_span_scrub — identical window/md5/rank arithmetic.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    hint = _doc_rows(sf_dir) * 12  # ~tokens/W span rows + 1 doc row each

    rows = ds.map_batches(lambda b: _span_rows(b, window),
                          batch_format="pyarrow")

    def scrub_part(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["win_id"] < 0]
        out = [pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(),
                             "n_spans": docs["n_spans"].to_numpy(),
                             "n_scrubbed": np.zeros(len(docs), np.int64)})]
        spans = df[df["win_id"] >= 0]
        if len(spans):
            s = spans.sort_values(["k", "doc_id", "win_id"],
                                  kind="mergesort")
            dup = s[s.duplicated("k")]
            if len(dup):
                g = dup.groupby("doc_id", sort=False).size()
                out.append(pd.DataFrame({
                    "doc_id": g.index.to_numpy(),
                    "n_spans": np.zeros(len(g), np.int64),
                    "n_scrubbed": g.to_numpy().astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    partials = _partition_apply(rows, ["k"], scrub_part, key_is_str=True,
                                approx_rows=hint)

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_spans=("n_spans", "sum"), n_scrubbed=("n_scrubbed", "sum"))
        return g.reset_index().astype(np.int64)

    return _partition_apply(partials, ["doc_id"], sum_part,
                            approx_rows=_doc_rows(sf_dir))


# ------------------------------------------------- chunking (flat_map) ----
def _chunk_rows(batch: pa.Table, chunk: int, stride: int) -> pa.Table:
    """Vectorized chunk expansion: starts at 0, stride, 2·stride, …; the
    last chunk begins at the last start < len and may be short (min
    length chunk−stride+1). A zero-token doc yields ONE empty chunk
    (md5 of ''), keeping every doc represented downstream."""
    doc_ids = batch["doc_id"].to_numpy()
    dl, flat, _doc_of, _pos = StandardAnalyzer().analyze_flat(
        batch["text"].to_pylist())
    doc_start = np.append(0, np.cumsum(dl))[:-1]

    n_chunks = np.where(
        dl <= chunk, 1,
        1 + np.ceil((dl - chunk) / stride).astype(np.int64)).astype(np.int64)
    rdoc = np.repeat(np.arange(len(dl)), n_chunks)
    cum = np.append(0, np.cumsum(n_chunks))
    chunk_id = np.arange(cum[-1], dtype=np.int64) - np.repeat(cum[:-1],
                                                              n_chunks)
    cstart = chunk_id * stride
    clen = np.maximum(np.minimum(dl[rdoc] - cstart, chunk), 0)

    # flat take indices for every chunk, as one ranges expansion
    total = int(clen.sum())
    off = np.append(0, np.cumsum(clen))
    idx = (np.arange(total, dtype=np.int64) - np.repeat(off[:-1], clen) +
           np.repeat(doc_start[rdoc] + cstart, clen))
    toks = flat.take(pa.array(idx, pa.int64()))
    lists = pa.ListArray.from_arrays(pa.array(off, pa.int32()), toks)
    joined = pc.binary_join(lists, " ")
    return pa.table({
        "doc_id": pa.array(doc_ids[rdoc], pa.int64()),
        "chunk_id": pa.array(chunk_id, pa.int64()),
        "n_tokens": pa.array(clen.astype(np.int64), pa.int64()),
        "chunk_md5": pa.array(_md5_list(joined, 32), pa.string()),
    })


def chunk_documents(sf_dir: str, chunk: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE):
    """Overlapping-chunk flat_map over the corpus (the embedder feed).
    Zero shuffle; output is (doc_id, chunk_id, n_tokens, chunk_md5).
    Oracle: oracle.chunk_documents — same start/length/md5 arithmetic."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(lambda b: _chunk_rows(b, chunk, stride),
                          batch_format="pyarrow")


# ---------------------------------------------------- bucketed SemDeDup ---
def semdedup_pairs(sf_dir: str, threshold: float = SEM_THRESHOLD,
                   n_planes: int = SEM_N_PLANES,
                   max_bucket: int = SEM_MAX_BUCKET):
    """Bucketed SemDeDup: one row per PRUNED vector — (vec_id, bucket,
    dup_of) where dup_of is the smallest same-bucket vec_id with cosine ≥
    threshold. Buckets are signed random projections (fixed-seed planes
    shared with pipelines/ann.py); per-bucket work is one float64 gram
    matrix, population-capped at ``max_bucket`` (cap mirrored in SQL; at
    sf scale the largest bucket is ~40). Keep-set = all vec_ids not
    emitted. Oracle: oracle.semdedup_pairs."""
    import ray.data as rd

    planes = _planes(64)[:n_planes]
    weights = 1 << np.arange(n_planes)

    def bucketize(b: pa.Table) -> pa.Table:
        mat = _dense(b["embedding"])
        bucket = ((mat @ planes.T) > 0) @ weights
        return b.append_column("bucket",
                               pa.array(bucket.astype(np.int64), pa.int64()))

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "bucket": pd.Series([], dtype=np.int64),
                              "dup_of": pd.Series([], dtype=np.int64)})
        if len(df) < 2 or len(df) > max_bucket:
            return empty
        df = df.sort_values("vec_id", kind="mergesort")
        mat = _dense(df["embedding"])
        nn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        g = np.tril(nn @ nn.T >= threshold, k=-1)
        has = g.any(axis=1)
        if not has.any():
            return empty
        ids = df["vec_id"].to_numpy()
        return pd.DataFrame({
            "vec_id": ids[has],
            "bucket": df["bucket"].to_numpy()[has],
            "dup_of": ids[g.argmax(axis=1)[has]]})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_dups, batch_format="pandas")


# ----------------------------------- maximal duplicate-span extraction ----
DUP_GRAM_L = 8


def _gram_rows(batch: pa.Table, L: int) -> pa.Table:
    """One row per OVERLAPPING L-gram position: (h = md5-16 of the
    space-joined gram, doc_id, p). The gram text never leaves the task —
    only the 16-hex key rides the exchange (collisions are identical on
    both sides of the mirror, so exactness is preserved; a 100-TB run
    would widen to the full 32-hex digest)."""
    doc_ids = batch["doc_id"].to_numpy()
    dl, flat, doc_of, pos = StandardAnalyzer().analyze_flat(
        batch["text"].to_pylist())
    starts = np.flatnonzero(pos + L <= dl[doc_of])
    if len(starts):
        cols = [flat.take(pa.array(starts + i, pa.int64()))
                for i in range(L)]
        h = _md5_list(pc.binary_join_element_wise(*cols, " "))
        gdoc = doc_ids[doc_of[starts]]
        gp = pos[starts].astype(np.int64)
    else:
        h = np.array([], dtype=object)
        gdoc = gp = np.array([], dtype=np.int64)
    return pa.table({"h": pa.array(h, pa.string()),
                     "doc_id": pa.array(gdoc, pa.int64()),
                     "p": pa.array(gp, pa.int64())})


def dup_span_extents(sf_dir: str, L: int = DUP_GRAM_L):
    """Maximal duplicated-substring extents — the suffix-array exact
    substring dedup role (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", arXiv 2107.06499), approximated at gram
    granularity: a token position is *duplicated* iff its overlapping
    L-gram occurs ≥ 2 times in the corpus; per doc, overlapping-or-
    touching duplicated gram intervals [p, p+L) merge into maximal
    extents (the intervals all have length L, so islands break exactly
    where the position gap exceeds L).

    Two coarse hash-partitioned exchanges (gram-hash then doc), rows =
    one per token position — the same O(corpus tokens) exchange shape as
    the C4 scrub, no broadcast set, no driver state. Output: one row per
    maximal extent (doc_id, start_pos, end_pos) with end exclusive.
    Oracle: oracle.dup_span_extents — identical gram/md5/island
    arithmetic via window functions."""
    hint = _doc_rows(sf_dir) * 90  # ~positions per doc

    rows = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(lambda b: _gram_rows(b, L), batch_format="pyarrow")

    def dup_part(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("h", sort=False)["h"].transform("size")
        return df.loc[c >= 2, ["doc_id", "p"]]

    dups = _partition_apply(rows, ["h"], dup_part, key_is_str=True,
                            approx_rows=hint)

    def extents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "p"], kind="mergesort")
        d = df["doc_id"].to_numpy()
        p = df["p"].to_numpy()
        if not len(d):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "start_pos": pd.Series([], dtype=np.int64),
                                 "end_pos": pd.Series([], dtype=np.int64)})
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + L)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:] - 1, len(d) - 1)
        return pd.DataFrame({
            "doc_id": d[starts].astype(np.int64),
            "start_pos": p[starts].astype(np.int64),
            "end_pos": (p[ends] + L).astype(np.int64),
        })

    return _partition_apply(dups, ["doc_id"], extents,
                            approx_rows=_doc_rows(sf_dir))
