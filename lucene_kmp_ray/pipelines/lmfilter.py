"""Corpus-statistics language-model filters — the CCNet/DSIR-shaped
quality stages of an LLM pretraining pipeline, each with an exact DuckDB
oracle.

Three operators, all over the ``documents`` table:

- **Bigram-LM rarity scoring** (``lm_bigram_scores`` /
  ``lm_rarity_filter``): train a corpus bigram+unigram count model
  distributedly (per-batch combiner partials → one hash-partitioned sum —
  the exchange moves one row per distinct gram per batch, not per
  occurrence), broadcast the ``count ≥ MIN_COUNT`` gram sets via
  ``ray.put``, then score every doc in one vectorized ``is_in`` pass:
  OOV-token rate and known-bigram rate. This is the integer-exact variant
  of the CCNet wiki-LM perplexity gate: rather than a smoothed float
  log-prob (whose many-term float sum is summation-order-dependent and so
  not oracle-hashable), the score is the rate of model-supported events —
  the same signal the perplexity thresholds act on, bit-reproducible.
  At 100 TB the model side stays bounded: the gram sets are capped at
  the Zipf head (``LM_VOCAB_CAP`` / ``LM_BIGRAM_CAP`` entries by
  (count desc, gram asc)) and the training pass's exchange is over the
  distinct-gram table, not the corpus.

- **DSIR importance weights** (``dsir_weights``): hashed-feature
  importance sampling (Xie et al., "Data Selection for Language Models
  via Importance Resampling", public arXiv 2302.03169). Features are
  md5-bucketed tokens (``N_BUCKETS`` buckets); the target distribution is
  a deterministic 1/8 md5 sample of the corpus standing in for the
  curated target corpus. Per-doc weight = (Σ_b c_db·t_b / Σ t) ÷
  (Σ_b c_db·C_b / Σ C) under the two hashed unigram models — computed
  with integer dot products (exact in any summation order) and a single
  float divide, so the oracle hash-matches. Bucket histograms are 256
  ints: trained in one combiner pass, shipped in the task closure.

- **TF-IDF keyword extraction** (``tfidf_top_terms``): per-doc top-k
  terms by tf·idf, idf = ln((N+1)/(df+1)). Two hash-partitioned
  exchanges: postings → df on the distinct-term table, then per-doc
  top-k on the doc key. The float score is one ln and one multiply (no
  float sums), so it hash-matches the DuckDB mirror exactly — the same
  float-exactness contract the BM25 kernel proved out
  (similarity/bm25.py).

Reference parity note: the reference engine (lucene-kmp) has no corpus
LM; these are the beyond-reference training-data operators the project
brief calls for. The tokenizer is the shared StandardAnalyzer chain
(analysis/standard.py — UAX#29 subset, ref
analysis/common/.../StandardTokenizerImpl.kt), so gram statistics agree
with the index's postings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.standard import tokenize_flat

# Bigram-LM knobs. MIN_COUNT=2: a gram is "known" iff the corpus model
# saw it at least twice (hapax grams carry no LM evidence). The caps are
# the REAL model semantics — the LM is the Zipf head of the gram
# distribution, cut at (count desc, gram asc). They are sized to the
# synthetic corpus (31 distinct terms / ~900 distinct bigrams) so the
# head actually discriminates here; a production web corpus would use
# ~1e6 / ~1e8. The broadcast side stays bounded either way.
LM_MIN_COUNT = 2
LM_VOCAB_CAP = 24
LM_BIGRAM_CAP = 600
# rarity-gate thresholds (the CCNet "head/middle/tail" style cut)
LM_MIN_KNOWN_RATIO = 0.5
LM_MAX_OOV_RATIO = 0.2

# DSIR knobs: md5 bucket count (2 hex chars) and the target-sample rate
# numerator (first 8 hex chars of md5(doc_id) < 0x20000000 == 1/8).
DSIR_BUCKET_HEX = 2
DSIR_N_BUCKETS = 16 ** DSIR_BUCKET_HEX
DSIR_TARGET_HEX_LT = "20000000"

TFIDF_TOP_K = 3


def _read_docs(sf_dir: str, columns: list[str]):
    from .dedup import _read_docs as rd
    return rd(sf_dir, columns)


def _flat_tokens(batch: pa.Table):
    """(doc_lengths, flat lowercased tokens, doc_of) for one batch."""
    dl, flat = tokenize_flat(batch["text"].to_pylist())
    doc_of = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    return dl, flat, doc_of


def _batch_bigrams(flat: pa.Array, doc_of: np.ndarray):
    """Space-joined within-doc bigram strings + their doc index."""
    if len(flat) < 2:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    same = doc_of[1:] == doc_of[:-1]
    idx = np.flatnonzero(same)
    if not len(idx):
        return pa.array([], pa.string()), np.empty(0, np.int64)
    w1 = flat.take(pa.array(idx))
    w2 = flat.take(pa.array(idx + 1))
    grams = pc.binary_join_element_wise(w1, w2, " ")
    return grams, doc_of[idx]


def _partial_counts(arr: pa.Array, kind: str) -> pa.Table:
    """Per-batch combiner: one (kind, gram, n) row per distinct gram."""
    if len(arr) == 0:
        return pa.table({"kind": pa.array([], pa.string()),
                         "gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    enc = arr.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    n = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
    return pa.table({
        "kind": pa.array([kind] * len(enc.dictionary), pa.string()),
        "gram": enc.dictionary,
        "n": pa.array(n),
    })


def _train_gram_model(sf_dir: str, min_count: int, vocab_cap: int,
                      bigram_cap: int):
    """Distributed (kind, gram) → count ≥ min_count, capped per kind at
    the Zipf head by (count desc, gram asc). Returns (vocab,
    known_bigrams) as sorted Python lists — the broadcast small side (at
    100 TB this is the model artifact, MBs, while the corpus streams)."""
    from .dedup import _partition_apply

    def partials(batch: pa.Table) -> pa.Table:
        _, flat, doc_of = _flat_tokens(batch)
        grams, _ = _batch_bigrams(flat, doc_of)
        return pa.concat_tables([_partial_counts(flat, "u"),
                                 _partial_counts(grams, "b")])

    rows = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partials, batch_format="pyarrow")

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["kind", "gram"], sort=False)["n"].sum()
        out = g.reset_index()
        return out[out["n"] >= min_count]

    counts = _partition_apply(rows, ["kind", "gram"], sum_part,
                              key_is_str=True)
    # Model collection: bounded by min_count + cap (the one intentional
    # driver materialization — it IS the model). Cap per kind with the
    # deterministic (n desc, gram asc) order, mirrored in SQL.
    df = counts.to_pandas()
    out = {}
    for kind, cap in (("u", vocab_cap), ("b", bigram_cap)):
        part = df[df["kind"] == kind].sort_values(
            ["n", "gram"], ascending=[False, True], kind="mergesort")
        out[kind] = sorted(part["gram"].head(cap))
    return out["u"], out["b"]


def lm_bigram_scores(sf_dir: str, min_count: int = LM_MIN_COUNT,
                     vocab_cap: int = LM_VOCAB_CAP,
                     bigram_cap: int = LM_BIGRAM_CAP):
    """Per-doc bigram-LM support scores (see module docstring).

    Output: (doc_id, n_tokens, n_oov, n_bigrams, n_known, oov_ratio,
    known_ratio) — ratios are single integer divisions, bit-exact vs the
    DuckDB oracle (oracle.lm_bigram_scores)."""
    import ray

    vocab, known = _train_gram_model(sf_dir, min_count, vocab_cap,
                                     bigram_cap)
    vocab_ref = ray.put(vocab)
    known_ref = ray.put(known)

    class Scorer:
        def __init__(self):
            import ray as _ray
            self.vocab = pa.array(_ray.get(vocab_ref), pa.string())
            self.known = pa.array(_ray.get(known_ref), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            dl, flat, doc_of = _flat_tokens(batch)
            nd = batch.num_rows
            n_tokens = dl.astype(np.int64)
            if len(flat):
                oov = pc.invert(pc.is_in(flat, value_set=self.vocab))
                n_oov = np.bincount(
                    doc_of, weights=oov.to_numpy(zero_copy_only=False),
                    minlength=nd).astype(np.int64)
            else:
                n_oov = np.zeros(nd, np.int64)
            grams, gdoc = _batch_bigrams(flat, doc_of)
            n_bigrams = np.bincount(gdoc, minlength=nd).astype(np.int64)
            if len(grams):
                hit = pc.is_in(grams, value_set=self.known)
                n_known = np.bincount(
                    gdoc, weights=hit.to_numpy(zero_copy_only=False),
                    minlength=nd).astype(np.int64)
            else:
                n_known = np.zeros(nd, np.int64)
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_oov": pa.array(n_oov),
                "n_bigrams": pa.array(n_bigrams),
                "n_known": pa.array(n_known),
                "oov_ratio": pa.array(n_oov / np.maximum(n_tokens, 1)),
                "known_ratio": pa.array(n_known / np.maximum(n_bigrams, 1)),
            })

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(Scorer, batch_format="pyarrow", concurrency=2)


def lm_rarity_filter(sf_dir: str):
    """The gate over lm_bigram_scores: keep docs whose bigram support is
    ≥ LM_MIN_KNOWN_RATIO and OOV rate ≤ LM_MAX_OOV_RATIO (docs with no
    bigrams fail the support bar — single-token pages carry no LM
    evidence). Output: kept (doc_id, n_tokens) rows."""
    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["known_ratio"],
                             pa.scalar(LM_MIN_KNOWN_RATIO)),
            pc.less_equal(batch["oov_ratio"], pa.scalar(LM_MAX_OOV_RATIO)))
        t = batch.filter(keep)
        return t.select(["doc_id", "n_tokens"])

    return lm_bigram_scores(sf_dir).map_batches(
        gate, batch_format="pyarrow")


def _bucket_of_tokens(flat: pa.Array) -> np.ndarray:
    """md5-hex-prefix bucket id per token, hashed once per distinct
    token in the batch (dictionary codes fan the digest back out)."""
    from .dedup import _md5_digests
    if len(flat) == 0:
        return np.empty(0, np.int64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    d = _md5_digests(vocab)
    # first DSIR_BUCKET_HEX hex chars == high nibbles of the first byte(s)
    buckets = np.zeros(len(vocab), dtype=np.int64)
    for i in range(DSIR_BUCKET_HEX):
        nib = (d[:, i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF
        buckets = buckets * 16 + nib.astype(np.int64)
    return buckets[codes]


def _target_mask(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic 1/8 'curated target' sample: first 8 md5 hex chars
    of the doc_id string under DSIR_TARGET_HEX_LT (same device as
    textstats.stratified_sample, so the oracle reproduces it)."""
    from .dedup import _md5_digests
    d = _md5_digests([str(int(x)) for x in doc_ids])
    h = np.ascontiguousarray(d[:, :4]).view(">u4").ravel()
    return h < np.uint32(int(DSIR_TARGET_HEX_LT, 16))


def dsir_weights(sf_dir: str):
    """DSIR hashed-ngram importance weights (see module docstring).

    Output: (doc_id, score_t, score_c, weight): integer feature dot
    products against the target/corpus bucket histograms and the exact
    single-divide importance ratio. Oracle: oracle.dsir_weights."""
    def hist_partial(batch: pa.Table) -> pa.Table:
        dl, flat, doc_of = _flat_tokens(batch)
        b = _bucket_of_tokens(flat)
        tgt = _target_mask(batch["doc_id"].to_numpy())
        n_c = np.bincount(b, minlength=DSIR_N_BUCKETS).astype(np.int64)
        tok_tgt = tgt[doc_of] if len(doc_of) else np.empty(0, bool)
        n_t = np.bincount(b, weights=tok_tgt,
                          minlength=DSIR_N_BUCKETS).astype(np.int64) \
            if len(b) else np.zeros(DSIR_N_BUCKETS, np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(DSIR_N_BUCKETS, dtype=np.int64)),
            "n_t": pa.array(n_t), "n_c": pa.array(n_c),
        })

    hist = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("bucket").sum(["n_t", "n_c"]) \
        .to_pandas()  # O(N_BUCKETS) rows — the model, not the corpus
    t_arr = np.zeros(DSIR_N_BUCKETS, np.int64)
    c_arr = np.zeros(DSIR_N_BUCKETS, np.int64)
    t_arr[hist["bucket"].to_numpy()] = hist["sum(n_t)"].to_numpy()
    c_arr[hist["bucket"].to_numpy()] = hist["sum(n_c)"].to_numpy()
    tot_t = int(t_arr.sum())
    tot_c = int(c_arr.sum())

    # 256 ints ride in the closure — far below broadcast-worthy size.
    def score(batch: pa.Table) -> pa.Table:
        dl, flat, doc_of = _flat_tokens(batch)
        nd = batch.num_rows
        b = _bucket_of_tokens(flat)
        # integer dot products via float64 bincount accumulators: every
        # addend is an int and every partial sum < 2^53, so the float
        # adds are exact in any order (the hash-match contract).
        if len(b):
            score_t = np.bincount(doc_of, weights=t_arr[b].astype(float),
                                  minlength=nd).astype(np.int64)
            score_c = np.bincount(doc_of, weights=c_arr[b].astype(float),
                                  minlength=nd).astype(np.int64)
        else:
            score_t = np.zeros(nd, np.int64)
            score_c = np.zeros(nd, np.int64)
        w = (score_t.astype(np.float64) * float(tot_c)) / \
            (np.maximum(score_c, 1).astype(np.float64) * float(tot_t))
        return pa.table({
            "doc_id": batch["doc_id"],
            "score_t": pa.array(score_t), "score_c": pa.array(score_c),
            "weight": pa.array(w),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K):
    """Per-doc top-k keyword extraction by tf·idf (see module docstring).

    Output: (doc_id, term, rank, tfidf), rank 1-based, ties broken by
    term asc. Oracle: oracle.tfidf_top_terms."""
    from .dedup import _partition_apply

    def postings(batch: pa.Table) -> pa.Table:
        _, flat, doc_of = _flat_tokens(batch)
        ids = batch["doc_id"].to_numpy()
        if not len(flat):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "freq": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        v = len(enc.dictionary)
        key = doc_of * v + codes
        uk, freq = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[uk // v]),
            "term": enc.dictionary.take(pa.array(uk % v)),
            "freq": pa.array(freq.astype(np.int64)),
        })

    rows = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(postings, batch_format="pyarrow")
    n_docs = _read_docs(sf_dir, ["doc_id"]).count()

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["df"] = df.groupby("term")["doc_id"].transform("size") \
            .astype(np.int64)
        return df

    with_df = _partition_apply(rows, ["term"], attach_df, key_is_str=True)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        # one ln + one multiply per row — no float sums (hash contract).
        # ln via math.log per DISTINCT df: numpy's vector log differs
        # from libm (= DuckDB ln) by 1 ulp on some inputs (bm25.py:49
        # learned the same lesson), so hash-exactness needs the scalar.
        import math
        dfv = df["df"].to_numpy()
        uniq, inv = np.unique(dfv, return_inverse=True)
        idf = np.array([math.log((n_docs + 1.0) / (u + 1.0))
                        for u in uniq], dtype=np.float64)[inv] \
            if len(dfv) else np.empty(0, np.float64)
        df = df.assign(tfidf=df["freq"].to_numpy().astype(np.float64) * idf)
        df = df.sort_values(["doc_id", "tfidf", "term"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("doc_id").cumcount() + 1
        out = df[df["rank"] <= k]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(),
            "term": out["term"].to_numpy(),
            "rank": out["rank"].to_numpy().astype(np.int64),
            "tfidf": out["tfidf"].to_numpy(),
        })

    return _partition_apply(with_df, ["doc_id"], topk)
