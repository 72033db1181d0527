"""Text-analysis stages for a training-data pipeline over the documents table.

All are single-pass ``map_batches`` transforms (no shuffle, embarrassingly
parallel — the 100 TB shape is identical to the sf0.01 shape). Each has an
exact DuckDB oracle in ``lucene_kmp_ray.oracle``:

- token counting (whitespace-free, analyzer-identical token count)
- quality scoring: length / punctuation ratio / stopword ratio /
  unique-token ratio
- language ID: stopword-hit n-gram heuristic over five language lists with
  deterministic tie-break
- document fingerprinting: md5 of the canonical token stream (the
  deterministic content key used for exact near-canonical dedup)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.standard import tokenize

# Tiny built-in stopword lists (public, common knowledge). Order matters for
# the deterministic argmax tie-break: alphabetical language code.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "人", "这"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_unique_tokens) via the standard analyzer."""
    counts, uniq = [], []
    for t in batch["text"].to_pylist():
        toks = tokenize(t or "")
        counts.append(len(toks))
        uniq.append(len(set(toks)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(counts, pa.int64()),
        "n_unique_tokens": pa.array(uniq, pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: n_chars, n_tokens, alnum ratio, stopword ratio,
    unique-token ratio, mean token length. Vectorized where Arrow kernels
    exist; tokenization reuses the analyzer."""
    texts = batch["text"].to_pylist()
    n_chars = np.array([len(t or "") for t in texts], dtype=np.int64)
    alnum = np.array([sum(c.isalnum() or c.isspace() for c in (t or ""))
                      for t in texts], dtype=np.int64)
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_stop = np.empty(len(texts), dtype=np.int64)
    n_uniq = np.empty(len(texts), dtype=np.int64)
    tok_chars = np.empty(len(texts), dtype=np.int64)
    stop = set(EN_STOPWORDS)
    for i, t in enumerate(texts):
        toks = tokenize(t or "")
        n_tok[i] = len(toks)
        n_stop[i] = sum(1 for x in toks if x in stop)
        n_uniq[i] = len(set(toks))
        tok_chars[i] = sum(len(x) for x in toks)
    denom_t = np.maximum(n_tok, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tok),
        "alnum_ratio": pa.array(alnum / np.maximum(n_chars, 1)),
        "stopword_ratio": pa.array(n_stop / denom_t),
        "unique_ratio": pa.array(n_uniq / denom_t),
        "mean_token_len": pa.array(tok_chars / denom_t),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit language ID: lang = argmax over per-language stopword
    token hits; ties → alphabetically-first language; zero hits → 'und'."""
    langs = sorted(LANG_STOPWORDS)
    sets = {l: set(LANG_STOPWORDS[l]) for l in langs}
    pred, hits = [], []
    for t in batch["text"].to_pylist():
        toks = tokenize(t or "")
        counts = [(sum(1 for x in toks if x in sets[l])) for l in langs]
        best = max(counts)
        if best == 0:
            pred.append("und")
        else:
            pred.append(langs[int(np.argmax(counts))])
        hits.append(best)
    return pa.table({
        "doc_id": batch["doc_id"],
        "pred_lang": pa.array(pred, pa.string()),
        "stopword_hits": pa.array(hits, pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Canonical content fingerprint: md5 of ' '.join(tokens) — whitespace/
    punctuation-insensitive exact-dup key (DuckDB: md5(array_to_string(...)))."""
    fps = [hashlib.md5(" ".join(tokenize(t or "")).encode()).hexdigest()
           for t in batch["text"].to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(fps, pa.string()),
    })


def _docs_ds(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def token_counts(sf_dir: str):
    return _docs_ds(sf_dir).map_batches(token_count_batch, batch_format="pyarrow")


def quality(sf_dir: str):
    return _docs_ds(sf_dir).map_batches(quality_batch, batch_format="pyarrow")


def langid(sf_dir: str):
    return _docs_ds(sf_dir).map_batches(langid_batch, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    return _docs_ds(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")
