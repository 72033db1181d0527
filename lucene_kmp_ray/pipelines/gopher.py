"""Gopher-style repetition signals + quality gate over the documents table.

Implements the repetition filters of Rae et al. 2021 ("Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", table A1) as
a single-pass ``map_batches`` transform — the shape that matters at
100 TB: no shuffle, vectorized per batch (flat word arrays, np.unique on
packed id-windows for n-grams, bincount per doc), embarrassingly
parallel.

Signals (per document; denominators documented where our accounting is
occurrence-based rather than the paper's char-span coverage):

- ``dup_line_frac``      — 1 − distinct_lines/total_lines ('\\n' lines)
- ``dup_line_char_frac`` — chars in excess duplicate-line occurrences /
  total line chars (Σ (cnt−1)·len over line groups with cnt>1)
- ``top_{2,3,4}gram_char_frac`` — max over word n-grams of
  count·len(ngram)/len(text), restricted to the most-frequent count
  (ties resolved by the larger char product, so the VALUE is
  deterministic without a lexicographic tie-break)
- ``dup_{5,10}gram_frac`` — 1 − distinct/total word n-gram occurrences
  (occurrence-based stand-in for the paper's char-coverage accounting —
  exactly mirrored in SQL)

``gopher_gate`` applies the paper's thresholds (A1) and returns the
surviving (doc_id, url).  Both have exact DuckDB oracles
(``oracle.gopher_repetition`` / ``oracle.gopher_gate``) built from the
same definitions.  Words are ``text.split(' ')`` with empties dropped —
identical to the SQL ``string_split`` mirror by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Rae et al. 2021 table A1 thresholds
GOPHER_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_frac": 0.15,
    "dup_10gram_frac": 0.10,
}

TOP_NS = (2, 3, 4)
DUP_NS = (5, 10)


def _split_flat(col: pa.ChunkedArray | pa.Array, sep: str):
    """Split each row on sep, drop empties; returns (flat values array,
    doc_of, per-doc kept counts)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lst = pc.split_pattern(arr, pattern=sep)
    flat = pc.list_flatten(lst)
    sizes = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    sizes = np.nan_to_num(sizes).astype(np.int64)
    doc_of = np.repeat(np.arange(len(arr), dtype=np.int64), sizes)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    doc_of = doc_of[keep]
    counts = np.bincount(doc_of, minlength=len(arr)).astype(np.int64)
    return flat, doc_of, counts


def _dup_frac(codes: np.ndarray, doc_of: np.ndarray, n_docs: int,
              weights: np.ndarray | None = None):
    """Per-doc (total, distinct, excess_weight) for coded items.

    excess_weight: Σ (cnt−1)·w over groups with cnt>1, where w is the
    per-item weight (all items in a group share the weight value)."""
    total = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    if len(codes) == 0:
        z = np.zeros(n_docs, dtype=np.float64)
        return total, total.copy(), z
    order = np.lexsort((codes, doc_of))
    d, c = doc_of[order], codes[order]
    new_group = np.empty(len(c), dtype=bool)
    new_group[0] = True
    new_group[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    distinct = np.bincount(d[new_group], minlength=n_docs).astype(np.int64)
    if weights is None:
        excess = (total - distinct).astype(np.float64)
    else:
        w = weights[order]
        # weight of every non-first occurrence in its (doc, code) group
        excess = np.bincount(d[~new_group], weights=w[~new_group],
                             minlength=n_docs).astype(np.float64)
    return total, distinct, excess


def _ngram_codes(word_codes: np.ndarray, doc_of: np.ndarray, n: int,
                 word_lens: np.ndarray):
    """Valid word n-gram windows as exact packed codes.

    Returns (codes-as-void, doc_of, char_len) where char_len is the
    n-gram's joined-string length (Σ word lens + n−1)."""
    m = len(word_codes) - n + 1
    if m <= 0:
        return (np.empty(0, dtype="V8"), np.empty(0, np.int64),
                np.empty(0, np.int64))
    win = np.lib.stride_tricks.sliding_window_view(
        word_codes.astype(np.int32), n)
    valid = doc_of[:m] == doc_of[n - 1:]
    win = np.ascontiguousarray(win[valid])
    codes = win.view([(f"f{i}", np.int32) for i in range(n)]).reshape(-1)
    lens_cum = np.concatenate(([0], np.cumsum(word_lens)))
    starts = np.arange(m)[valid]
    char_len = lens_cum[starts + n] - lens_cum[starts] + (n - 1)
    return codes, doc_of[:m][valid], char_len.astype(np.int64)


def _top_ngram_frac(codes, ng_doc, char_len, n_docs: int):
    """Per-doc max(count·len) among the most-frequent n-grams."""
    out = np.zeros(n_docs, dtype=np.float64)
    if len(codes) == 0:
        return out
    uniq, inv = np.unique(codes, return_inverse=True)
    # per-(doc, unique-ngram) counting via packed key
    key = ng_doc * np.int64(len(uniq)) + inv
    ukey, kinv, kcnt = np.unique(key, return_inverse=True,
                                 return_counts=True)
    # char len of the gram for each unique key (take from any occurrence)
    klen = np.zeros(len(ukey), dtype=np.int64)
    klen[kinv] = char_len       # last write wins; all equal per key
    kdoc = (ukey // np.int64(len(uniq))).astype(np.int64)
    product = kcnt * klen
    # restrict to keys whose count equals the doc's max count
    maxcnt = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(maxcnt, kdoc, kcnt)
    at_max = kcnt == maxcnt[kdoc]
    np.maximum.at(out, kdoc[at_max], product[at_max].astype(np.float64))
    return out


def gopher_batch(batch: pa.Table) -> pa.Table:
    n_docs = batch.num_rows
    text = batch["text"]
    tchars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    tchars_safe = np.maximum(tchars, 1.0)

    # ---- lines
    lines, line_doc, _ = _split_flat(text, "\n")
    line_lens = pc.utf8_length(lines).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lcodes = lines.dictionary_encode().indices.to_numpy(
        zero_copy_only=False).astype(np.int64) if len(lines) else \
        np.empty(0, np.int64)
    ltotal, ldistinct, lexcess = _dup_frac(
        lcodes, line_doc, n_docs, weights=line_lens.astype(np.float64))
    ltotal_safe = np.maximum(ltotal, 1)
    lchars = np.bincount(line_doc, weights=line_lens,
                         minlength=n_docs).astype(np.float64)
    lchars_safe = np.maximum(lchars, 1.0)

    # ---- words
    words, word_doc, _ = _split_flat(text, " ")
    if len(words):
        wcodes = words.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        wlens = pc.utf8_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        wcodes = np.empty(0, np.int64)
        wlens = np.empty(0, np.int64)

    cols = {
        "doc_id": batch["doc_id"],
        "dup_line_frac": pa.array(
            np.where(ltotal > 0, 1.0 - ldistinct / ltotal_safe, 0.0),
            pa.float64()),
        "dup_line_char_frac": pa.array(lexcess / lchars_safe, pa.float64()),
    }
    for n in TOP_NS:
        codes, ng_doc, clen = _ngram_codes(wcodes, word_doc, n, wlens)
        frac = _top_ngram_frac(codes, ng_doc, clen, n_docs) / tchars_safe
        cols[f"top_{n}gram_char_frac"] = pa.array(frac, pa.float64())
    for n in DUP_NS:
        codes, ng_doc, _c = _ngram_codes(wcodes, word_doc, n, wlens)
        ids = (np.unique(codes, return_inverse=True)[1]
               if len(codes) else np.empty(0, np.int64))
        total, distinct, _e = _dup_frac(ids.astype(np.int64), ng_doc,
                                        n_docs)
        frac = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1),
                        0.0)
        cols[f"dup_{n}gram_frac"] = pa.array(frac, pa.float64())
    return pa.table(cols)


def _docs_ds(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def gopher_repetition(sf_dir: str):
    """Per-doc Gopher repetition signals (all documents)."""
    return _docs_ds(sf_dir).map_batches(gopher_batch,
                                        batch_format="pyarrow")


def gopher_gate(sf_dir: str):
    """doc_ids passing every Gopher repetition threshold (A1)."""
    sig = gopher_repetition(sf_dir)

    def keep(batch: pa.Table) -> pa.Table:
        mask = np.ones(batch.num_rows, dtype=bool)
        for col, thr in GOPHER_THRESHOLDS.items():
            mask &= batch[col].to_numpy(zero_copy_only=False) <= thr
        return pa.table({"doc_id": batch["doc_id"].filter(pa.array(mask))})

    return sig.map_batches(keep, batch_format="pyarrow")
