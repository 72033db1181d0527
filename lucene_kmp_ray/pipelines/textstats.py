"""Text-analysis stages for a training-data pipeline over the documents table.

All are single-pass ``map_batches`` transforms (no shuffle, embarrassingly
parallel — the 100 TB shape is identical to the sf0.01 shape), vectorized on
the batch tokenizer (one flat Arrow token array per batch, per-doc stats via
bincount — no per-token Python). Each has an exact DuckDB oracle in
``lucene_kmp_ray.oracle``:

- token counting (analyzer-identical token count + per-doc unique count)
- quality scoring: length / alnum ratio / stopword ratio / unique ratio /
  mean token length
- language ID: stopword-hit heuristic over five language lists with
  deterministic alphabetical tie-break
- document fingerprinting: md5 of the canonical token stream (the
  deterministic content key used for exact near-canonical dedup)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.standard import tokenize_flat

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


def _flat(batch: pa.Table):
    """(texts, doc_lengths, flat_tokens, doc_of) for one batch."""
    texts = batch["text"].to_pylist()
    dl, flat = tokenize_flat(texts)
    doc_of = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
    return texts, dl, flat, doc_of


def _unique_per_doc(flat: pa.Array, doc_of: np.ndarray, n: int) -> np.ndarray:
    """Per-doc distinct-token counts: dictionary codes + one np.unique."""
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    codes = flat.dictionary_encode().indices.to_numpy().astype(np.int64)
    v = int(codes.max()) + 1
    pairs = np.unique(doc_of * v + codes)
    return np.bincount(pairs // v, minlength=n).astype(np.int64)


def _stop_hits(flat: pa.Array, doc_of: np.ndarray, n: int,
               stop: tuple[str, ...]) -> np.ndarray:
    if len(flat) == 0:
        return np.zeros(n, dtype=np.int64)
    m = pc.is_in(flat, value_set=pa.array(sorted(stop), pa.string()))
    return np.bincount(doc_of, weights=m.to_numpy(zero_copy_only=False),
                       minlength=n).astype(np.int64)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_unique_tokens) via the standard analyzer."""
    _, dl, flat, doc_of = _flat(batch)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(dl, pa.int64()),
        "n_unique_tokens": pa.array(_unique_per_doc(flat, doc_of, len(dl)),
                                    pa.int64()),
    })


# BMP class table for the alnum-or-space ratio. Whitespace is RE2's ASCII
# \s = [\t\n\f\r ] — NOT Python str.isspace() (which also matches NBSP,
# vertical tab, Unicode separators) — so the count agrees with the DuckDB
# oracle's regexp_replace(text, '[^\pL\pN\s]') on every codepoint.
_ALNUM_LIMIT = 0x10000
_RE2_SPACE = frozenset(b"\t\n\f\r ")
_ALNUM_TABLE: np.ndarray | None = None


def _alnum_table() -> np.ndarray:
    global _ALNUM_TABLE
    if _ALNUM_TABLE is None:
        t = np.frombuffer(bytes(
            1 if (chr(c).isalnum() or c in _RE2_SPACE) else 0
            for c in range(_ALNUM_LIMIT)), dtype=np.uint8).copy()
        t = np.append(t, 0)  # sentinel slot for astral (handled separately)
        _ALNUM_TABLE = t
    return _ALNUM_TABLE


def _alnum_counts(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    table = _alnum_table()
    for i, t in enumerate(texts):
        t = t or ""
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        over = cps >= _ALNUM_LIMIT
        c = int(table[np.minimum(cps, _ALNUM_LIMIT)].sum())
        if over.any():  # rare astral chars: per-char fallback
            c += sum(1 for ch in t if ord(ch) >= _ALNUM_LIMIT
                     and ch.isalnum())
        out[i] = c
    return out


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: n_chars, n_tokens, alnum ratio, stopword ratio,
    unique-token ratio, mean token length."""
    texts, dl, flat, doc_of = _flat(batch)
    n = len(dl)
    n_chars = np.array([len(t or "") for t in texts], dtype=np.int64)
    alnum = _alnum_counts(texts)
    n_uniq = _unique_per_doc(flat, doc_of, n)
    n_stop = _stop_hits(flat, doc_of, n, EN_STOPWORDS)
    tlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        if len(flat) else np.empty(0, np.int64)
    tok_chars = np.bincount(doc_of, weights=tlens, minlength=n) \
        .astype(np.int64)
    denom_t = np.maximum(dl, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(dl, pa.int64()),
        "alnum_ratio": pa.array(alnum / np.maximum(n_chars, 1)),
        "stopword_ratio": pa.array(n_stop / denom_t),
        "unique_ratio": pa.array(n_uniq / denom_t),
        "mean_token_len": pa.array(tok_chars / denom_t),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-hit language ID: lang = argmax over per-language stopword
    token hits; ties → alphabetically-first language; zero hits → 'und'."""
    _, dl, flat, doc_of = _flat(batch)
    n = len(dl)
    langs = sorted(LANG_STOPWORDS)
    hits = np.stack([_stop_hits(flat, doc_of, n, LANG_STOPWORDS[lang])
                     for lang in langs], axis=1)  # (n, n_langs)
    best = hits.max(axis=1)
    pred = np.asarray(langs, dtype=object)[np.argmax(hits, axis=1)]
    pred[best == 0] = "und"
    return pa.table({
        "doc_id": batch["doc_id"],
        "pred_lang": pa.array(pred, pa.string()),
        "stopword_hits": pa.array(best, pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Canonical content fingerprint: md5 of ' '.join(tokens) — whitespace/
    punctuation-insensitive exact-dup key (DuckDB: md5(array_to_string(...)))."""
    dl, flat = tokenize_flat(batch["text"].to_pylist())  # no doc_of needed
    offsets = np.concatenate([[0], np.cumsum(dl)]).astype(np.int32)
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), flat), " ").to_pylist()
    fps = [hashlib.md5((s or "").encode()).hexdigest() for s in joined]
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


def _synth_cjk_text(doc_ids):
    """Deterministic CJK text per doc_id (no external data; mirrored
    bit-for-bit by oracle.token_counts_cjk): an UNSPACED Han run (per-char
    segmentation test), a Katakana run, a Latin word, one Hiragana char."""
    out = []
    for d in doc_ids:
        d = int(d)
        han = "".join(chr(0x4E00 + (d * 7 + i) % 512)
                      for i in range(d % 5 + 3))
        kata = "".join(chr(0x30A2 + (d + i) % 20) for i in range(4))
        hira = chr(0x3042 + d % 10)
        out.append(f"{han} {kata} doc {hira}")
    return out


def token_counts_cjk(sf_dir: str):
    """Token counts over deterministic CJK documents — proves the
    per-ideograph/Hiragana-single/Katakana-run segmentation end-to-end
    (StandardTokenizerImpl.kt grammar; conformance vectors in
    tests/test_analysis.py)."""
    import pyarrow as pa

    from ..analysis.standard import StandardAnalyzer

    analyzer = StandardAnalyzer()

    def counts(batch: pa.Table) -> pa.Table:
        texts = _synth_cjk_text(batch["doc_id"].to_numpy())
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            key = doc_of * max(len(dict_arr.dictionary), 1) + codes
            urow = np.unique(key) // max(len(dict_arr.dictionary), 1)
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
        })

    return _docs_ds(sf_dir).map_batches(counts, batch_format="pyarrow")


def cjk_bigram_counts(sf_dir: str):
    """CJK BIGRAM token counts over the same deterministic CJK documents —
    the CJKAnalyzer/CJKBigramFilter chain end-to-end (Han/Katakana runs →
    overlapping bigrams, isolated Hiragana → unigram; conformance vectors
    in tests/test_german_analyzer.py). Oracle: oracle.cjk_bigram_counts."""
    import pyarrow as pa

    from ..analysis.cjk import CJKAnalyzer

    analyzer = CJKAnalyzer()

    def counts(batch: pa.Table) -> pa.Table:
        texts = _synth_cjk_text(batch["doc_id"].to_numpy())
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            key = doc_of * max(len(dict_arr.dictionary), 1) + codes
            urow = np.unique(key) // max(len(dict_arr.dictionary), 1)
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
        })

    return _docs_ds(sf_dir).map_batches(counts, batch_format="pyarrow")


# ------------------- training-pipeline composition ops ---------------------
N_PROBE_DOCS = 5  # the simulated "benchmark/test set": first N docs


def contamination_screen(sf_dir: str):
    """Benchmark-decontamination screen: fraction of each doc's distinct
    token 3-grams that appear in the probe set (the shingles of the first
    ``N_PROBE_DOCS`` docs, simulating a held-out test set). The probe set
    is the SMALL side: built once, broadcast via ``ray.put``, checked with
    one vectorized ``is_in`` per batch — at 100 TB the probe side is a
    benchmark corpus (MBs), never the training corpus.

    Output: (doc_id, n_shingles, n_contaminated, contamination_r).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .dedup import _batch_shingles, _read_docs

    probe_t = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .sort_by("doc_id").slice(0, N_PROBE_DOCS)
    prow, pcode, _, uniq = _batch_shingles(probe_t["text"])
    probe = sorted({uniq[c] for c in pcode})
    probe_ref = ray.put(probe)

    class Screen:
        def __init__(self):
            import ray as _ray
            self.probe = pa.array(_ray.get(probe_ref), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows, codes, _, u = _batch_shingles(batch["text"])
            n = batch.num_rows
            nsh = np.bincount(rows, minlength=n).astype(np.int64) \
                if len(rows) else np.zeros(n, np.int64)
            hit_code = pc.is_in(pa.array(u, pa.string()),
                                value_set=self.probe) \
                .to_numpy(zero_copy_only=False) if u else \
                np.zeros(0, bool)
            ncon = np.bincount(rows, weights=hit_code[codes],
                               minlength=n).astype(np.int64) \
                if len(rows) else np.zeros(n, np.int64)
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(nsh),
                "n_contaminated": pa.array(ncon),
                "contamination_r": pa.array(
                    np.round(ncon / np.maximum(nsh, 1), 6)),
            })

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(Screen, batch_format="pyarrow", concurrency=2)


SAMPLE_RATES = {"en": 0.75, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.25}


def stratified_sample(sf_dir: str, rates: dict[str, float] | None = None):
    """Deterministic per-language stratified sampling: keep a doc iff the
    first 8 hex chars of md5(doc_id) fall under the language's rate
    threshold — a pure function of the row, so retries are idempotent, no
    RNG state, and the SQL oracle reproduces the exact selection
    (``substr(md5(...), 1, 8) < printf('%08x', rate * 2^32)``). The
    standard down-sampling step of a multi-lingual training mix.
    Output: kept (doc_id, lang) rows.
    """
    import ray.data as rd

    rates = rates or SAMPLE_RATES

    def pick(batch: pa.Table) -> pa.Table:
        from .dedup import _md5_digests
        ids = batch["doc_id"].to_numpy()
        langs = batch["lang"].to_pylist()
        # one digest matrix per batch (md5 itself is per-string, but the
        # hex parse / int conversion is vectorized): first 4 digest bytes
        # big-endian == int(hexdigest[:8], 16)
        d = _md5_digests([str(int(x)) for x in ids])
        h = np.ascontiguousarray(d[:, :4]).view(">u4").ravel() \
            .astype(np.uint64)
        thr = np.array([int(rates.get(lg, 0.0) * 2**32) for lg in langs],
                       dtype=np.uint64)
        keep = h < thr
        return pa.table({
            "doc_id": batch["doc_id"].filter(pa.array(keep)),
            "lang": batch["lang"].filter(pa.array(keep)),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"]) \
        .map_batches(pick, batch_format="pyarrow")


# quality-gate thresholds (the C4/Gopher-style rule-based filter shape)
QF_MIN_TOKENS = 10
QF_MIN_ALNUM = 0.8
QF_MIN_UNIQUE = 0.1


def quality_filter(sf_dir: str):
    """Rule-based quality gate composing the scored signals (the C4-style
    filter chain of a pretraining pipeline): keep docs with ≥ QF_MIN_TOKENS
    tokens, alnum ratio ≥ QF_MIN_ALNUM, unique-token ratio ≥ QF_MIN_UNIQUE,
    and a recognized language. One fused single-pass map (the signals
    compute per batch; nothing materializes). Output: (doc_id, kept,
    reject_reason) for every doc — auditable filtering, not silent drops.
    """
    import ray.data as rd

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        lid = langid_batch(batch)
        n_tok = q["n_tokens"].to_numpy()
        alnum = q["alnum_ratio"].to_numpy()
        uniq = q["unique_ratio"].to_numpy()
        lang = np.asarray(lid["pred_lang"].to_pylist(), dtype=object)
        reason = np.full(batch.num_rows, "", dtype=object)
        reason[uniq < QF_MIN_UNIQUE] = "low_unique"
        reason[alnum < QF_MIN_ALNUM] = "low_alnum"
        reason[lang == "und"] = "no_lang"
        reason[n_tok < QF_MIN_TOKENS] = "too_short"
        return pa.table({
            "doc_id": batch["doc_id"],
            "kept": pa.array(reason == ""),
            "reject_reason": pa.array(reason, pa.string()),
        })

    return _docs_ds(sf_dir).map_batches(gate, batch_format="pyarrow")


# ------------------------------- filter-analyzer demonstration entries ----
ACCENT_WORDS = ("café", "naïve", "résumé", "jalapeño", "über", "èspresso")


def ascii_fold_tokens(sf_dir: str):
    """Deterministic accented text per doc → ASCIIFoldingAnalyzer tokens
    (doc_id, pos, term). Oracle: strip_accents over the same embedded
    word list (oracle.ascii_fold_tokens)."""
    from ..analysis.filters import ASCIIFoldingAnalyzer

    analyzer = ASCIIFoldingAnalyzer()

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = [" ".join(ACCENT_WORDS[(int(d) + i) % len(ACCENT_WORDS)]
                          for i in range(3)) for d in ids]
        dl, flat, doc_of, pos = analyzer.analyze_flat(texts)
        return pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "pos": pa.array(pos.astype(np.int64)),
            "term": flat,
        })

    return _docs_ds(sf_dir).map_batches(rows, batch_format="pyarrow")


WDGF_WORDS = ("PowerShot", "Wi-Fi", "SD500", "O'Neil's", "j2se",
              "SuperDuperXL500", "TransAM", "iPhone", "half-time",
              "XY-ZZ-Top", "McKinley", "data2text", "A's", "501st",
              "beta-max", "basic-split")


def word_delimiter_tokens(sf_dir: str):
    """Deterministic product-code-style text per doc →
    WordDelimiterAnalyzer tokens (doc_id, pos, term): delimiter / case /
    letter-digit splits + possessive stemming, default WDGF flags.
    Oracle: oracle.word_delimiter_tokens (regexp-cascade mirror)."""
    from ..analysis.worddelim import WordDelimiterAnalyzer

    analyzer = WordDelimiterAnalyzer()

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = [" ".join(WDGF_WORDS[(int(d) + i) % len(WDGF_WORDS)]
                          for i in range(3)) for d in ids]
        dl, flat, doc_of, pos = analyzer.analyze_flat(texts)
        return pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "pos": pa.array(pos.astype(np.int64)),
            "term": flat,
        })

    return _docs_ds(sf_dir).map_batches(rows, batch_format="pyarrow")


def shingle_counts(sf_dir: str):
    """Per-doc token counts through ShingleAnalyzer (unigrams + word
    2-shingles, ShingleFilter defaults). Oracle: oracle.shingle_counts."""
    from ..analysis.filters import ShingleAnalyzer

    analyzer = ShingleAnalyzer()

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            nc = max(len(dict_arr.dictionary), 1)
            urow = np.unique(doc_of * nc + codes) // nc
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
        })

    from .dedup import _read_docs
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(counts, batch_format="pyarrow")


def common_grams_counts(sf_dir: str):
    """Per-doc token counts through CommonGramsAnalyzer (unigrams plus
    stop-word-adjacent '_' bigrams). Oracle: oracle.common_grams_counts."""
    from ..analysis.filters import CommonGramsAnalyzer

    analyzer = CommonGramsAnalyzer()

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            nc = max(len(dict_arr.dictionary), 1)
            urow = np.unique(doc_of * nc + codes) // nc
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
        })

    from .dedup import _read_docs
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(counts, batch_format="pyarrow")


def pattern_token_counts(sf_dir: str):
    """Per-doc token counts through PatternTokenizerAnalyzer in SPLIT
    mode on non-alphanumerics (the classic "split on \\W+" config).
    Oracle: oracle.pattern_token_counts."""
    from ..analysis.filters import PatternTokenizerAnalyzer

    analyzer = PatternTokenizerAnalyzer(r"[^0-9A-Za-z]+", group=-1)

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            nc = max(len(dict_arr.dictionary), 1)
            urow = np.unique(doc_of * nc + codes) // nc
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
        })

    from .dedup import _read_docs
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(counts, batch_format="pyarrow")


def reverse_token_counts(sf_dir: str):
    """Per-doc token counts through ReverseStringAnalyzer (every term
    reversed with the U+0001 leading marker — the leading-wildcard
    index shape). Oracle: oracle.reverse_token_counts."""
    from ..analysis.filters import ReverseStringAnalyzer

    analyzer = ReverseStringAnalyzer(marker="\u0001")

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl, flat, doc_of, _ = analyzer.analyze_flat(texts)
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        nuniq = np.zeros(batch.num_rows, dtype=np.int64)
        if len(codes):
            nc = max(len(dict_arr.dictionary), 1)
            urow = np.unique(doc_of * nc + codes) // nc
            nuniq = np.bincount(urow, minlength=batch.num_rows)
        # also surface a stable content hash of each doc's FIRST
        # reversed term so the oracle checks values, not just counts
        firsts = [None] * batch.num_rows
        for t, d in zip(dict_arr.dictionary.take(
                pa.array(codes)).to_pylist() if len(codes) else [],
                doc_of.tolist()):
            if firsts[d] is None:
                firsts[d] = t
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_unique_tokens": pa.array(nuniq.astype(np.int64)),
            "first_term": pa.array(firsts, pa.string()),
        })

    from .dedup import _read_docs
    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(counts, batch_format="pyarrow")


def url_email_tokens(sf_dir: str):
    """Deterministic URL/email-bearing text per doc → UAX29URLEmailAnalyzer
    tokens as (doc_id, pos, term). The chunk set exercises every decision
    path: scheme-less URL with port+path, a TLD-vs-not pair
    (example.ph URL vs index.php ALPHANUM vs index2.php split), an email,
    and plain words. Oracle: oracle.url_email_tokens — the SAME
    classification run as anchored RE2 per whitespace chunk."""
    from ..analysis.urlemail import UAX29URLEmailAnalyzer

    analyzer = UAX29URLEmailAnalyzer()

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = []
        for d in ids:
            d = int(d)
            c3 = ("index.php", "index2.php", "example.ph", "the")[d % 4]
            texts.append(
                f"visit example{d % 7}.com:80{d % 9}/p{d % 5} {c3} "
                f"user{d % 11}@MAIL{d % 3}.org now")
        dl, flat, doc_of, pos = analyzer.analyze_flat(texts)
        return pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "pos": pa.array(pos.astype(np.int64)),
            "term": flat,
        })

    return _docs_ds(sf_dir).map_batches(rows, batch_format="pyarrow")


def core_analyzer_counts(sf_dir: str, which: str):
    """(doc_id, n_tokens, n_unique_tokens) under a core analyzer
    (``analysis/core.py``: 'whitespace' = Character.isWhitespace split,
    no case fold; 'simple' = lowercased letter runs). Exact SQL mirrors
    in ``oracle.core_token_counts`` share the regex classes."""
    from ..analysis import core as core_mod

    cls = {"whitespace": core_mod.WhitespaceAnalyzer,
           "simple": core_mod.SimpleAnalyzer}[which]

    def batch(b: pa.Table) -> pa.Table:
        analyzer = cls()
        lengths, flat, doc_of, _pos = analyzer.analyze_flat(
            b["text"].to_pylist())
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(lengths, pa.int64()),
            "n_unique_tokens": pa.array(
                _unique_per_doc(flat, doc_of, len(lengths)), pa.int64()),
        })

    return _docs_ds(sf_dir).map_batches(batch, batch_format="pyarrow")


# GPT-2-style pre-tokenizer, restricted to the RE2-compatible subset so
# Python re (engine) and DuckDB regexp_extract_all (oracle) match the
# same spans: contractions, optionally-space-prefixed letter runs, digit
# runs, punctuation runs, whitespace runs. RE2 has no lookahead, so the
# original's trailing-space rule \s+(?!\S) is folded into plain \s+.
BPE_PRETOKEN_PATTERN = \
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_token_counts(sf_dir: str):
    """Global (token, n) counts through the BPE-ish pre-tokenizer — the
    token-budget estimator of an LLM-data pipeline (space-prefixed word
    pieces, the GPT-2 convention). Per-batch Counter partials (combiner)
    then one small hash-partitioned sum: the exchange moves one row per
    DISTINCT (batch, token), not per occurrence.
    Oracle: oracle.bpe_token_counts — same regex under RE2."""
    import re
    from collections import Counter

    import pandas as pd

    from .dedup import _partition_apply, _read_docs

    rx = re.compile(BPE_PRETOKEN_PATTERN)

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(rx.findall(text or ""))
        toks = list(c.keys())
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[t] for t in toks], pa.int64()),
        })

    rows = _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow")

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["n"].sum()
        return pd.DataFrame({"token": g.index.to_numpy(),
                             "n": g.to_numpy().astype(np.int64)})

    return _partition_apply(rows, ["token"], sum_part, key_is_str=True)
