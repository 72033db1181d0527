"""Corpus-LM filter operators (bigram-LM rarity, DSIR weights, TF-IDF
keywords) vs brute force — the pure-Python single-process reference for
each, plus the float-exactness contracts the oracles rely on."""

import hashlib
import math
from collections import Counter

import numpy as np

SF = "/root/testdata/sf0.001"


def _tok(text):
    from lucene_kmp_ray.analysis.standard import tokenize
    return tokenize(text)


def _brute_grams(corpus_texts):
    uni, bi = Counter(), Counter()
    per_doc = []
    for text in corpus_texts:
        toks = _tok(text)
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc.append((toks, grams))
        uni.update(toks)
        bi.update(grams)
    return uni, bi, per_doc


def _zipf_head(cnt, min_count, cap):
    top = sorted(((g, n) for g, n in cnt.items() if n >= min_count),
                 key=lambda x: (-x[1], x[0]))[:cap]
    return {g for g, _ in top}


def test_lm_bigram_scores_matches_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.lmfilter import (LM_BIGRAM_CAP,
                                                   LM_MIN_COUNT,
                                                   LM_VOCAB_CAP,
                                                   lm_bigram_scores)
    got = lm_bigram_scores(SF).to_pandas().set_index("doc_id").sort_index()
    uni, bi, per_doc = _brute_grams(corpus_texts)
    vocab = _zipf_head(uni, LM_MIN_COUNT, LM_VOCAB_CAP)
    known = _zipf_head(bi, LM_MIN_COUNT, LM_BIGRAM_CAP)
    assert len(got) == len(corpus_texts)
    some_oov = some_unknown = False
    for doc_id, (toks, grams) in enumerate(per_doc):
        row = got.loc[doc_id]
        n_oov = sum(1 for t in toks if t not in vocab)
        n_known = sum(1 for g in grams if g in known)
        assert row["n_tokens"] == len(toks)
        assert row["n_oov"] == n_oov
        assert row["n_bigrams"] == len(grams)
        assert row["n_known"] == n_known
        assert row["oov_ratio"] == n_oov / max(len(toks), 1)
        assert row["known_ratio"] == n_known / max(len(grams), 1)
        some_oov |= n_oov > 0
        some_unknown |= n_known < len(grams)
    assert some_oov and some_unknown  # the model must actually discriminate


def test_lm_rarity_filter_is_the_gate(ray_session):
    from lucene_kmp_ray.pipelines.lmfilter import (LM_MAX_OOV_RATIO,
                                                   LM_MIN_KNOWN_RATIO,
                                                   lm_bigram_scores,
                                                   lm_rarity_filter)
    scores = lm_bigram_scores(SF).to_pandas()
    kept = lm_rarity_filter(SF).to_pandas()
    want = scores[(scores["known_ratio"] >= LM_MIN_KNOWN_RATIO)
                  & (scores["oov_ratio"] <= LM_MAX_OOV_RATIO)]
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    assert 0 < len(kept) < len(scores)  # the gate bites but keeps most


def test_dsir_weights_matches_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.lmfilter import (DSIR_BUCKET_HEX,
                                                   DSIR_TARGET_HEX_LT,
                                                   dsir_weights)
    got = dsir_weights(SF).to_pandas().set_index("doc_id").sort_index()

    def bucket(term):
        return hashlib.md5(term.encode()).hexdigest()[:DSIR_BUCKET_HEX]

    def is_target(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:8] \
            < DSIR_TARGET_HEX_LT

    t_hist, c_hist = Counter(), Counter()
    per_doc = []
    for doc_id, text in enumerate(corpus_texts):
        bks = [bucket(t) for t in _tok(text)]
        per_doc.append(bks)
        c_hist.update(bks)
        if is_target(doc_id):
            t_hist.update(bks)
    tot_t, tot_c = sum(t_hist.values()), sum(c_hist.values())
    assert 0 < tot_t < tot_c
    for doc_id, bks in enumerate(per_doc):
        st = sum(t_hist[b] for b in bks)
        sc = sum(c_hist[b] for b in bks)
        row = got.loc[doc_id]
        assert row["score_t"] == st
        assert row["score_c"] == sc
        assert row["weight"] == (float(st) * float(tot_c)) / \
            (float(max(sc, 1)) * float(tot_t))
    # weights spread around 1.0 (docs resembling the target score higher)
    assert got["weight"].min() < 1.0 < got["weight"].max()


def test_tfidf_top_terms_matches_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.lmfilter import TFIDF_TOP_K, tfidf_top_terms
    got = tfidf_top_terms(SF).to_pandas()
    n = len(corpus_texts)
    df = Counter()
    tfs = []
    for text in corpus_texts:
        tf = Counter(_tok(text))
        tfs.append(tf)
        df.update(tf.keys())
    for doc_id, tf in enumerate(tfs):
        scored = sorted(
            ((t, c * math.log((n + 1.0) / (df[t] + 1.0))) for t, c in
             tf.items()), key=lambda x: (-x[1], x[0]))[:TFIDF_TOP_K]
        sub = got[got["doc_id"] == doc_id].sort_values("rank")
        assert list(sub["term"]) == [t for t, _ in scored]
        assert list(sub["tfidf"]) == [s for _, s in scored]
        assert list(sub["rank"]) == list(range(1, len(scored) + 1))


def test_model_cap_order_is_deterministic(ray_session, corpus_texts):
    """The Zipf-head caps must use the (count desc, gram asc) order the
    SQL mirror states — train with tiny caps and check the kept sets
    are exactly the brute-force top slices."""
    from lucene_kmp_ray.pipelines.lmfilter import _train_gram_model
    cap_u, cap_b = _train_gram_model(SF, 2, 10, 50)
    uni, bi, _ = _brute_grams(corpus_texts)
    assert cap_u == sorted(_zipf_head(uni, 2, 10))
    assert cap_b == sorted(_zipf_head(bi, 2, 50))
