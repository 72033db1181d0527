"""Maximal duplicate-span extents vs brute force."""

from collections import Counter

import numpy as np

SF = "/root/testdata/sf0.001"


def _tok(text):
    from lucene_kmp_ray.analysis.standard import tokenize
    return tokenize(text)


def _brute_extents(corpus_texts, L):
    grams = Counter()
    per_doc = []
    for text in corpus_texts:
        toks = _tok(text)
        gs = [" ".join(toks[i:i + L]) for i in range(len(toks) - L + 1)]
        per_doc.append(gs)
        grams.update(gs)
    out = []
    for doc_id, gs in enumerate(per_doc):
        ps = [i for i, g in enumerate(gs) if grams[g] >= 2]
        start = prev = None
        for p in ps:
            if start is None:
                start = prev = p
            elif p <= prev + L:
                prev = p
            else:
                out.append((doc_id, start, prev + L))
                start = prev = p
        if start is not None:
            out.append((doc_id, start, prev + L))
    return sorted(out)


def test_dup_span_extents_match_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.pipelines.scrub import DUP_GRAM_L, dup_span_extents
    got = dup_span_extents(SF).to_pandas()
    want = _brute_extents(corpus_texts, DUP_GRAM_L)
    assert sorted(zip(got["doc_id"], got["start_pos"],
                      got["end_pos"])) == want
    assert want  # the synthetic corpus repeats long spans
    # extents are maximal: all ≥ L tokens and none touch/overlap another
    # extent of the same doc
    by_doc = {}
    for d, s, e in want:
        assert e - s >= DUP_GRAM_L
        by_doc.setdefault(d, []).append((s, e))
    for spans in by_doc.values():
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # merged if touching — so a gap must remain
