"""Highlighter + MoreLikeThis entries vs brute force."""

import math
from collections import Counter

SF = "/root/testdata/sf0.001"


def _tok(text):
    from lucene_kmp_ray.analysis.standard import tokenize
    return tokenize(text)


def test_snippets_match_brute(ray_session, corpus_texts):
    from lucene_kmp_ray.search.highlight import (HL_BEFORE, HL_WIDTH,
                                                 snippets_for_docs)
    want_ids = [0, 7, 49, 123]
    got = snippets_for_docs(SF, want_ids, "spark").to_pandas() \
        .set_index("doc_id")["snippet"].to_dict()
    for doc_id in want_ids:
        toks = _tok(corpus_texts[doc_id])
        if "spark" not in toks:
            assert doc_id not in got
            continue
        p = toks.index("spark")
        start = max(p - HL_BEFORE, 0)
        assert got[doc_id] == " ".join(toks[start:start + HL_WIDTH])
    assert got  # at least one snippet came back


def test_snippet_clamps_at_doc_start(ray_session, corpus_texts):
    """A doc whose first term occurrence is inside the first HL_BEFORE
    tokens must clamp the window to token 0 (the GREATEST(...,1) arm of
    the SQL mirror)."""
    from lucene_kmp_ray.search.highlight import HL_BEFORE, HL_WIDTH, \
        snippets_for_docs
    early = [i for i, t in enumerate(corpus_texts)
             if "spark" in _tok(t)[:HL_BEFORE]]
    assert early, "synthetic corpus should have an early-hit doc"
    got = snippets_for_docs(SF, early[:3], "spark").to_pandas()
    for doc_id, snip in zip(got["doc_id"], got["snippet"]):
        assert snip == " ".join(_tok(corpus_texts[doc_id])[:HL_WIDTH])


def test_mlt_excludes_seed_and_ranks_by_fold(ray_session, corpus_texts):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    got = E.queries()["mlt_top10"](SF)
    assert len(got) == 10
    assert (got["doc_id"] != 0).all()
    # seed terms brute: doc 0's tf, corpus df, tf*ln((N+1)/(df+1))
    n = len(corpus_texts)
    df = Counter()
    for t in corpus_texts:
        df.update(set(_tok(t)))
    tf = Counter(_tok(corpus_texts[0]))
    seed = sorted(((t, c * math.log((n + 1.0) / (df[t] + 1.0)))
                   for t, c in tf.items()), key=lambda x: (-x[1], x[0]))[:3]
    seed_terms = [t for t, _ in seed]
    # every returned doc must contain at least one seed term, and the
    # scores must be non-increasing with doc_id tie-break
    rows = list(zip(got["doc_id"], got["score"]))
    assert rows == sorted(rows, key=lambda r: (-r[1], r[0]))
    for doc_id, _ in rows:
        assert set(seed_terms) & set(_tok(corpus_texts[int(doc_id)]))
