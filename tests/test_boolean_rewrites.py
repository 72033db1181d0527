"""TestBooleanRewrites.kt vectors against search/rewrite.py, plus a
random differential proving rewritten trees rank identically through
the real Searcher."""

import numpy as np
import pytest

from lucene_kmp_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from lucene_kmp_ray.search.rewrite import rewrite_query

M, F, S, N = Occur.MUST, Occur.FILTER, Occur.SHOULD, Occur.MUST_NOT


def bq(*clauses, msm=0):
    return BooleanQuery(tuple(clauses), msm)


def tq(t):
    return TermQuery(t)


def test_one_clause_rewrite_optimization():
    # layers of single SHOULD/MUST wrappers unwrap to the leaf
    expected = tq("foo")
    actual = expected
    for i in range(5):
        actual = bq(((M, S)[i % 2], actual))
    assert rewrite_query(actual) == expected


def test_single_filter_clause():
    q = bq((F, tq("a")))
    r = rewrite_query(q)
    assert r == BoostQuery(ConstantScoreQuery(tq("a")), 0.0)


def test_single_must_match_all():
    q = bq((M, MatchAllDocsQuery()), (F, tq("bar")))
    assert rewrite_query(q) == ConstantScoreQuery(tq("bar"))

    q = bq((M, BoostQuery(MatchAllDocsQuery(), 42.0)), (F, tq("bar")))
    assert rewrite_query(q) == \
        BoostQuery(ConstantScoreQuery(tq("bar")), 42.0)

    q = bq((M, MatchAllDocsQuery()), (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == MatchAllDocsQuery()

    q = bq((M, BoostQuery(MatchAllDocsQuery(), 42.0)),
           (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == BoostQuery(MatchAllDocsQuery(), 42.0)


def test_single_must_match_all_with_should_clauses():
    q = bq((M, MatchAllDocsQuery()), (F, tq("bar")),
           (S, tq("baz")), (S, tq("quux")))
    expected = bq((M, ConstantScoreQuery(tq("bar"))),
                  (S, tq("baz")), (S, tq("quux")))
    assert rewrite_query(q) == expected


def test_deduplicate_must_and_filter():
    q = bq((M, tq("bar")), (F, tq("bar")))
    assert rewrite_query(q) == tq("bar")

    q = bq((M, tq("bar")), (F, tq("bar")), (F, tq("baz")))
    assert rewrite_query(q) == bq((M, tq("bar")), (F, tq("baz")))


def test_convert_should_and_filter_to_must():
    q = bq((S, tq("bar")), (F, tq("bar")))
    assert rewrite_query(q) == tq("bar")

    q = bq((S, tq("bar")), (F, tq("bar")),
           (S, tq("baz")), (S, tq("quz")), msm=2)
    expected = bq((M, tq("bar")), (S, tq("baz")), (S, tq("quz")), msm=1)
    assert rewrite_query(q) == expected


def test_duplicate_must_or_filter_with_must_not():
    q = bq((M, tq("bar")), (M, tq("baz")), (S, tq("bad")),
           (N, tq("bar")))
    assert rewrite_query(q) == MatchNoDocsQuery()

    q = bq((F, tq("bar")), (M, tq("baz")), (S, tq("bad")),
           (N, tq("bar")))
    assert rewrite_query(q) == MatchNoDocsQuery()


def test_match_all_must_not():
    q = bq((M, tq("bar")), (F, tq("baz")), (S, tq("bad")),
           (N, MatchAllDocsQuery()))
    assert rewrite_query(q) == MatchNoDocsQuery()

    q = bq((M, tq("bar")), (F, tq("baz")), (S, tq("bad")),
           (N, tq("bor")), (N, MatchAllDocsQuery()))
    assert rewrite_query(q) == MatchNoDocsQuery()


def test_remove_match_all_filter():
    q = bq((M, tq("bar")), (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == tq("bar")

    q = bq((M, tq("bar")), (M, tq("baz")), (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == bq((M, tq("bar")), (M, tq("baz")))

    q = bq((F, tq("bar")), (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == \
        BoostQuery(ConstantScoreQuery(tq("bar")), 0.0)

    q = bq((F, MatchAllDocsQuery()), (F, MatchAllDocsQuery()))
    assert rewrite_query(q) == \
        BoostQuery(ConstantScoreQuery(MatchAllDocsQuery()), 0.0)


def test_deduplicate_should_clauses():
    q = bq((S, tq("bar")), (S, tq("bar")))
    assert rewrite_query(q) == BoostQuery(tq("bar"), 2.0)

    q = bq((S, tq("bar")), (S, BoostQuery(tq("bar"), 2.0)),
           (S, tq("quux")))
    expected = bq((S, BoostQuery(tq("bar"), 3.0)), (S, tq("quux")))
    assert rewrite_query(q) == expected

    # msm = 2: dedup does NOT apply
    q = bq((S, tq("bar")), (S, tq("bar")), (S, tq("quux")), msm=2)
    assert rewrite_query(q) == q


def test_deduplicate_must_clauses():
    q = bq((M, tq("bar")), (M, tq("bar")))
    assert rewrite_query(q) == BoostQuery(tq("bar"), 2.0)

    q = bq((M, tq("bar")), (M, BoostQuery(tq("bar"), 2.0)),
           (M, tq("quux")))
    expected = bq((M, BoostQuery(tq("bar"), 3.0)), (M, tq("quux")))
    assert rewrite_query(q) == expected


def test_flatten_inner_disjunctions():
    inner = bq((S, tq("bar")), (S, tq("quux")))

    q = bq((S, inner), (S, tq("baz")))
    assert rewrite_query(q) == \
        bq((S, tq("bar")), (S, tq("quux")), (S, tq("baz")))

    q = bq((S, inner), (M, tq("baz")))
    assert rewrite_query(q) == \
        bq((S, tq("bar")), (S, tq("quux")), (M, tq("baz")))

    q = bq((S, inner), (M, tq("baz")), msm=1)
    assert rewrite_query(q) == \
        bq((S, tq("bar")), (S, tq("quux")), (M, tq("baz")), msm=1)

    # outer msm=2 with a single SHOULD clause → impossible → MatchNone
    q = bq((S, inner), (M, tq("baz")), msm=2)
    assert rewrite_query(q) == MatchNoDocsQuery()

    # inner msm=2 is not a pure disjunction → unchanged
    inner2 = bq((S, tq("bar")), (S, tq("quux")), (S, tq("baz")), msm=2)
    q = bq((S, inner2), (S, tq("baz")))
    assert rewrite_query(q) == q


def test_flatten_inner_conjunctions():
    inner = bq((M, tq("bar")), (M, tq("quux")))

    q = bq((M, inner), (F, tq("baz")))
    assert rewrite_query(q) == \
        bq((M, tq("bar")), (M, tq("quux")), (F, tq("baz")))

    q = bq((M, inner), (S, tq("baz")))
    assert rewrite_query(q) == \
        bq((M, tq("bar")), (M, tq("quux")), (S, tq("baz")))


def test_flatten_disjunction_in_must_clause():
    inner = bq((S, tq("bar")), (S, tq("quux")))
    q = bq((M, inner), (F, tq("baz")))
    expected = bq((F, tq("baz")), (S, tq("bar")), (S, tq("quux")),
                  msm=1)
    assert rewrite_query(q) == expected

    inner = bq((S, tq("bar")), (S, tq("quux")), (S, tq("foo")), msm=2)
    q = bq((M, inner), (F, tq("baz")))
    expected = bq((F, tq("baz")), (S, tq("bar")), (S, tq("quux")),
                  (S, tq("foo")), msm=2)
    assert rewrite_query(q) == expected


def test_discard_should_clauses():
    q = ConstantScoreQuery(bq((M, tq("a")), (S, tq("b"))))
    assert rewrite_query(q) == ConstantScoreQuery(tq("a"))

    q = ConstantScoreQuery(bq((M, tq("a")), (S, tq("b")),
                              (F, tq("c"))))
    assert rewrite_query(q) == \
        ConstantScoreQuery(bq((F, tq("a")), (F, tq("c"))))

    # all-SHOULD: nothing to discard
    q = ConstantScoreQuery(bq((S, tq("a")), (S, tq("b"))))
    assert rewrite_query(q) == q

    # MUST_NOT needs the SHOULD as the positive clause
    q = ConstantScoreQuery(bq((S, tq("a")), (N, tq("b"))))
    assert rewrite_query(q) == q

    # msm=1 keeps SHOULD clauses
    q = ConstantScoreQuery(bq((S, tq("a")), (S, tq("b")),
                              (F, tq("c")), msm=1))
    assert rewrite_query(q) == q


def test_match_no_docs_clauses():
    q = bq((S, tq("bar")), (S, MatchNoDocsQuery()))
    assert rewrite_query(q) == tq("bar")

    q = bq((S, tq("bar")), (N, MatchNoDocsQuery()))
    assert rewrite_query(q) == tq("bar")

    q = bq((M, tq("bar")), (M, MatchNoDocsQuery()))
    assert rewrite_query(q) == MatchNoDocsQuery()

    q = bq((M, tq("bar")), (F, MatchNoDocsQuery()))
    assert rewrite_query(q) == MatchNoDocsQuery()


def test_empty_boolean():
    assert rewrite_query(bq()) == MatchNoDocsQuery()


def test_pure_negative_boolean():
    assert rewrite_query(bq((N, tq("bar")))) == MatchNoDocsQuery()


def test_simplify_filter_clauses():
    q = bq((M, tq("bar")), (F, ConstantScoreQuery(tq("baz"))))
    assert rewrite_query(q) == bq((M, tq("bar")), (F, tq("baz")))

    q = bq((F, tq("bar")), (F, ConstantScoreQuery(tq("bar"))))
    assert rewrite_query(q) == \
        BoostQuery(ConstantScoreQuery(tq("bar")), 0.0)


def test_simplify_must_not_clauses():
    q = bq((M, tq("bar")), (N, ConstantScoreQuery(tq("baz"))))
    assert rewrite_query(q) == bq((M, tq("bar")), (N, tq("baz")))


def test_simplify_non_scoring_should_clauses():
    q = ConstantScoreQuery(bq((S, tq("bar")),
                              (S, ConstantScoreQuery(tq("baz")))))
    expected = ConstantScoreQuery(bq((S, tq("bar")), (S, tq("baz"))))
    assert rewrite_query(q) == expected


def test_should_clauses_vs_msm():
    # empty phrase rewrites to MatchNoDocs; SHOULD drop leaves 0 < msm
    q = bq((S, PhraseQuery(())), msm=1)
    assert rewrite_query(q) == MatchNoDocsQuery()

    q = bq((S, PhraseQuery(())), msm=0)
    assert rewrite_query(q) == MatchNoDocsQuery()

    q = bq((S, PhraseQuery(())), (S, PhraseQuery(("a",))), msm=2)
    assert rewrite_query(q) == MatchNoDocsQuery()

    # 2 surviving SHOULDs == msm=2 → both become MUST; a single-term
    # phrase rewrites to the TermQuery
    q = bq((S, PhraseQuery(("b",))), (S, PhraseQuery(("a", "c"))),
           msm=2)
    expected = bq((M, tq("b")), (M, PhraseQuery(("a", "c"))))
    assert rewrite_query(q) == expected


def test_deeply_nested_rewrite():
    # {FILTER {MUST tq1, MUST {MUST tq2, MUST tq3}}} flattens to one
    # constant-score filter conjunction
    deep = bq((M, tq("t1")),
              (M, bq((M, tq("t2")), (M, bq((M, tq("t3")))))))
    q = bq((F, deep))
    r = rewrite_query(q)
    assert isinstance(r, BoostQuery) and r.boost == 0.0
    inner = r.query
    assert isinstance(inner, ConstantScoreQuery)
    flat = inner.query
    assert isinstance(flat, BooleanQuery)
    assert sorted(c.term for _, c in flat.clauses) == ["t1", "t2", "t3"]
    assert all(o is F for o, _ in flat.clauses)


# -- random differential: rewritten trees rank identically -------------------

VOCAB = ["spark", "the", "join", "window", "scan", "batch",
         "shuffle", "stream"]


def _random_tree(rng, depth):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        t = VOCAB[int(rng.integers(len(VOCAB)))]
        leaf = tq(t)
        w = rng.random()
        if w < 0.1:
            return BoostQuery(leaf, float(rng.integers(1, 4)))
        if w < 0.15:
            return ConstantScoreQuery(leaf)
        if w < 0.18:
            return MatchAllDocsQuery()
        if w < 0.2:
            return MatchNoDocsQuery()
        return leaf
    n = int(rng.integers(1, 4))
    occs = [M, F, S, S, N]
    clauses = []
    has_positive = False
    for _ in range(n):
        o = occs[int(rng.integers(len(occs)))]
        if o is not N:
            has_positive = True
        clauses.append((o, _random_tree(rng, depth - 1)))
    if not has_positive:
        clauses.append((S, tq(VOCAB[int(rng.integers(len(VOCAB)))])))
    n_should = sum(o is S for o, _ in clauses)
    msm = int(rng.integers(0, n_should + 1)) if n_should and \
        rng.random() < 0.3 else 0
    return bq(*clauses, msm=msm)


def test_rewrite_preserves_matches_and_scores(built_index):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher

    s = Searcher(IndexReader(built_index))
    rng = np.random.default_rng(20260820)
    n_rewritten = 0
    for _ in range(120):
        q = _random_tree(rng, 3)
        r = rewrite_query(q)
        if r != q:
            n_rewritten += 1
        a = s.search(q, k=50)
        b = s.search(r, k=50)
        assert a.total_hits == b.total_hits, (q, r)
        assert [(h.doc_id, round(h.score, 9)) for h in a.score_docs] == \
               [(h.doc_id, round(h.score, 9)) for h in b.score_docs], (q, r)
    assert n_rewritten > 30  # the generator actually exercises rules
