"""Randomized MultiTermQuery differential (the TestFuzzyQuery /
TestWildcard random-vocabulary strategy, SURVEY §5): engine match sets
for prefix / range / wildcard / regexp / fuzzy expansions over a
collision-rich vocabulary must equal an independent naive evaluation
(re.fullmatch, string compares, full O(nm) Levenshtein DP)."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_kmp_ray.analysis import tokenize

# near-collision vocabulary: shared prefixes, 1-edit neighbors, length
# variety — the shapes that break automata/banding logic
ROOTS = ["spark", "spork", "stark", "shark", "sparks", "par", "park",
         "parks", "parse", "apache", "appache", "scan", "scam", "scans",
         "batch", "botch", "match", "latch", "join", "jain", "joins",
         "window", "widow", "shadow", "a", "ab", "abc", "abcd"]
VOCAB = sorted(set(ROOTS + [f"term{i:02d}" for i in range(20)] +
                   [f"tern{i:02d}" for i in range(0, 20, 3)]))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def env(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher

    rng = np.random.default_rng(99)
    vocab = np.array(VOCAB, dtype=object)
    texts = [" ".join(vocab[rng.integers(0, len(vocab),
                                         int(rng.integers(2, 30)))])
             for _ in range(250)]
    idx = str(tmp_path_factory.mktemp("idx") / "mt")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts)}))
    build_index(ds, idx, segment_size=64)
    toks = [set(tokenize(t)) for t in texts]
    return Searcher(IndexReader(idx)), toks


def _duel(env, query, term_pred):
    searcher, toks = env
    td = searcher.search(query, k=100_000)
    got = {h.doc_id for h in td.score_docs}
    want = {i for i, tk in enumerate(toks) if any(term_pred(t) for t in tk)}
    assert got == want, query
    assert td.total_hits == len(want)


terms = st.sampled_from(VOCAB)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms, st.integers(0, 4))
def test_prefix_duel(env, t, cut):
    from lucene_kmp_ray.search import PrefixQuery
    p = t[:max(1, len(t) - cut)]
    _duel(env, PrefixQuery(p), lambda c: c.startswith(p))


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms, terms, st.booleans(), st.booleans())
def test_range_duel(env, a, b, inc_lo, inc_hi):
    from lucene_kmp_ray.search import TermRangeQuery
    lo, hi = min(a, b), max(a, b)

    def pred(c):
        lo_ok = c >= lo if inc_lo else c > lo
        hi_ok = c <= hi if inc_hi else c < hi
        return lo_ok and hi_ok
    _duel(env, TermRangeQuery(lo, hi, inc_lo, inc_hi), pred)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms, st.lists(st.tuples(st.integers(0, 9),
                                 st.sampled_from("*?")), max_size=3))
def test_wildcard_duel(env, t, edits):
    from lucene_kmp_ray.search import WildcardQuery
    chars = list(t)
    for pos, wc in edits:
        if pos < len(chars):
            chars[pos] = wc
    pat = "".join(chars)
    rx = re.compile("".join(".*" if c == "*" else "." if c == "?"
                            else re.escape(c) for c in pat))
    _duel(env, WildcardQuery(pat), lambda c: rx.fullmatch(c) is not None)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms, st.sampled_from(["{t}.*", ".*{t}", "{t}[0-9]*",
                               "({t}|spark)", "{t}.?"]))
def test_regexp_duel(env, t, shape):
    from lucene_kmp_ray.search import RegexpQuery
    pat = shape.format(t=re.escape(t))
    rx = re.compile(pat)
    _duel(env, RegexpQuery(pat), lambda c: rx.fullmatch(c) is not None)


@st.composite
def fuzzy_targets(draw):
    """A vocab term mutated by 0-2 random edits (sub/ins/del) — often a
    non-vocab string with several 1-2-edit vocabulary neighbors."""
    t = list(draw(terms))
    for _ in range(draw(st.integers(0, 2))):
        op = draw(st.sampled_from(["sub", "ins", "del"]))
        i = draw(st.integers(0, max(0, len(t) - 1)))
        ch = draw(st.sampled_from("aps"))
        if op == "sub" and t:
            t[i] = ch
        elif op == "ins":
            t.insert(i, ch)
        elif op == "del" and len(t) > 1:
            del t[i]
    return "".join(t)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fuzzy_targets(), st.integers(0, 2), st.integers(0, 2))
def test_fuzzy_duel(env, target, max_edits, prefix_len):
    from lucene_kmp_ray.search import FuzzyQuery
    pre = target[:prefix_len]

    def pred(c):
        return c.startswith(pre) and _lev(target, c) <= max_edits
    _duel(env, FuzzyQuery(target, max_edits=max_edits,
                          prefix_length=prefix_len), pred)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(terms, min_size=1, max_size=6))
def test_term_in_set_duel(env, ts):
    from lucene_kmp_ray.search import TermInSetQuery
    s = set(ts)
    _duel(env, TermInSetQuery(tuple(sorted(s))), lambda c: c in s)
