"""Randomized duel (the checkRandomData / TestDuelingCodecs strategy,
SURVEY §5): a seeded random corpus + random queries, engine results
checked float64-identical against an independent brute-force scorer."""
import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.analysis import tokenize
from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import (BooleanQuery, Occur, PhraseQuery,
                                   Searcher, TermQuery)
from lucene_kmp_ray.similarity.bm25 import BM25Similarity
from lucene_kmp_ray.util.smallfloat import LENGTH_TABLE_INT, int_to_byte4_np

N_DOCS = 300
SEED = 1234


def _random_corpus():
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{i}" for i in range(80)] +
                     ["can't", "3.14", "a:b", "x.y", "1,000"], dtype=object)
    texts = []
    for d in range(N_DOCS):
        n = int(rng.integers(1, 60))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
    return texts


@pytest.fixture(scope="module")
def duel(ray_session, tmp_path_factory):
    texts = _random_corpus()
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(N_DOCS), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(N_DOCS)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path_factory.mktemp("duel") / "idx")
    build_index(ds, idx, segment_size=37)  # ragged segment boundaries
    s = Searcher(IndexReader(idx), BM25Similarity(dtype="float64"))
    toks = [tokenize(t) for t in texts]
    return s, toks


def _brute_bm25(toks, terms, mode):
    """Independent float64 BM25 (formula from BM25Similarity.kt:161-198)
    over python token lists; returns {doc: score} of matching docs."""
    tfs = [Counter(t) for t in toks]
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    dln = LENGTH_TABLE_INT[int_to_byte4_np(lens)].astype(np.float64)
    dc = len(toks)
    avgdl = lens.sum() / dc
    out = {}
    per_term = []
    for term in terms:
        df = sum(1 for c in tfs if term in c)
        idf = math.log(1 + (dc - df + 0.5) / (df + 0.5))
        scores = {}
        for d, c in enumerate(tfs):
            if term in c:
                inv = 1.0 / (1.2 * ((1 - 0.75) + 0.75 * dln[d] / avgdl))
                scores[d] = idf - idf / (1 + c[term] * inv)
        per_term.append(scores)
    if mode == "AND":
        docs = set(per_term[0])
        for p in per_term[1:]:
            docs &= set(p)
    else:
        docs = set()
        for p in per_term:
            docs |= set(p)
    for d in docs:
        out[d] = sum(p.get(d, 0.0) for p in per_term)
    return out


def test_random_term_and_bool_duel(duel):
    s, toks = duel
    rng = np.random.default_rng(99)
    vocab = sorted({w for t in toks for w in t})
    for _ in range(25):
        k = int(rng.integers(1, 4))
        terms = [vocab[int(i)] for i in
                 rng.integers(0, len(vocab), k)]
        mode = "AND" if rng.random() < 0.5 else "OR"
        occ = Occur.MUST if mode == "AND" else Occur.SHOULD
        q = TermQuery(terms[0]) if k == 1 else \
            BooleanQuery.build(*[(occ, TermQuery(t)) for t in terms])
        want = _brute_bm25(toks, terms, mode)
        td = s.search(q, k=N_DOCS)
        got = {h.doc_id: h.score for h in td.score_docs}
        assert set(got) == set(want), (terms, mode)
        for d in got:
            assert got[d] == pytest.approx(want[d], rel=1e-12), \
                (terms, mode, d)


def test_random_phrase_duel(duel):
    s, toks = duel
    rng = np.random.default_rng(7)
    for _ in range(15):
        # sample a real bigram from a random doc so matches exist
        d = int(rng.integers(0, len(toks)))
        if len(toks[d]) < 2:
            continue
        i = int(rng.integers(0, len(toks[d]) - 1))
        pair = (toks[d][i], toks[d][i + 1])
        exp = sorted(
            j for j, t in enumerate(toks)
            if any(t[x] == pair[0] and t[x + 1] == pair[1]
                   for x in range(len(t) - 1)))
        td = s.search(PhraseQuery(pair), k=N_DOCS)
        assert sorted(h.doc_id for h in td.score_docs) == exp, pair
