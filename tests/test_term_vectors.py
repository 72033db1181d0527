"""Term vectors — the per-doc transpose of the inverted index.

Reference surface: ``index/TermVectors.kt`` / ``TermVectorsConsumerPerField
.kt`` (terms per doc in BytesRef order with freq + positions) and the
BaseTermVectorsFormatTestCase scenarios exercised by
``codecs/simpletext/TestSimpleTextTermVectorsFormat.kt`` (testHighFreqs,
testRandom, testMerge, testMergeWithDeletes, testPostingsEnumFreqs/
Positions). Re-expressed: a doc_id-sorted Parquet sidecar written by
``store_term_vectors=True`` and read back through row-group-pruned point
gets (SegmentReader.term_vectors / IndexReader.term_vectors).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import (TVECTORS_FILE,
                                         build_and_write_segment,
                                         build_term_vectors,
                                         term_vectors_of)
from lucene_kmp_ray.index.reader import IndexReader


def _docs(texts, base=0, extra_cols=None):
    n = len(texts)
    t = {
        "doc_id": pa.array(range(base, base + n), pa.int64()),
        "url": [f"u{base + i}" for i in range(n)],
        "text": texts,
    }
    t.update(extra_cols or {})
    return pa.table(t)


def _tv_dict(tv: pa.Table):
    """{(doc_id, field, term): (freq, positions)}"""
    out = {}
    for r in tv.to_pylist():
        out[(r["doc_id"], r["field"], r["term"])] = (r["freq"],
                                                     r["positions"])
    return out


def test_term_vectors_of_basic():
    tv = term_vectors_of(pa.array(["the quick fox the fox", "", "b a b"]),
                         np.array([10, 11, 12]), "text")
    d = _tv_dict(tv)
    # terms per doc in code-point order, freqs = occurrence counts,
    # positions ascending (BaseTermVectorsFormatTestCase's core assert)
    assert d[(10, "text", "the")] == (2, [0, 3])
    assert d[(10, "text", "fox")] == (2, [2, 4])
    assert d[(10, "text", "quick")] == (1, [1])
    assert d[(12, "text", "a")] == (1, [1])
    assert d[(12, "text", "b")] == (2, [0, 2])
    # empty doc contributes no rows; doc-major then term order
    ids = tv["doc_id"].to_pylist()
    assert ids == sorted(ids)
    for did in set(ids):
        terms = [t for i, t in zip(ids, tv["term"].to_pylist()) if i == did]
        assert terms == sorted(terms)


def test_term_vectors_high_freqs():
    # testHighFreqs role: one term repeated many times in one doc
    text = " ".join(["spam"] * 500 + ["eggs"])
    tv = term_vectors_of(pa.array([text]), np.array([0]), "text")
    d = _tv_dict(tv)
    assert d[(0, "text", "spam")] == (500, list(range(500)))
    assert d[(0, "text", "eggs")] == (1, [500])


def test_term_vectors_match_inverted_index(tmp_path):
    """The transpose invariant (testRandom role): regrouping the term
    vectors by term must equal the postings of every term."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 60)))
             for _ in range(64)]
    docs = _docs(texts)
    idx = str(tmp_path / "idx")
    man = build_and_write_segment(docs, 0, idx, store_term_vectors=True)
    commit_index(idx, [man])
    r = IndexReader(idx)
    sr = r.segment_readers[0]
    tv = r.term_vectors(range(64), field="text")
    d = _tv_dict(tv)
    terms = sorted({t for (_, _, t) in d})
    for t in terms:
        docs_l, freqs, pos_lists = [], [], []
        for did in range(64):
            hit = d.get((did, "text", t))
            if hit:
                docs_l.append(did)
                freqs.append(hit[0])
                pos_lists.append(hit[1])
        nl, fr, ps = sr.postings(t, positions=True)
        assert nl.tolist() == docs_l
        assert fr.tolist() == freqs
        flat = [p for pl in pos_lists for p in pl]
        assert list(ps) == flat


def test_term_vectors_multi_field(tmp_path):
    docs = _docs(["alpha beta alpha", "gamma"],
                 extra_cols={"title": pa.array(["beta beta", "delta"])})
    tv = build_term_vectors(docs, fields=("text", "title"))
    d = _tv_dict(tv)
    assert d[(0, "text", "alpha")] == (2, [0, 2])
    assert d[(0, "title", "beta")] == (2, [0, 1])
    assert d[(1, "title", "delta")] == (1, [0])
    # (doc, field, term) ordering of the concatenated table
    keys = list(zip(tv["doc_id"].to_pylist(), tv["field"].to_pylist(),
                    tv["term"].to_pylist()))
    assert keys == sorted(keys)


def test_reader_point_get_prunes_row_groups(tmp_path):
    """A single-doc get must read only the row group(s) whose doc_id
    stats cover it — the random-access contract at scale."""
    texts = [f"tok{i} common" for i in range(10000)]
    idx = str(tmp_path / "idx")
    man = build_and_write_segment(_docs(texts), 0, idx,
                                  store_term_vectors=True)
    commit_index(idx, [man])
    r = IndexReader(idx)
    sr = r.segment_readers[0]
    path = os.path.join(sr.dir, TVECTORS_FILE)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 2  # the prune is real, not vacuous
    tv = sr.term_vectors([1500])
    d = _tv_dict(tv)
    assert d[(1500, "text", "tok1500")] == (1, [0])
    assert d[(1500, "text", "common")] == (1, [1])
    assert len(d) == 2


def test_index_reader_routes_segments(tmp_path):
    idx = str(tmp_path / "idx")
    m0 = build_and_write_segment(_docs(["a b", "c"], base=0), 0, idx,
                                 store_term_vectors=True)
    m1 = build_and_write_segment(_docs(["d d d", "e"], base=2), 1, idx,
                                 store_term_vectors=True)
    commit_index(idx, [m0, m1])
    r = IndexReader(idx)
    tv = r.term_vectors([0, 2])
    d = _tv_dict(tv)
    assert set(d) == {(0, "text", "a"), (0, "text", "b"), (2, "text", "d")}
    assert d[(2, "text", "d")] == (3, [0, 1, 2])


def test_merge_carries_term_vectors_and_drops_deleted(tmp_path):
    """testMerge + testMergeWithDeletes roles: merged segments keep the
    live docs' vectors (global doc ids are merge-stable) and reclaim the
    deleted docs' rows."""
    from lucene_kmp_ray.index.deletes import delete_by_url
    from lucene_kmp_ray.index.merge import run_merges

    idx = str(tmp_path / "idx")
    m0 = build_and_write_segment(_docs(["a b a", "c"], base=0), 0, idx,
                                 store_term_vectors=True)
    m1 = build_and_write_segment(_docs(["d", "e f"], base=2), 1, idx,
                                 store_term_vectors=True)
    commit_index(idx, [m0, m1])
    delete_by_url(idx, ["u1"])  # doc_id 1 ("c")
    run_merges(idx, merges=[[0, 1]])
    r = IndexReader(idx)
    assert len(r.segment_readers) == 1
    assert r.segment_readers[0].meta.get("term_vectors") is True
    tv = r.term_vectors(range(4))
    d = _tv_dict(tv)
    assert (1, "text", "c") not in d  # reclaimed
    assert d[(0, "text", "a")] == (2, [0, 2])
    assert d[(3, "text", "f")] == (1, [1])


def test_no_sidecar_returns_empty(tmp_path):
    idx = str(tmp_path / "idx")
    man = build_and_write_segment(_docs(["a"]), 0, idx)
    commit_index(idx, [man])
    r = IndexReader(idx)
    tv = r.term_vectors([0])
    assert tv.num_rows == 0
    assert "term" in tv.column_names  # stable empty schema


def test_merge_mixed_tv_presence(tmp_path):
    """addIndexes-style mixed sources: only one side has term vectors —
    the merged segment keeps that side's rows (per-doc FieldType
    variation), and docs from the vector-less side simply have none."""
    from lucene_kmp_ray.index.merge import run_merges

    idx = str(tmp_path / "idx")
    m0 = build_and_write_segment(_docs(["a b"], base=0), 0, idx,
                                 store_term_vectors=True)
    m1 = build_and_write_segment(_docs(["c d"], base=1), 1, idx)
    commit_index(idx, [m0, m1])
    run_merges(idx, merges=[[0, 1]])
    r = IndexReader(idx)
    tv = r.term_vectors([0, 1])
    d = _tv_dict(tv)
    assert set(d) == {(0, "text", "a"), (0, "text", "b")}


def test_term_vectors_property_transpose():
    """Property (hypothesis): for arbitrary token streams, term_vectors_of
    equals a brute Python per-doc Counter+positions transpose."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["a", "b", "ab", "xyz", "Z"])
    doc = st.lists(token, min_size=0, max_size=12)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(docs_tokens):
        texts = pa.array([" ".join(ts) for ts in docs_tokens])

        class WS:  # whitespace analyzer: keeps case, no filtering
            def analyze_flat(self, texts):
                toks = [t.as_py().split() for t in texts]
                lens = np.array([len(t) for t in toks], dtype=np.int64)
                flat = pa.array([x for ts in toks for x in ts],
                                pa.string())
                doc_of = np.repeat(np.arange(len(toks)), lens)
                starts = np.append(0, np.cumsum(lens))[:-1]
                positions = np.arange(int(lens.sum()), dtype=np.int64) - \
                    np.repeat(starts, lens)
                return lens, flat, doc_of, positions

        tv = term_vectors_of(texts, np.arange(len(docs_tokens)), "text",
                             analyzer=WS())
        got = _tv_dict(tv)
        want = {}
        for i, ts in enumerate(docs_tokens):
            by = defaultdict(list)
            for p, t in enumerate(ts):
                by[t].append(p)
            for t, ps in by.items():
                want[(i, "text", t)] = (len(ps), ps)
        assert got == want

    run()


def test_term_vectors_from_entries_matches_reanalysis():
    """The entries-derived TV path (no second analysis pass) must emit
    exactly what the re-analyzing term_vectors_of path emits, including
    position lists, on random multi-doc text."""
    import numpy as np
    import pyarrow as pa

    from lucene_kmp_ray.index.format import (invert_field,
                                             term_vectors_from_entries,
                                             term_vectors_of)
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "spark", "join", "scan", "the"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 40)))
             for _ in range(60)]
    texts[7] = ""          # empty doc
    col = pa.array(texts, pa.string())
    doc_ids = np.arange(1000, 1000 + len(texts))

    ent: dict = {}
    invert_field(col, len(texts), entries_out=ent)
    fast = term_vectors_from_entries(ent, doc_ids, "text")
    slow = term_vectors_of(col, doc_ids, "text")
    assert fast.equals(slow), "entries-derived TV diverges from reanalysis"
