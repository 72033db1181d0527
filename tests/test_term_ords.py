"""Term ordinals: TermsOrdEnum + OrdinalMap vs TestOrdsBlockTree.kt
(testBasic, testTwoBlocks-style enum duel, testSeekCeilNotFound) and
TestOrdinalMap semantics. The sorted Parquet term dictionary makes
ord = row offset in the field slice."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.analysis.core import WhitespaceAnalyzer
from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.ords import OrdinalMap, SeekStatus, TermsOrdEnum
from lucene_kmp_ray.index.reader import IndexReader


def _mk_index(tmp_path, texts_by_seg, name="idx"):
    idx = str(tmp_path / name)
    mans, base = [], 0
    for seg, texts in enumerate(texts_by_seg):
        n = len(texts)
        t = pa.table({
            "doc_id": pa.array(range(base, base + n), pa.int64()),
            "url": [f"u{base + i}" for i in range(n)],
            "text": texts,
        })
        mans.append(build_and_write_segment(
            t, seg, idx, analyzer=WhitespaceAnalyzer()))
        base += n
    commit_index(idx, mans)
    return IndexReader(idx)


def test_basic_next_ord_seek(tmp_path, ray_session):
    # TestOrdsBlockTree.testBasic: one doc "a b c"
    r = _mk_index(tmp_path, [["a b c"]])
    te = TermsOrdEnum(r.segment_readers[0])
    assert te.size() == 3

    assert te.next() == "a" and te.ord() == 0
    assert te.next() == "b" and te.ord() == 1
    assert te.next() == "c" and te.ord() == 2
    assert te.next() is None

    assert te.seek_exact("b") and te.ord() == 1
    assert te.seek_exact("a") and te.ord() == 0
    assert te.seek_exact("c") and te.ord() == 2
    assert not te.seek_exact("d")

    te.seek_exact_ord(1)
    assert te.term() == "b"
    te.seek_exact_ord(0)
    assert te.term() == "a"
    te.seek_exact_ord(2)
    assert te.term() == "c"


def test_enum_duel_many_terms(tmp_path, ray_session):
    # testTwoBlocks/testEnum role: 36 single-char terms, random duels
    terms = [chr(97 + i) for i in range(26)] + \
            [f"m{chr(97 + i)}" for i in range(10)]
    r = _mk_index(tmp_path, [[" ".join(terms)]])
    te = TermsOrdEnum(r.segment_readers[0])
    expect = sorted(terms)
    assert te.size() == len(expect)

    for i in reversed(range(len(expect))):
        te.seek_exact_ord(i)
        assert te.ord() == i
        assert te.term() == expect[i]

    rng = np.random.default_rng(42)
    for _ in range(300):
        i = int(rng.integers(len(expect)))
        if rng.random() < 0.5:
            te.seek_exact_ord(i)
            assert te.term() == expect[i]
        else:
            assert te.seek_exact(expect[i])
            assert te.ord() == i


def test_seek_ceil(tmp_path, ray_session):
    # testSeekCeilNotFound: probe below the vocab lands NOT_FOUND on
    # the first term; probes inside land on the next; above → END
    terms = [chr(97 + i) for i in range(10)]  # a..j
    r = _mk_index(tmp_path, [[" ".join(terms)]])
    te = TermsOrdEnum(r.segment_readers[0])

    assert te.seek_ceil('"') == SeekStatus.NOT_FOUND  # 0x22 < 'a'
    assert te.term() == "a" and te.ord() == 0

    assert te.seek_ceil("c") == SeekStatus.FOUND
    assert te.term() == "c" and te.ord() == 2

    assert te.seek_ceil("cc") == SeekStatus.NOT_FOUND
    assert te.term() == "d" and te.ord() == 3

    assert te.seek_ceil("zz") == SeekStatus.END
    assert te.term() is None


def test_unpositioned_contract(tmp_path, ray_session):
    r = _mk_index(tmp_path, [["x y"]])
    te = TermsOrdEnum(r.segment_readers[0])
    assert te.term() is None
    with pytest.raises(ValueError):
        te.ord()
    with pytest.raises(IndexError):
        te.seek_exact_ord(2)
    with pytest.raises(IndexError):
        te.seek_exact_ord(-1)


def test_per_field_ords(tmp_path, ray_session):
    # ords are per-field slices of the (field, term)-sorted dictionary
    idx = str(tmp_path / "pf")
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "url": ["u0"],
        "text": ["pear apple"],
        "title": ["zebra apple"],
    })
    man = build_and_write_segment(t, 0, idx, analyzer=WhitespaceAnalyzer(),
                                  fields=("text", "title"))
    commit_index(idx, [man])
    sr = IndexReader(idx).segment_readers[0]
    text_e = TermsOrdEnum(sr, "text")
    title_e = TermsOrdEnum(sr, "title")
    assert [text_e.next() for _ in range(2)] == ["apple", "pear"]
    assert [title_e.next() for _ in range(2)] == ["apple", "zebra"]
    title_e.seek_exact("zebra")
    assert title_e.ord() == 1  # ord local to the title slice


# -- OrdinalMap ---------------------------------------------------------------

def test_ordinal_map_merges_vocabs(tmp_path, ray_session):
    r = _mk_index(tmp_path, [["banana cherry"],
                             ["apple cherry date"],
                             ["banana elder"]])
    om = OrdinalMap.build(r.segment_readers)
    assert list(om.values) == ["apple", "banana", "cherry",
                               "date", "elder"]
    assert om.value_count == 5

    # per-segment ords → global ords
    assert om.global_ord(0, 0) == 1   # seg0 "banana"
    assert om.global_ord(0, 1) == 2   # seg0 "cherry"
    assert om.global_ord(1, 0) == 0   # seg1 "apple"
    assert om.global_ord(2, 1) == 4   # seg2 "elder"

    # global ords compare like terms (the OrdinalMap invariant)
    for s, g in enumerate(om.global_ords):
        assert (np.diff(g) > 0).all()

    # first segment containing each term
    assert list(om.first_segment) == [1, 0, 0, 1, 2]
    assert list(om.first_segment_ord) == [0, 0, 1, 2, 1]

    # lookup both directions
    for g, term in enumerate(om.values):
        assert om.term_at(g) == term
        assert om.lookup_term(term) == g
    assert om.lookup_term("zzz") == -1


def test_ordinal_map_seek_ceil(tmp_path, ray_session):
    r = _mk_index(tmp_path, [["bb dd"], ["aa cc"]])
    om = OrdinalMap.build(r.segment_readers)
    assert om.seek_ceil("aa") == (SeekStatus.FOUND, 0)
    assert om.seek_ceil("b") == (SeekStatus.NOT_FOUND, 1)
    assert om.seek_ceil("zz") == (SeekStatus.END, 4)


def test_ordinal_map_random_duel(tmp_path, ray_session):
    # TestOrdinalMap role: random per-segment vocabularies, duel the
    # map against a brute-force merged dictionary
    rng = np.random.default_rng(7)
    pool = [f"t{i:03d}" for i in range(60)]
    segs = []
    for _ in range(4):
        k = int(rng.integers(5, 25))
        segs.append([" ".join(sorted(
            rng.choice(pool, size=k, replace=False)))])
    r = _mk_index(tmp_path, segs)
    om = OrdinalMap.build(r.segment_readers)

    brute = sorted({t for s in segs for t in s[0].split()})
    assert list(om.values) == brute
    for si, sr in enumerate(r.segment_readers):
        te = TermsOrdEnum(sr)
        for so in range(te.size()):
            te.seek_exact_ord(so)
            assert om.term_at(om.global_ord(si, so)) == te.term()
