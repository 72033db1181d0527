"""SortedNumericDocValuesField.newSlowRangeQuery analog.

ref: document/SortedNumericDocValuesField.kt newSlowRangeQuery (ANY
multi-value in range), exercised by TestDocValuesQueries — matches if
any of the doc's values lies in [lower, upper]; docs without values
never match.
"""
import pyarrow as pa


def _index(tmp_path):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    vals = pa.array([[5, 100], [], [50], [1, 2, 3], None],
                    type=pa.list_(pa.int64()))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(["spark"] * 5, pa.string()),
        "vals": vals}))
    idx = str(tmp_path / "snr")
    build_index(ds, idx, segment_size=2, meta_cols=("vals",))
    return idx


def test_any_value_in_range(ray_session, tmp_path):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import (BooleanQuery, Occur,
                                       SortedNumericRangeQuery, TermQuery)
    from lucene_kmp_ray.search.searcher import Searcher

    s = Searcher(IndexReader(_index(tmp_path)))

    def docs(q):
        return sorted(h.doc_id for h in s.search(q, k=100).score_docs)

    # [4, 60]: doc0 via 5, doc2 via 50; doc3's 1-3 all below
    assert docs(SortedNumericRangeQuery("vals", 4, 60)) == [0, 2]
    # open lower bound: anything ≤ 3 → doc3 only
    assert docs(SortedNumericRangeQuery("vals", None, 3)) == [3]
    # open upper: ≥ 100 → doc0 via 100
    assert docs(SortedNumericRangeQuery("vals", 100, None)) == [0]
    # empty / null lists never match even on an unbounded range
    assert docs(SortedNumericRangeQuery("vals", None, None)) == [0, 2, 3]
    # composes in FILTER position (the IndexOrDocValuesQuery pairing)
    q = BooleanQuery.build(
        (Occur.MUST, TermQuery("spark")),
        (Occur.FILTER, SortedNumericRangeQuery("vals", 4, 60)))
    assert docs(q) == [0, 2]


def test_doc_values_set_query(ray_session, tmp_path):
    # SortedNumericDocValuesSetQuery.kt / newSlowSetQuery: ANY value in
    # set; works for numeric and string list columns alike
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import DocValuesSetQuery
    from lucene_kmp_ray.search.searcher import Searcher

    tags = pa.array([["red", "blue"], [], ["green"], ["blue"], None],
                    type=pa.list_(pa.string()))
    nums = pa.array([[1, 9], [4], [], [9], [2]], type=pa.list_(pa.int64()))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(["spark"] * 5, pa.string()),
        "tags": tags, "nums": nums}))
    idx = str(tmp_path / "dvset")
    build_index(ds, idx, segment_size=2, meta_cols=("tags", "nums"))
    s = Searcher(IndexReader(idx))

    def docs(q):
        return sorted(h.doc_id for h in s.search(q, k=100).score_docs)

    assert docs(DocValuesSetQuery("tags", ("blue",))) == [0, 3]
    assert docs(DocValuesSetQuery("tags", ("green", "red"))) == [0, 2]
    assert docs(DocValuesSetQuery("tags", ("violet",))) == []
    assert docs(DocValuesSetQuery("nums", (9, 4))) == [0, 1, 3]


def test_sorted_set_range_query(ray_session, tmp_path):
    # SortedSetDocValuesField.newSlowRangeQuery: ANY string value in the
    # byte range; open/exclusive bounds
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import SortedSetRangeQuery
    from lucene_kmp_ray.search.searcher import Searcher

    tags = pa.array([["apple", "pear"], [], ["banana"], ["cherry"], None],
                    type=pa.list_(pa.string()))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(["spark"] * 5, pa.string()),
        "tags": tags}))
    idx = str(tmp_path / "ssr")
    build_index(ds, idx, segment_size=2, meta_cols=("tags",))
    s = Searcher(IndexReader(idx))

    def docs(q):
        return sorted(h.doc_id for h in s.search(q, k=100).score_docs)

    assert docs(SortedSetRangeQuery("tags", "b", "d")) == [2, 3]
    assert docs(SortedSetRangeQuery("tags", None, "banana")) == [0, 2]
    assert docs(SortedSetRangeQuery("tags", "banana", None,
                                    include_lower=False)) == [0, 3]
    assert docs(SortedSetRangeQuery("tags", None, None)) == [0, 2, 3]


def test_multi_range_field_crosses_is_whole_box(ray_session, tmp_path):
    # RangeFieldQuery.kt CROSSES over numDims=2: whole-box intersects
    # AND NOT whole-box within — a box within in dim1 but crossing in
    # dim2 CROSSES the query (per-dim crosses would miss it)
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import MultiRangeFieldQuery
    from lucene_kmp_ray.search.searcher import Searcher

    # query box: [10,20] x [10,20]
    boxes = [((12, 18), (12, 18)),   # within both dims → within
             ((12, 18), (5, 15)),    # within dim1, crosses dim2 → crosses
             ((0, 5), (12, 18)),     # disjoint dim1 → outside
             ((5, 25), (5, 25)),     # contains both dims → contains+crosses
             ((15, 30), (15, 30))]   # crosses both dims → crosses
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(5)], pa.string()),
        "text": pa.array(["spark"] * 5, pa.string()),
        "alo": pa.array([b[0][0] for b in boxes], pa.int64()),
        "ahi": pa.array([b[0][1] for b in boxes], pa.int64()),
        "blo": pa.array([b[1][0] for b in boxes], pa.int64()),
        "bhi": pa.array([b[1][1] for b in boxes], pa.int64())}))
    idx = str(tmp_path / "mrf")
    build_index(ds, idx, segment_size=2,
                meta_cols=("alo", "ahi", "blo", "bhi"))
    s = Searcher(IndexReader(idx))
    dims = (("alo", "ahi"), ("blo", "bhi"))
    q = ((10, 20), (10, 20))

    def docs(rel):
        td = s.search(MultiRangeFieldQuery(dims, q, rel), k=100)
        return sorted(h.doc_id for h in td.score_docs)

    assert docs("intersects") == [0, 1, 3, 4]
    assert docs("within") == [0]
    assert docs("contains") == [3]
    assert docs("crosses") == [1, 3, 4]
