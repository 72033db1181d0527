"""XY planar distance sort — reference vectors.

ref: core/src/commonTest/.../search/TestXYPointDistanceSort.kt
(testDistanceSort, testMissingLast) over XYDocValuesField.newDistanceSort
/ XYPointSortField semantics.
"""
import math

import pyarrow as pa


def _index(tmp_path, xs, ys, name="xy"):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    n = len(xs)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(["spark"] * n, pa.string()),
        "x": pa.array(xs, pa.float32()),
        "y": pa.array(ys, pa.float32())}))
    idx = str(tmp_path / name)
    build_index(ds, idx, segment_size=2, meta_cols=("x", "y"))
    return idx


def _searcher(idx):
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search.searcher import Searcher
    return Searcher(IndexReader(idx))


def _cart(x1, y1, x2, y2):
    # the test-framework's cartesianDistance: double math over floats
    return math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)


def test_distance_sort(ray_session, tmp_path):
    # TestXYPointDistanceSort.kt testDistanceSort exact scenario
    import numpy as np
    ox, oy = 40.7143528, -74.0059731
    pts = [(40.759011, -73.9844722), (40.718266, -74.007819),
           (40.7051157, -74.0088305)]
    idx = _index(tmp_path, [p[0] for p in pts], [p[1] for p in pts])
    td = _searcher(idx).nearest_xy(ox, oy, 3)
    exp = [_cart(float(np.float32(px)), float(np.float32(py)),
                 float(np.float32(ox)), float(np.float32(oy)))
           for px, py in pts]
    # d2 < d3 < d1 in the reference
    assert [h.doc_id for h in td.score_docs] == [1, 2, 0]
    assert [h.score for h in td.score_docs] == [exp[1], exp[2], exp[0]]


def test_missing_last(ray_session, tmp_path):
    ox, oy = 40.7143528, -74.0059731
    idx = _index(tmp_path,
                 [40.718266, None, 40.7051157],
                 [-74.007819, None, -74.0088305], "miss")
    td = _searcher(idx).nearest_xy(ox, oy, 3)
    # doc 1 has no coordinates → POSITIVE_INFINITY, sorts last
    assert [h.doc_id for h in td.score_docs] == [0, 2, 1]
    assert td.score_docs[-1].score == float("inf")
