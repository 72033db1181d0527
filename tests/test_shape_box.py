"""ShapeBoxQuery — shape-valued docs vs a query box.

Reference surface: ``document/LatLonShapeBoundingBoxQuery.kt`` relation
semantics (ShapeField.QueryRelation INTERSECTS / WITHIN / CONTAINS /
DISJOINT) over the doc-values path (``ShapeDocValues.kt`` /
``BaseShapeDocValuesQuery.kt``). Hand-computed truth over convex AND
concave rings — the parity (crossing-number) and proper-crossing parts
of the kernel only show their teeth on the concave cases.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import Searcher, ShapeBoxQuery

# rings as (lats, lons); box is lat [0, 10], lon [0, 10]
SHAPES = {
    # 0: small square fully inside the box → within + intersects
    0: ([2, 2, 4, 4], [2, 4, 4, 2]),
    # 1: huge diamond containing the whole box → contains + intersects
    1: ([-30, 5, 40, 5], [5, 45, 5, -35]),
    # 2: far-away triangle → disjoint
    2: ([50, 55, 50], [50, 52, 54]),
    # 3: square overlapping the box edge → intersects only
    3: ([5, 5, 15, 15], [5, 15, 15, 5]),
    # 4: concave "C" wrapping the box's right edge from outside: its arms
    #    poke into the box (edge crossings) but no box corner is inside
    4: ([3, 3, 7, 7, 5.5, 5.5, 4.5, 4.5],
        [8, 20, 20, 8, 8, 18, 18, 8]),
    # 5: big concave ring whose notch EXCLUDES one box corner: corners
    #    (0,0),(0,10),(10,10) inside, (10,0) sits in the notch → not
    #    contains, still intersects
    5: ([-5, -5, 15, 15, 8, 15],
        [-5, 15, 15, 3, -1, -5]),
}
BOX = dict(min_lat=0.0, max_lat=10.0, min_lon=0.0, max_lon=10.0)
EXPECT = {
    "intersects": [0, 1, 3, 4, 5],
    "within": [0],
    "contains": [1],
    "disjoint": [2],
}


@pytest.fixture(scope="module")
def shape_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("shapes") / "idx")
    n = len(SHAPES)
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": [f"u{i}" for i in range(n)],
        "text": ["shape doc"] * n,
        "ring_lats": pa.array([list(map(float, SHAPES[i][0]))
                               for i in range(n)],
                              pa.list_(pa.float64())),
        "ring_lons": pa.array([list(map(float, SHAPES[i][1]))
                               for i in range(n)],
                              pa.list_(pa.float64())),
    })
    man = build_and_write_segment(docs, 0, idx,
                                  meta_cols=("ring_lats", "ring_lons"))
    commit_index(idx, [man])
    return idx


@pytest.mark.parametrize("relation", list(EXPECT))
def test_shape_box_relations(shape_index, relation):
    s = Searcher(IndexReader(shape_index))
    q = ShapeBoxQuery("ring_lats", "ring_lons", relation=relation, **BOX)
    td = s.search(q, k=100)
    assert sorted(h.doc_id for h in td.score_docs) == EXPECT[relation]


def test_shape_box_brute_differential(tmp_path):
    """Randomized differential vs a brute per-doc reference (shapely-free:
    dense point sampling decides intersects; vertex checks decide within;
    corner checks + sampling decide contains)."""
    rng = np.random.default_rng(11)
    n = 80
    rings = []
    for i in range(n):
        k = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(1, 12, k)
        cy, cx = rng.uniform(-20, 20), rng.uniform(-20, 20)
        rings.append((cy + r * np.sin(ang), cx + r * np.cos(ang)))
    idx = str(tmp_path / "idx")
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": [f"u{i}" for i in range(n)],
        "text": ["x"] * n,
        "ring_lats": pa.array([list(map(float, a)) for a, _ in rings],
                              pa.list_(pa.float64())),
        "ring_lons": pa.array([list(map(float, b)) for _, b in rings],
                              pa.list_(pa.float64())),
    })
    man = build_and_write_segment(docs, 0, idx,
                                  meta_cols=("ring_lats", "ring_lons"))
    commit_index(idx, [man])
    s = Searcher(IndexReader(idx))

    def pip(py, px, ys, xs):  # crossing-number point-in-polygon
        inside = False
        k = len(ys)
        for i in range(k):
            y1, x1 = ys[i], xs[i]
            y2, x2 = ys[(i + 1) % k], xs[(i + 1) % k]
            if (y1 > py) != (y2 > py) and \
                    px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                inside = not inside
        return inside

    box = dict(min_lat=-6.0, max_lat=7.0, min_lon=-5.0, max_lon=8.0)
    g = np.linspace(0, 1, 25)
    for relation in ("within", "disjoint", "intersects", "contains"):
        q = ShapeBoxQuery("ring_lats", "ring_lons", relation=relation,
                          **box)
        got = sorted(h.doc_id for h in s.search(q, k=1000).score_docs)
        want = []
        for i, (ys, xs) in enumerate(rings):
            vin = (ys >= box["min_lat"]) & (ys <= box["max_lat"]) & \
                  (xs >= box["min_lon"]) & (xs <= box["max_lon"])
            # brute intersects: any vertex in box, or any box-perimeter /
            # box-interior sample point inside the ring
            corners_in = [pip(py, px, ys, xs)
                          for py in (box["min_lat"], box["max_lat"])
                          for px in (box["min_lon"], box["max_lon"])]
            grid_y = box["min_lat"] + g * (box["max_lat"] - box["min_lat"])
            grid_x = box["min_lon"] + g * (box["max_lon"] - box["min_lon"])
            samp_in = any(pip(py, px, ys, xs)
                          for py in grid_y for px in grid_x)
            inter = vin.any() or any(corners_in) or samp_in
            if relation == "within":
                ok = vin.all()
            elif relation == "disjoint":
                ok = not inter
            elif relation == "intersects":
                ok = inter
            else:  # contains: all corners + every boundary sample inside
                edge_pts = [(py, px) for px in grid_x
                            for py in (box["min_lat"], box["max_lat"])] + \
                           [(py, px) for py in grid_y
                            for px in (box["min_lon"], box["max_lon"])]
                ok = all(corners_in) and \
                    all(pip(py, px, ys, xs) for py, px in edge_pts)
            if ok:
                want.append(i)
        assert got == want, relation


# ---- ShapePolygonQuery (LatLonShapeQuery with Polygon geometry) ----

def test_shape_polygon_equals_box_for_rectangle_ring(shape_index):
    """A rectangular query ring must reproduce ShapeBoxQuery exactly —
    the generic ring-ring kernel degenerates to the box kernel."""
    from lucene_kmp_ray.search import ShapePolygonQuery

    s = Searcher(IndexReader(shape_index))
    rect = ((BOX["min_lat"], BOX["min_lon"]), (BOX["min_lat"], BOX["max_lon"]),
            (BOX["max_lat"], BOX["max_lon"]), (BOX["max_lat"], BOX["min_lon"]))
    for rel in EXPECT:
        got = sorted(h.doc_id for h in s.search(
            ShapePolygonQuery("ring_lats", "ring_lons", rect, relation=rel),
            k=100).score_docs)
        assert got == EXPECT[rel], rel


def test_shape_polygon_concave_query(shape_index):
    """Concave query ring (an L): doc 0 (square at lat 2-4, lon 2-4) sits
    in the L's lower arm → within; doc 3 (square 5-15 × 5-15) pokes into
    the notch region boundary → intersects, not within."""
    from lucene_kmp_ray.search import ShapePolygonQuery

    s = Searcher(IndexReader(shape_index))
    # L-shape: big square [0,12]² minus the upper-right quadrant
    ell = ((0, 0), (0, 12), (6, 12), (6, 6), (12, 6), (12, 0))
    got = {rel: sorted(h.doc_id for h in s.search(
        ShapePolygonQuery("ring_lats", "ring_lons", ell, relation=rel),
        k=100).score_docs) for rel in ("intersects", "within", "disjoint")}
    assert 0 in got["within"]
    assert 3 in got["intersects"] and 3 not in got["within"]
    # doc 4's arms live at lon 8-20, lat 3-7: crosses the L's lon=12 edge
    assert 4 in got["intersects"]
    assert 2 in got["disjoint"]


def test_shape_relations_properties(tmp_path):
    """Property (hypothesis): for random diamonds vs random boxes —
    within ⊆ intersects, contains ⊆ intersects, disjoint = complement of
    intersects, and the engine agrees with exact L1 arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(-20, 20), st.integers(-20, 20),
           st.integers(1, 15), st.integers(2, 18), st.integers(2, 18))
    def run(by, bx, w_seed, bh, bw):
        import tempfile
        d = np.arange(40)
        clat = ((d * 11 + w_seed) % 60 - 30).astype(np.float64)
        clon = ((d * 13 + w_seed * 3) % 60 - 30).astype(np.float64)
        w = (1.0 + (d * 7 + w_seed) % 12)
        box = dict(min_lat=by + 0.3, max_lat=by + bh + 0.3,
                   min_lon=bx + 0.4, max_lon=bx + bw + 0.4)
        lats = np.stack([clat - w, clat, clat + w, clat], axis=1)
        lons = np.stack([clon, clon + w, clon, clon - w], axis=1)
        idx = tempfile.mkdtemp()
        docs = pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "url": [f"u{i}" for i in range(40)],
            "text": ["x"] * 40,
            "ring_lats": pa.array(lats.tolist(), pa.list_(pa.float64())),
            "ring_lons": pa.array(lons.tolist(), pa.list_(pa.float64())),
        })
        man = build_and_write_segment(docs, 0, idx,
                                      meta_cols=("ring_lats", "ring_lons"))
        commit_index(idx, [man])
        s = Searcher(IndexReader(idx))
        got = {}
        for rel in ("intersects", "within", "contains", "disjoint"):
            q = ShapeBoxQuery("ring_lats", "ring_lons", relation=rel, **box)
            got[rel] = set(h.doc_id for h in s.search(q, k=100).score_docs)
        # exact L1 reference
        dy = np.maximum(0, np.maximum(box["min_lat"] - clat,
                                      clat - box["max_lat"]))
        dx = np.maximum(0, np.maximum(box["min_lon"] - clon,
                                      clon - box["max_lon"]))
        inter = set(np.flatnonzero(dy + dx <= w).tolist())
        within = set(np.flatnonzero(
            (clat - w >= box["min_lat"]) & (clat + w <= box["max_lat"]) &
            (clon - w >= box["min_lon"]) & (clon + w <= box["max_lon"])
        ).tolist())
        fy = np.maximum(np.abs(box["min_lat"] - clat),
                        np.abs(box["max_lat"] - clat))
        fx = np.maximum(np.abs(box["min_lon"] - clon),
                        np.abs(box["max_lon"] - clon))
        contains = set(np.flatnonzero(fy + fx <= w).tolist())
        assert got["intersects"] == inter
        assert got["within"] == within
        assert got["contains"] == contains
        assert got["disjoint"] == set(range(40)) - inter
        assert got["within"] <= got["intersects"]
        assert got["contains"] <= got["intersects"]

    run()
