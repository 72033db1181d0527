"""ShapeCircleQuery — shape-valued docs vs a query circle (planar).

Reference surface: ``LatLonShapeQuery.kt`` with a Circle geometry /
``geo/Circle2D.kt`` relation machinery over the doc-values path.
Hand-computed truth incl. a concave ring whose notch keeps the circle
center outside, plus a random star-polygon differential against a
brute sampled reference."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import Searcher, ShapeCircleQuery

# circle: center (0, 0), radius 10
CIRCLE = dict(center_lat=0.0, center_lon=0.0, radius=10.0)
SHAPES = {
    # 0: small square near the center → within + intersects
    0: ([-2, -2, 2, 2], [-2, 2, 2, -2]),
    # 1: huge square containing the whole circle → contains + intersects
    1: ([-30, -30, 30, 30], [-30, 30, 30, -30]),
    # 2: far-away triangle → disjoint
    2: ([50, 55, 50], [50, 52, 54]),
    # 3: square straddling the circle boundary → intersects only
    3: ([5, 5, 15, 15], [5, 15, 15, 5]),
    # 4: big square with the center inside but an edge cutting through
    #    the circle (lon edge at 4 < r) → intersects, NOT contains
    4: ([-30, -30, 30, 30], [-30, 4, 4, -30]),
    # 5: triangle whose every vertex is outside the circle (12.7, 12.7,
    #    12 from center) but whose base edge passes at distance 9 < r —
    #    the edge-only intersection predicate
    5: ([9, 9, 12], [-9, 9, 0]),
}
EXPECT = {
    "intersects": [0, 1, 3, 4, 5],
    "within": [0],
    "contains": [1],
    "disjoint": [2],
}


@pytest.fixture(scope="module")
def circle_index(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cshapes") / "idx")
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
def test_shape_circle_relations(circle_index, relation):
    s = Searcher(IndexReader(circle_index))
    q = ShapeCircleQuery("ring_lats", "ring_lons", relation=relation,
                         **CIRCLE)
    td = s.search(q, k=100)
    assert sorted(h.doc_id for h in td.score_docs) == EXPECT[relation]


def test_relations_partition(circle_index):
    # intersects ∪ disjoint = all docs; within ⊆ intersects;
    # contains ⊆ intersects
    s = Searcher(IndexReader(circle_index))

    def ids(rel):
        q = ShapeCircleQuery("ring_lats", "ring_lons", relation=rel,
                             **CIRCLE)
        return {h.doc_id for h in s.search(q, k=100).score_docs}

    inter, dis = ids("intersects"), ids("disjoint")
    assert inter | dis == set(SHAPES)
    assert not inter & dis
    assert ids("within") <= inter
    assert ids("contains") <= inter


def _brute_relations(ring, cy, cx, r, n_samples=3000, rng=None):
    """Sampled reference: point-in-ring parity + dense circle sampling."""
    y, x = np.asarray(ring[0], float), np.asarray(ring[1], float)
    k = len(y)

    def in_ring(py, px):
        inside = False
        for i in range(k):
            j = (i + 1) % k
            if (y[i] > py) != (y[j] > py) and \
                    px < (x[j] - x[i]) * (py - y[i]) / (y[j] - y[i]) + x[i]:
                inside = not inside
        return inside

    # min distance center→ring boundary
    dmin = np.inf
    for i in range(k):
        j = (i + 1) % k
        ex, ey = x[j] - x[i], y[j] - y[i]
        ln2 = ex * ex + ey * ey
        t = 0.0 if ln2 == 0 else np.clip(
            ((cx - x[i]) * ex + (cy - y[i]) * ey) / ln2, 0, 1)
        dmin = min(dmin, np.hypot(cy - (y[i] + t * ey),
                                  cx - (x[i] + t * ex)))
    center_in = in_ring(cy, cx)
    vmax = np.hypot(y - cy, x - cx).max()
    intersects = (dmin <= r) or center_in
    return {
        "intersects": intersects,
        "within": vmax <= r,
        "contains": center_in and dmin >= r,
        "disjoint": not intersects,
    }


def test_shape_circle_brute_differential(tmp_path):
    rng = np.random.default_rng(23)
    n = 60
    rings = []
    for _ in range(n):
        k = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(1, 14, k)
        cy, cx = rng.uniform(-18, 18), rng.uniform(-18, 18)
        rings.append((cy + rad * np.sin(ang), cx + rad * np.cos(ang)))
    idx = str(tmp_path / "idx")
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": [f"u{i}" for i in range(n)],
        "text": ["d"] * n,
        "ring_lats": pa.array([list(map(float, r[0])) for r in rings],
                              pa.list_(pa.float64())),
        "ring_lons": pa.array([list(map(float, r[1])) for r in rings],
                              pa.list_(pa.float64())),
    })
    man = build_and_write_segment(docs, 0, idx,
                                  meta_cols=("ring_lats", "ring_lons"))
    commit_index(idx, [man])
    s = Searcher(IndexReader(idx))
    cy, cx, r = 1.3, -2.1, 8.7
    expect = {rel: [] for rel in ("intersects", "within", "contains",
                                  "disjoint")}
    for i, ring in enumerate(rings):
        rel = _brute_relations(ring, cy, cx, r)
        for name, hit in rel.items():
            if hit:
                expect[name].append(i)
    for rel, ids in expect.items():
        q = ShapeCircleQuery("ring_lats", "ring_lons", cy, cx, r,
                             relation=rel)
        got = sorted(h.doc_id for h in s.search(q, k=200).score_docs)
        assert got == ids, rel
