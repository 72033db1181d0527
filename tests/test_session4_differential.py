"""Randomized differentials for the session-4 query surface.

Each test builds a random micro index (seeded) and checks the engine
against an independent brute-force NumPy/Python oracle — the
TestDuelingCodecs / *Random test style of the reference (SURVEY §5).
"""
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rand_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search.searcher import Searcher
    from lucene_kmp_ray.similarity.bm25 import BM25Similarity

    rng = np.random.default_rng(42)
    n = 300
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(n)]
    lats = rng.uniform(-89, 89, n)
    lons = rng.uniform(-179, 179, n)
    lens = rng.integers(-50, 5000, n)
    counts = rng.integers(0, 4, n)
    flat = rng.integers(0, 100, int(counts.sum()))
    vals = pa.ListArray.from_arrays(
        np.r_[0, np.cumsum(counts)].astype(np.int32),
        pa.array(flat, pa.int64()))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(texts, pa.string()),
        "lat": pa.array(lats, pa.float64()),
        "lon": pa.array(lons, pa.float64()),
        "lval": pa.array(lens, pa.int64()),
        "vals": vals}))
    idx = str(tmp_path_factory.mktemp("s4diff") / "idx")
    build_index(ds, idx, segment_size=37,
                meta_cols=("lat", "lon", "lval", "vals"))
    s = Searcher(IndexReader(idx), BM25Similarity(dtype="float64"))
    data = dict(texts=texts, lats=lats, lons=lons, lens=lens,
                vals=[flat[a:b] for a, b in
                      zip(np.r_[0, np.cumsum(counts)][:-1],
                          np.cumsum(counts))])
    return s, data


def test_long_distance_feature_differential(rand_index):
    from lucene_kmp_ray.search import LongDistanceFeatureQuery
    s, d = rand_index
    rng = np.random.default_rng(7)
    for _ in range(5):
        origin = int(rng.integers(-100, 5100))
        pivot = int(rng.integers(1, 500))
        w = float(rng.uniform(0.1, 3.0))
        td = s.search(LongDistanceFeatureQuery("lval", origin, pivot,
                                               weight=w), k=20)
        dist = np.abs(d["lens"].astype(np.int64) - origin)
        sc = w * (float(pivot) / (pivot + dist.astype(np.float64)))
        exp = np.lexsort((np.arange(len(sc)), -sc))[:20]
        got = [h.doc_id for h in td.score_docs]
        # engine ties break (score, seg, doc) == (score, doc_id)
        assert got == exp.tolist()


def test_sorted_numeric_range_differential(rand_index):
    from lucene_kmp_ray.search import SortedNumericRangeQuery
    s, d = rand_index
    rng = np.random.default_rng(11)
    for _ in range(5):
        lo = int(rng.integers(0, 80))
        hi = lo + int(rng.integers(0, 40))
        td = s.search(SortedNumericRangeQuery("vals", lo, hi), k=1000)
        exp = sorted(i for i, v in enumerate(d["vals"])
                     if any(lo <= x <= hi for x in v))
        assert sorted(h.doc_id for h in td.score_docs) == exp


def test_geo_nearest_differential(rand_index):
    from lucene_kmp_ray.search.query import EARTH_MEAN_RADIUS_METERS
    s, d = rand_index
    rng = np.random.default_rng(13)
    for _ in range(3):
        qlat = float(rng.uniform(-80, 80))
        qlon = float(rng.uniform(-170, 170))
        td = s.nearest(qlat, qlon, 15)
        x2 = np.radians(qlat)
        h = (1.0 - np.cos(np.radians(d["lats"]) - x2)) + \
            np.cos(np.radians(d["lats"])) * np.cos(x2) * \
            (1.0 - np.cos(np.radians(d["lons"] - qlon)))
        h = (h.view(np.int64) & np.int64(-8)).view(np.float64)
        dist = EARTH_MEAN_RADIUS_METERS * 2.0 * \
            np.arcsin(np.minimum(1.0, np.sqrt(h * 0.5)))
        exp = np.lexsort((np.arange(len(dist)), dist))[:15]
        assert [h_.doc_id for h_ in td.score_docs] == exp.tolist()


def test_rrf_differential(rand_index):
    from lucene_kmp_ray.search import TermQuery, rrf
    s, _ = rand_index
    td1 = s.search(TermQuery("alpha"), k=30)
    td2 = s.search(TermQuery("gamma"), k=30)
    fused = rrf(10, 60, [td1, td2])
    # brute: rank maps keyed by (seg, doc)
    score = {}
    for td in (td1, td2):
        for r, h in enumerate(td.score_docs, start=1):
            score[(h.seg, h.doc)] = score.get((h.seg, h.doc), 0.0) \
                + 1.0 / (60 + r)
    exp = sorted(score.items(), key=lambda e: (-e[1], e[0][1], e[0][0]))
    assert [(h.seg, h.doc) for h in fused.score_docs] == \
        [k for k, _ in exp[:10]]
    for h, (k, v) in zip(fused.score_docs, exp):
        assert h.score == float(np.float32(v))


def test_elevation_differential(rand_index):
    from lucene_kmp_ray.search import TermQuery
    s, _ = rand_index
    base = s.search(TermQuery("beta"), k=1000)
    organic = [h.url for h in base.score_docs]
    elev = ["u7", organic[3] if len(organic) > 3 else "u9"]
    td = s.search_elevated(TermQuery("beta"), elev, k=1000)
    got = [h.url for h in td.score_docs]
    # elevated first in priority order, remainder = organic order minus
    # any elevated member
    exp = elev + [u for u in organic if u not in elev]
    if "u7" not in organic:
        assert len(got) == len(organic) + 1
    assert got == exp


def test_multi_range_field_differential(rand_index, tmp_path):
    # random per-doc boxes vs brute-force relation evaluation
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import MultiRangeFieldQuery
    from lucene_kmp_ray.search.searcher import Searcher

    rng = np.random.default_rng(17)
    n = 200
    alo = rng.integers(0, 90, n); ahi = alo + rng.integers(0, 30, n)
    blo = rng.integers(0, 90, n); bhi = blo + rng.integers(0, 30, n)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "text": pa.array(["spark"] * n, pa.string()),
        "alo": pa.array(alo, pa.int64()), "ahi": pa.array(ahi, pa.int64()),
        "blo": pa.array(blo, pa.int64()), "bhi": pa.array(bhi, pa.int64())}))
    idx = str(tmp_path / "mrfdiff")
    build_index(ds, idx, segment_size=31,
                meta_cols=("alo", "ahi", "blo", "bhi"))
    s = Searcher(IndexReader(idx))
    dims = (("alo", "ahi"), ("blo", "bhi"))
    for _ in range(5):
        l1 = int(rng.integers(0, 80)); u1 = l1 + int(rng.integers(0, 40))
        l2 = int(rng.integers(0, 80)); u2 = l2 + int(rng.integers(0, 40))
        inter = (alo <= u1) & (ahi >= l1) & (blo <= u2) & (bhi >= l2)
        within = (alo >= l1) & (ahi <= u1) & (blo >= l2) & (bhi <= u2)
        contains = (alo <= l1) & (ahi >= u1) & (blo <= l2) & (bhi >= u2)
        exp = {"intersects": inter, "within": within,
               "contains": contains, "crosses": inter & ~within}
        for rel, mask in exp.items():
            td = s.search(MultiRangeFieldQuery(dims, ((l1, u1), (l2, u2)),
                                               rel), k=1000)
            assert sorted(h.doc_id for h in td.score_docs) == \
                np.flatnonzero(mask).tolist(), rel
