"""HNSW graph build + search over a per-segment vector matrix.

The ``util/hnsw/HnswGraphBuilder.kt`` / ``HnswGraphSearcher.kt`` role,
re-expressed in numpy: hierarchical layers with exponentially-decaying
level assignment (ml = 1/ln(M), HnswGraphBuilder.kt ``ml``), greedy
descent through upper layers, beam (ef) search at each insertion layer,
and the diversity neighbor-selection heuristic (a candidate is kept only
if it is closer to the node than to every already-kept neighbor —
``HnswGraphBuilder.diversityCheck``). Level 0 allows 2M neighbors, upper
levels M (HnswGraphBuilder ``M`` / ``maxConn``).

Distances are cosine (vectors are normalized once at build); the graph is
deterministic for a given (vectors, seed). Inner loops batch every
neighbor-distance evaluation through one matmul per hop — the candidate
frontier is Python, the arithmetic is numpy.
"""

from __future__ import annotations

import heapq

import numpy as np

DEFAULT_M = 16
DEFAULT_EF_CONSTRUCTION = 100


def _normalize(vecs: np.ndarray) -> np.ndarray:
    v = np.asarray(vecs, dtype=np.float32)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return v / n


class HnswGraph:
    """neighbors[level][node] -> list[int]; entry point at ``entry``."""

    def __init__(self, neighbors: list[dict[int, list[int]]], entry: int,
                 vectors_norm: np.ndarray, m: int):
        self.neighbors = neighbors
        self.entry = entry
        self.v = vectors_norm
        self.m = m

    @property
    def max_level(self) -> int:
        return len(self.neighbors) - 1

    # -- search --------------------------------------------------------
    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      nbrs: dict[int, list[int]]) -> list[tuple[float, int]]:
        """Beam search one layer → [(dist, node)] sorted ascending;
        dist = 1 - cosine."""
        v = self.v
        d0 = 1.0 - v[eps] @ q
        visited = set(eps)
        cand = [(float(d), e) for d, e in zip(d0, eps)]
        heapq.heapify(cand)
        res = [(-float(d), e) for d, e in zip(d0, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -res[0][0] and len(res) >= ef:
                break
            new = [nb for nb in nbrs.get(c, ()) if nb not in visited]
            if not new:
                continue
            visited.update(new)
            dn = 1.0 - v[new] @ q  # one matmul per hop
            worst = -res[0][0]
            for nb, dd in zip(new, dn):
                dd = float(dd)
                if len(res) < ef or dd < worst:
                    heapq.heappush(cand, (dd, nb))
                    heapq.heappush(res, (-dd, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
                    worst = -res[0][0]
        return sorted((-d, e) for d, e in res)

    def search(self, query: np.ndarray, k: int, ef: int | None = None,
               entry_points: "list[int] | None" = None
               ) -> tuple[np.ndarray, np.ndarray]:
        """→ (node ids, cosine similarities), best-first, ≤k rows.

        ``entry_points`` seeds the bottom-layer beam directly from the
        given node ids instead of descending the hierarchy from the
        global entry — the KnnSearchStrategy.Seeded role
        (search/knn/KnnSearchStrategy.kt:75-90, used by
        SeededKnnVectorQuery.kt; the lexically-accelerated dense
        retrieval pattern). Empty/None falls back to the normal descent.
        """
        if self.entry < 0 or not len(self.v):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        q = np.asarray(query, dtype=np.float32)
        qn = np.linalg.norm(q)
        if qn:
            q = q / qn
        ef = max(ef or k, k)
        if entry_points:
            ep = list(dict.fromkeys(
                int(e) for e in entry_points if 0 <= e < len(self.v)))
        else:
            ep = []
        if not ep:
            ep = [self.entry]
            for lvl in range(self.max_level, 0, -1):
                ep = [self._search_layer(q, ep, 1, self.neighbors[lvl])[0][1]]
        hits = self._search_layer(q, ep, ef, self.neighbors[0])[:k]
        ids = np.array([e for _, e in hits], np.int64)
        sims = 1.0 - np.array([d for d, _ in hits], np.float64)
        return ids, sims


def _select_diverse(v: np.ndarray, cand: list[tuple[float, int]],
                    m: int) -> list[int]:
    """Diversity heuristic (HnswGraphBuilder.diversityCheck): scan by
    increasing distance, keep c unless it is closer to a kept neighbor
    than to the inserted node."""
    kept: list[int] = []
    for d, c in cand:
        if len(kept) >= m:
            break
        if kept:
            sims = v[kept] @ v[c]
            if np.any(1.0 - sims < d):
                continue
        kept.append(c)
    return kept


def build_graph(vectors: np.ndarray, m: int = DEFAULT_M,
                ef_construction: int = DEFAULT_EF_CONSTRUCTION,
                seed: int = 42) -> HnswGraph:
    v = _normalize(vectors)
    n = len(v)
    ml = 1.0 / np.log(m)
    rng = np.random.default_rng(seed)
    levels = np.floor(-np.log(rng.random(n) + 1e-300) * ml).astype(np.int64) \
        if n else np.empty(0, np.int64)
    max_level = int(levels.max()) if n else 0
    neighbors: list[dict[int, list[int]]] = [dict()
                                             for _ in range(max_level + 1)]
    g = HnswGraph(neighbors, -1, v, m)
    entry, entry_level = -1, -1
    for i in range(n):
        li = int(levels[i])
        if entry < 0:
            for lvl in range(li + 1):
                neighbors[lvl][i] = []
            entry, entry_level = i, li
            continue
        q = v[i]
        ep = [entry]
        for lvl in range(entry_level, li, -1):
            ep = [g._search_layer(q, ep, 1, neighbors[lvl])[0][1]]
        for lvl in range(min(li, entry_level), -1, -1):
            cand = g._search_layer(q, ep, ef_construction, neighbors[lvl])
            cap = m * 2 if lvl == 0 else m
            sel = _select_diverse(v, cand, cap)
            neighbors[lvl][i] = list(sel)
            for j in sel:
                lst = neighbors[lvl].setdefault(j, [])
                lst.append(i)
                if len(lst) > cap:
                    dj = 1.0 - v[lst] @ v[j]
                    ranked = sorted(zip(dj.tolist(), lst))
                    neighbors[lvl][j] = _select_diverse(v, ranked, cap)
            ep = [e for _, e in cand]
        for lvl in range(entry_level + 1, li + 1):
            neighbors[lvl][i] = []
        if li > entry_level:
            entry, entry_level = i, li
    g.entry = entry
    return g


# -- Parquet sidecar codec -------------------------------------------------

def graph_to_table(g: HnswGraph):
    import pyarrow as pa
    lv, node, nbr = [], [], []
    for lvl, layer in enumerate(g.neighbors):
        for nd, lst in sorted(layer.items()):
            lv.append(lvl)
            node.append(nd)
            nbr.append(lst)
    return pa.table({
        "level": pa.array(lv, pa.int8()),
        "node": pa.array(node, pa.int32()),
        "neighbors": pa.array(nbr, pa.list_(pa.int32())),
    })


def graph_from_table(t, vectors_norm: np.ndarray, m: int,
                     entry: int) -> HnswGraph:
    levels = t["level"].to_numpy()
    nodes = t["node"].to_numpy()
    nbrs = t["neighbors"].to_pylist()
    max_level = int(levels.max()) if len(levels) else 0
    neighbors: list[dict[int, list[int]]] = [dict()
                                             for _ in range(max_level + 1)]
    for lvl, nd, lst in zip(levels, nodes, nbrs):
        neighbors[int(lvl)][int(nd)] = list(lst)
    return HnswGraph(neighbors, entry, vectors_norm, m)
