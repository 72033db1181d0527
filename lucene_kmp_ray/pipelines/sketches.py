"""Distributed sketches — approximate aggregates whose PARTIALS merge
associatively (the streaming-window sketch role a 100 TB pipeline needs:
per-batch partial sketches, one tiny groupby merge, never the raw values).

HyperLogLog (Flajolet et al. 2007) distinct-count, deterministic variant:

- hash = first 8 md5 bytes of the decimal user_id string (the same
  md5-as-uint64 device the dedup/simhash oracles share — exactly
  reproducible in DuckDB);
- p = 9 → m = 512 registers; bucket = top 9 hash bits, rho = 56 −
  bit_length(low 55 bits) ∈ 1..56;
- per-batch partial = (window, bucket) → max rho; merge = max again
  (associative/commutative/idempotent — retry-safe);
- the register sum Σ 2^−M is computed in EXACT integer units of 2^−56
  (Python int / DuckDB HUGEINT), so the float estimate is bit-identical
  between the engine and the SQL oracle regardless of summation order —
  the small-range (linear counting) correction applies below 2.5·m.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

HLL_P = 9
HLL_M = 1 << HLL_P                  # 512 registers
HLL_W = 64 - HLL_P                  # 55 value bits
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
WINDOW_MINUTES = 15


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length (exact — no float log)."""
    x = x.astype(np.uint64)
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x = np.where(m, x >> np.uint64(s), x)
    bl += (x == 1)
    return bl


def _hash_u64(ids: np.ndarray) -> np.ndarray:
    """First 8 md5 bytes of str(id), big-endian — per batch-DISTINCT id."""
    from .dedup import _md5_digests
    uniq, inv = np.unique(ids, return_inverse=True)
    d = _md5_digests([str(int(u)) for u in uniq])
    h = d[:, 0].astype(np.uint64)
    for i in range(1, 8):
        h = (h << np.uint64(8)) | d[:, i].astype(np.uint64)
    return h[inv]


def hll_estimate(reg_sum_units: int, n_set: int) -> float:
    """HLL estimate from the EXACT integer register sum (units of 2^-56)
    and the count of non-zero registers."""
    zeros = HLL_M - n_set
    # a zero register contributes 2^-0 = 1 = 2^56 units
    total = reg_sum_units + zeros * (1 << (HLL_W + 1))
    e = _ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1)) / float(total)
    if e <= 2.5 * HLL_M and zeros > 0:
        e = HLL_M * math.log(HLL_M / zeros)
    return e


def hll_user_counts(sf_dir: str, window_minutes: int = WINDOW_MINUTES):
    """Approximate distinct users per tumbling window: per-batch partial
    registers → groupby(window) max-merge → closed-form estimate.
    Shuffle volume ≤ 512 rows per (batch, window), independent of user
    cardinality. Oracle: oracle.hll_user_counts (same hash, same integer
    register sum, same estimator — exact match by construction)."""
    import ray.data as rd

    w_us = window_minutes * 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(ts, w_us), w_us).to_numpy()
        h = _hash_u64(b["user_id"].to_numpy())
        bucket = (h >> np.uint64(HLL_W)).astype(np.int64)
        low = h & np.uint64((1 << HLL_W) - 1)
        rho = (HLL_W + 1) - _bit_length_u64(low)
        df = pd.DataFrame({"window_us": win, "bucket": bucket, "rho": rho})
        g = df.groupby(["window_us", "bucket"], sort=False)["rho"].max() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = g.groupby("bucket", sort=False)["rho"].max()
        # 2^-rho in 2^-56 units = 2^(56-rho)
        units = int(sum(1 << (HLL_W + 1 - int(r)) for r in regs))
        e = hll_estimate(units, len(regs))
        return pd.DataFrame({
            "window_us": [int(g["window_us"].iloc[0])],
            "n_registers": [len(regs)],
            "est_users_r": [round(e, 6)],
        })

    return partials.groupby("window_us").map_groups(
        estimate, batch_format="pandas")


# ------------------------------------------------- Count-Min sketch -------
CMS_D = 4       # hash rows
CMS_W = 1024    # counters per row


def _cms_cols(terms: list[str], row: int) -> np.ndarray:
    """Column of each term in hash row ``row``: first 8 md5 bytes of
    "row:term" mod CMS_W (deterministic, SQL-reproducible)."""
    from .dedup import _md5_digests
    d = _md5_digests([f"{row}:{t}" for t in terms])
    h = d[:, 0].astype(np.uint64)
    for i in range(1, 8):
        h = (h << np.uint64(8)) | d[:, i].astype(np.uint64)
    return (h % np.uint64(CMS_W)).astype(np.int64)


def cms_term_counts(sf_dir: str, probe_terms: tuple[str, ...] = ()):
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream: per-batch partial counter matrices (d×w = 4×1024)
    merge by ADDITION in one bounded groupby — shuffle ≤ 4096 rows per
    batch regardless of vocabulary. Returns per probe term the CMS
    estimate est = min_j C[j, h_j(term)] (an over-estimate bounded by
    ε·N w.p. 1−δ). Deterministic md5 row-hashes → the DuckDB oracle
    rebuilds the identical counters (oracle.cms_term_counts)."""
    import ray.data as rd

    from ..analysis.standard import tokenize_flat

    if not probe_terms:
        probe_terms = ("spark", "the", "join", "data", "window")

    def partial(b: pa.Table) -> pa.Table:
        _, flat = tokenize_flat(b["text"].to_pylist())
        dict_arr = flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64) if len(flat) \
            else np.empty(0, np.int64)
        vocab = dict_arr.dictionary.to_pylist()
        tf = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        rows, cols, cnts = [], [], []
        for j in range(CMS_D):
            c = _cms_cols(vocab, j) if vocab else np.empty(0, np.int64)
            # several vocab terms may share a column: aggregate locally
            agg = np.zeros(CMS_W, dtype=np.int64)
            np.add.at(agg, c, tf)
            nz = np.flatnonzero(agg)
            rows.append(np.full(len(nz), j, np.int64))
            cols.append(nz)
            cnts.append(agg[nz])
        return pa.table({
            "row": pa.array(np.concatenate(rows) if rows else [],
                            pa.int64()),
            "col": pa.array(np.concatenate(cols) if cols else [],
                            pa.int64()),
            "n": pa.array(np.concatenate(cnts) if cnts else [],
                          pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"row": [int(g["row"].iloc[0])],
                             "col": [int(g["col"].iloc[0])],
                             "n": [int(g["n"].sum())]})

    counters = partials.groupby(["row", "col"]).map_groups(
        merge, batch_format="pandas").to_pandas()
    cm = {}
    for _, r in counters.iterrows():
        cm[(int(r["row"]), int(r["col"]))] = int(r["n"])
    out_terms, out_est = [], []
    probes = sorted(probe_terms)
    for t in probes:
        ests = []
        for j in range(CMS_D):
            col = int(_cms_cols([t], j)[0])
            ests.append(cm.get((j, col), 0))
        out_terms.append(t)
        out_est.append(min(ests))
    return pd.DataFrame({"term": out_terms,
                         "est_count": np.array(out_est, np.int64)})
