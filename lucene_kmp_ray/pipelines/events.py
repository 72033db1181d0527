"""Windowed aggregates + sessionization over the ``events`` table.

The reference is strictly batch (SURVEY §2.10: no streaming operators
anywhere in lucene-kmp), but a large-scale training-data pipeline needs
time-window operators, so these are first-class extras. Both are expressed
as the partial-aggregate combiner pattern: ``map_batches`` pre-aggregates
each Arrow batch to (key, window) partials, then a vocabulary-×-window-sized
``groupby`` merges — the shuffle moves partial rows, never raw events
(SURVEY §2.6 "pre-aggregate inside map_batches").

Sessionization (gap-based windows) groups by ``user_id`` instead: one
user's events must be co-located and time-sorted to find session breaks —
the partitioning assumption is documented on the function (the classic
skew risk of a hot user is bounded because a user's event count is bounded
by the collection window, unlike Zipf term skew).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WINDOW_MINUTES = 60
SESSION_GAP_MINUTES = 30


def tumbling_counts(sf_dir: str, window_minutes: int = WINDOW_MINUTES):
    """Tumbling-window count/sum/mean of ``value`` per (event_type, window).

    window = floor(ts / W): each batch pre-aggregates locally (partial
    count+sum), the groupby merges partials, and mean = sum/count is
    derived after the merge — associativity exactly as a streaming engine
    would hold it.
    """
    import ray.data as rd

    w_us = window_minutes * 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(ts, w_us), w_us)
        t = pa.table({"event_type": b["event_type"], "window_us": win,
                      "value": b["value"]})
        return t.group_by(["event_type", "window_us"]).aggregate(
            [("value", "sum"), ("value", "count")]) \
            .select(["event_type", "window_us", "value_sum", "value_count"]) \
            .rename_columns(["event_type", "window_us", "psum", "pcount"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["pcount"].sum())
        s = float(g["psum"].sum())
        # rounded to 6dp: double sums are association-order-dependent and
        # the partial-merge order differs from a serial fold
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "window_us": [int(g["window_us"].iloc[0])],
            "n_events": [n],
            "sum_value_r": [round(s, 6)],
            "mean_value_r": [round(s / n, 6)],
        })

    return partials.groupby(["event_type", "window_us"]).map_groups(
        merge, batch_format="pandas")


def sessionize(sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES):
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Emits one row per session
    (user_id, session_start_us, n_events, duration_us).

    Partitioning assumption: ``groupby(user_id)`` co-locates one user's
    events in one group (time-sorted inside the group function). Safe at
    scale because per-user event counts are bounded; if a pathological key
    existed, salt by coarse time range and merge adjacent sessions at the
    boundary.
    """
    import ray.data as rd

    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        breaks = np.diff(ts) > gap_us
        sess_id = np.concatenate([[0], np.cumsum(breaks)])
        starts = np.flatnonzero(np.concatenate([[True], breaks]))
        ends = np.concatenate([starts[1:] - 1, [len(ts) - 1]])
        return pd.DataFrame({
            "user_id": g["user_id"].iloc[0],
            "session_start_us": ts[starts],
            "n_events": np.bincount(sess_id),
            "duration_us": ts[ends] - ts[starts],
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def hopping_counts(sf_dir: str, window_minutes: int = WINDOW_MINUTES,
                   hop_minutes: int = 15):
    """Hopping (sliding) windows: each event lands in window_minutes/hop
    overlapping windows. The explode is a per-batch flat map (one row per
    (event, window)), then the same partial-aggregate merge as tumbling —
    shuffle volume = partials per (event_type, window), never raw events.
    """
    import ray.data as rd

    w_us = window_minutes * 60 * 1_000_000
    h_us = hop_minutes * 60 * 1_000_000
    k = -(-w_us // h_us)  # ceil: max hop-aligned windows covering an event

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy()
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy()
        # window starts: latest hop boundary <= ts, going back k hops; the
        # keep mask drops the k-th window when it no longer covers ts
        # (only when hop does not divide window)
        base = (ts // h_us) * h_us
        starts = base[:, None] - np.arange(k) * h_us  # (n, k)
        keep = ts[:, None] < starts + w_us
        starts = starts.ravel()
        ev = np.repeat(np.arange(len(ts)), k)[keep.ravel()]
        starts = starts[keep.ravel()]
        t = pa.table({
            "event_type": pa.array(et[ev], pa.string()),
            "window_us": pa.array(starts, pa.int64()),
            "value": pa.array(val[ev]),
        })
        return t.group_by(["event_type", "window_us"]).aggregate(
            [("value", "sum"), ("value", "count")]) \
            .select(["event_type", "window_us", "value_sum", "value_count"]) \
            .rename_columns(["event_type", "window_us", "psum", "pcount"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["pcount"].sum())
        s = float(g["psum"].sum())
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "window_us": [int(g["window_us"].iloc[0])],
            "n_events": [n],
            "sum_value_r": [round(s, 6)],
        })

    return partials.groupby(["event_type", "window_us"]).map_groups(
        merge, batch_format="pandas")


def props_stats(sf_dir: str):
    """Semi-structured extraction: pull the numeric ``k`` field out of the
    JSON ``props`` column with ONE Arrow ``extract_regex`` kernel (no
    per-row json.loads), then partial count/sum per event_type merged in
    a tiny groupby. The shape of every log-enrichment stage at 100 TB:
    vectorized field extraction + associative partial aggregation.
    Oracle: oracle.props_stats (regexp_extract + exact integer sums)."""
    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k})
        g = t.group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum")])
        return g.rename_columns(["event_type", "pcount", "psum"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["pcount"].sum())
        s = int(g["psum"].sum())
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_with_k": [n],
            "sum_k": [s],
            "mean_k_r": [round(s / n, 6) if n else 0.0],
        })

    return partials.groupby("event_type").map_groups(
        merge, batch_format="pandas")
