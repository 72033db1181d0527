"""Soft deletes — mark docs deleted via a doc-values field, reclaim later.

Reference semantics (``index/SoftDeletesDirectoryReaderWrapper.kt``,
``PendingSoftDeletes.kt``, ``SoftDeletesRetentionMergePolicy.kt``):

- A document with ANY value in the configured soft-deletes field is
  treated as deleted by a reader opened with that field (the wrapper's
  ``FieldExistsQuery.getDocValuesDocIdSetIterator`` walk); hard deletes
  compound on top.
- Collection/term statistics keep counting soft-deleted docs until a
  merge reclaims them — identical to hard-tombstone semantics.
- Merges RECLAIM soft-deleted docs, EXCEPT those matching a retention
  predicate when ``SoftDeletesRetentionMergePolicy`` wraps the policy
  ("keep documents alive based on time or any other constraint"); the
  retained docs carry their soft-delete marker into the merged segment
  (``applyRetentionQuery`` keeps them in liveDocs but the field value
  survives, so a wrapped reader still hides them).

Engine mapping: the marker is a per-segment doc-values UPDATE generation
(``dv_<field>_<gen>.parquet`` — exactly how Lucene's own
``softUpdateDocument`` writes the field, via NumericDocValues updates),
so soft-deleting N urls costs one tiny parquet write per touched
segment, never a segment rewrite. Readers resolve the soft set by
scanning the field's update generations (the field need not exist in the
base docs table). Retention is a vectorized predicate over the segment's
docs table — the batch-engine form of the retention Query.
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_SOFT_FIELD = "__soft_deletes"


def _gen_files(seg_dir: str, field: str) -> list[str]:
    pat = re.compile(rf"^dv_{re.escape(field)}_(\d+)\.parquet$")
    out = []
    for p in glob.glob(os.path.join(seg_dir, f"dv_{field}_*.parquet")):
        if pat.match(os.path.basename(p)):
            out.append(p)
    return sorted(out)


def soft_deleted_docs(seg_dir: str,
                      field: str = DEFAULT_SOFT_FIELD) -> np.ndarray:
    """Sorted local ids of this segment's soft-deleted docs — the
    docs-with-a-value set of ``FieldExistsQuery.
    getDocValuesDocIdSetIterator(field, reader)``. Empty array if the
    field has no update generations here."""
    files = _gen_files(seg_dir, field)
    if not files:
        return np.empty(0, np.int64)
    parts = [pq.read_table(p, columns=["doc"])["doc"].to_numpy()
             for p in files]
    return np.unique(np.concatenate(parts)).astype(np.int64)


def soft_deleted_values(seg_dir: str, field: str = DEFAULT_SOFT_FIELD
                        ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted local ids, newest-wins marker values) of the soft-deleted
    set — what a retention merge must carry into the new segment."""
    files = _gen_files(seg_dir, field)
    vals: dict[int, int] = {}
    for p in files:  # ascending generation → later writes win
        t = pq.read_table(p)
        for d, v in zip(t["doc"].to_numpy(), t["value"].to_numpy()):
            vals[int(d)] = int(v)
    if not vals:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.array(sorted(vals), dtype=np.int64)
    return ids, np.array([vals[i] for i in ids], dtype=np.int64)


def soft_delete_segment_urls(seg_dir: str, urls: list[str],
                             field: str = DEFAULT_SOFT_FIELD,
                             value: int = 1) -> int:
    """Soft-delete one segment's docs by url: resolve local ids, append
    one doc-values update generation marking them."""
    from .dvupdates import _write_gen

    t = pq.read_table(os.path.join(seg_dir, "docs.parquet"),
                      columns=["url"])
    mask = pc.is_in(t["url"], value_set=pa.array(sorted(set(urls)),
                                                 pa.string()))
    hits = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if len(hits) == 0:
        return 0
    _write_gen(seg_dir, field, hits.astype(np.int64),
               np.full(len(hits), value, dtype=np.int64))
    return len(hits)


def soft_delete_by_url(index_dir: str, urls: list[str],
                       field: str = DEFAULT_SOFT_FIELD,
                       value: int = 1, parallel: bool = True) -> int:
    """``IndexWriter.softUpdateDocument``'s delete half across the index:
    one tiny dv-generation write per touched segment, url set broadcast
    once (``ray.put``), one task per segment."""
    import json

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    seg_dirs = [os.path.join(index_dir, m["dir"])
                for m in manifest["segments"]]
    if parallel:
        import ray
        urls_ref = ray.put(sorted(set(urls)))

        @ray.remote
        def one(sd: str) -> int:
            import ray as _ray
            return soft_delete_segment_urls(sd, _ray.get(urls_ref), field,
                                            value)

        return sum(ray.get([one.remote(sd) for sd in seg_dirs]))
    return sum(soft_delete_segment_urls(sd, urls, field, value)
               for sd in seg_dirs)
