"""Delete-by-url tombstones over immutable segments.

The reference marks deletions in a per-segment live-docs bitset reclaimed
at merge (``Lucene90LiveDocsFormat.kt:22-35``; ``IndexWriter.deleteDocuments``
``IndexWriter.kt:1591-1611``). The batch-engine analog: a per-segment
``tombstones.parquet`` sidecar (one ``doc:int32`` local id per deleted doc)
written atomically next to the immutable postings — a recrawl pipeline can
delete-by-url far cheaper than a segment rebuild. Readers subtract the
tombstone set from every match; collection/term statistics intentionally
KEEP counting deleted docs until a merge reclaims them — exactly Lucene's
behavior (docFreq includes deleted docs until merge).

Deletes fan out one Ray task per segment (url membership is a vectorized
``is_in`` over the segment's doc table); each write is read-modify-rename
atomic and idempotent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOMBSTONES_FILE = "tombstones.parquet"


def _write_tombstones(seg_dir: str, new_docs: np.ndarray) -> int:
    """Merge ``new_docs`` local ids into the segment's tombstone sidecar
    (atomic tmp+rename; idempotent). Returns the total tombstone count."""
    path = os.path.join(seg_dir, TOMBSTONES_FILE)
    if os.path.exists(path):
        old = pq.read_table(path)["doc"].to_numpy()
        new_docs = np.union1d(old, new_docs)
    else:
        new_docs = np.unique(new_docs)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc": pa.array(new_docs.astype(np.int32))}),
                   tmp)
    os.replace(tmp, path)
    return len(new_docs)


def delete_segment_urls(seg_dir: str, urls: list[str]) -> int:
    """Tombstone every doc of one segment whose url is in ``urls``."""
    t = pq.read_table(os.path.join(seg_dir, "docs.parquet"),
                      columns=["url"])
    mask = pc.is_in(t["url"], value_set=pa.array(sorted(set(urls)),
                                                 pa.string()))
    hits = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if len(hits) == 0:
        return 0
    _write_tombstones(seg_dir, hits)
    return len(hits)


def delete_by_url(index_dir: str, urls: list[str],
                  parallel: bool = True) -> int:
    """Delete-by-url across the whole index (IndexWriter.deleteDocuments
    analog). Returns the number of newly tombstoned docs. Url list is
    broadcast once; one task per segment."""
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
            return delete_segment_urls(sd, _ray.get(urls_ref))

        return sum(ray.get([one.remote(sd) for sd in seg_dirs]))
    return sum(delete_segment_urls(sd, urls) for sd in seg_dirs)


def read_tombstones(seg_dir: str) -> np.ndarray | None:
    path = os.path.join(seg_dir, TOMBSTONES_FILE)
    if not os.path.exists(path):
        return None
    return pq.read_table(path)["doc"].to_numpy().astype(np.int64)
