"""Numeric doc-values updates — update a field without reindexing the doc.

ref: ``index/IndexWriter.kt`` ``updateNumericDocValue`` (term-addressed
in-place value rewrite), buffered/resolved through ``BufferedUpdates.kt``
and ``NumericDocValuesFieldUpdates``: Lucene writes a NEW DOC-VALUES
GENERATION file per applied update batch and the reader stacks
generations newest-wins; merges bake the resolved values into the new
segment and drop the update files.

This engine mirrors the layout directly: each update batch appends
``<seg_dir>/dv_<field>_<gen>.parquet`` with columns ``(doc:int64,
value)`` written atomically (tmp + rename, the two-phase spirit of
``SegmentInfos`` generations). ``apply_updates`` overlays all
generations in ascending order onto a docs table — wired into
``SegmentReader.doc_meta`` (every query/sort path reads through it) and
into the merge's doc-table load, so merges bake updates in exactly like
the reference.

Scale note: an update batch touches only the segments that contain the
addressed keys, one small parquet write per touched segment — no
segment rewrite, no reindex, embarrassingly parallel across segments.
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_FILE_RE = re.compile(r"^dv_(?P<field>.+)_(?P<gen>\d+)\.parquet$")


def _update_files(seg_dir: str) -> list[tuple[int, str, str]]:
    """(gen, field, path) of every update generation, ascending gen."""
    out = []
    for p in glob.glob(os.path.join(seg_dir, "dv_*.parquet")):
        m = _FILE_RE.match(os.path.basename(p))
        if m:
            out.append((int(m.group("gen")), m.group("field"), p))
    out.sort()
    return out


def apply_updates(seg_dir: str, table: pa.Table) -> pa.Table:
    """Overlay every update generation (ascending → newest wins) onto a
    docs table. Fields absent from the table are ignored (column-pruned
    reads only overlay what they loaded)."""
    files = _update_files(seg_dir)
    if not files:
        return table
    for _gen, field, path in files:
        if field not in table.column_names:
            continue
        upd = pq.read_table(path)
        docs = upd["doc"].to_numpy()
        col = table[field]
        vals = col.to_numpy(zero_copy_only=False).copy()
        vals[docs] = upd["value"].to_numpy(zero_copy_only=False)
        idx = table.column_names.index(field)
        table = table.set_column(
            idx, field, pa.array(vals, type=col.type
                                 if not pa.types.is_null(col.type)
                                 else None))
    return table


def _next_gen(seg_dir: str) -> int:
    files = _update_files(seg_dir)
    return files[-1][0] + 1 if files else 1


def _write_gen(seg_dir: str, field: str, docs: np.ndarray, values) -> None:
    gen = _next_gen(seg_dir)
    t = pa.table({"doc": pa.array(docs.astype(np.int64)),
                  "value": pa.array(values)})
    tmp = os.path.join(seg_dir, f".dv_{field}_{gen}.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(seg_dir, f"dv_{field}_{gen}.parquet"))


def _seg_dirs(index_dir: str) -> list[str]:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return [os.path.join(index_dir, m["dir"]) for m in manifest["segments"]]


def update_numeric_doc_values(index_dir: str, field: str,
                              updates: dict, key_field: str = "url") -> int:
    """Set ``field`` to ``updates[key]`` for every doc whose ``key_field``
    is a key of ``updates`` (the updateNumericDocValue contract, addressed
    by unique key instead of term). Returns the number of docs updated.
    One new generation file per touched segment; untouched segments are
    untouched files."""
    keys = np.array(list(updates), dtype=object)
    total = 0
    for sd in _seg_dirs(index_dir):
        t = pq.read_table(os.path.join(sd, "docs.parquet"),
                          columns=[key_field])
        col = np.asarray(t[key_field].to_pylist(), dtype=object)
        hit = np.flatnonzero(np.isin(col, keys))
        if not len(hit):
            continue
        vals = [updates[col[d]] for d in hit]
        _write_gen(sd, field, hit, vals)
        total += len(hit)
    return total


def update_numeric_doc_values_by_term(index_dir: str, term: str,
                                      field: str, value,
                                      text_field: str = "text") -> int:
    """The reference's exact addressing mode
    (``IndexWriter.updateNumericDocValue(Term, field, value)``): every
    doc whose ``text_field`` contains ``term`` gets ``field`` set to
    ``value``. Evaluated per segment through the posting list — no doc
    scan."""
    from .reader import IndexReader
    reader = IndexReader(index_dir)
    total = 0
    for sr in reader.segment_readers:
        p = sr.postings(term, field=text_field)
        if p is None or not len(p[0]):
            continue
        docs = np.asarray(p[0], dtype=np.int64)
        _write_gen(sr.dir, field, docs, [value] * len(docs))
        total += len(docs)
    return total
