"""Deterministic Common-Crawl-style corpus (url, warc_ts, html, text, lang).

BASELINE.json input_hint mandates a web-page table with columns
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
This sandbox has no external data, so we derive that table *deterministically*
from the driver's synthetic ``documents.parquet`` (doc_id, text, lang, source,
n_chars):

    url     = 'https://' + source + '.example.com/doc/' + doc_id
    warc_ts = TIMESTAMP '2024-01-01 00:00:00' + doc_id seconds
    title   = substr(text, 1, 48)   (the page's <title> content)
    html    = encode('<html><head><title>' + title + '</title></head>'
                     '<body>' + text + '</body></html>')
    text    = text,  lang = lang,  doc_id = doc_id (dense int64, kept as the
              deterministic global doc ordering key — SURVEY §4 "ordering")

``title`` is carried as its own column so the (pruned) index build can read
it without the html binary; the per-row invariant ``html_title(html) ==
title`` (and ``html_to_text(html) == text``) is enforced by
``pipelines/validate.py`` — the production path would extract both from
html (Document.kt:20 fielded docs: title + body).

The SQL view below produces the byte-identical table in DuckDB, so every
oracle query can join/derive from the same corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

# DuckDB view body; tables documents etc. are pre-registered views.
CORPUS_SQL = """
SELECT
  doc_id,
  'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
  TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
  encode('<html><head><title>' || substr(text, 1, 48) ||
         '</title></head><body>' || text || '</body></html>') AS html,
  text,
  substr(text, 1, 48) AS title,
  lang
FROM documents
"""

TITLE_CHARS = 48  # substr(text, 1, 48) — keep in sync with CORPUS_SQL


def _derive(tbl: pa.Table) -> pa.Table:
    doc_id = tbl["doc_id"].to_numpy()
    text = tbl["text"]
    title = pc.utf8_slice_codeunits(text, 0, TITLE_CHARS)
    url = pc.binary_join_element_wise(
        "https://", pc.cast(tbl["source"], pa.string()), ".example.com/doc/",
        pc.cast(tbl["doc_id"], pa.string()), "")
    warc_ts = pa.array(_EPOCH + doc_id.astype("timedelta64[s]"),
                       type=pa.timestamp("us"))
    html = pc.cast(pc.binary_join_element_wise(
        "<html><head><title>", title, "</title></head><body>", text,
        "</body></html>", ""), pa.binary())
    return pa.table({
        "doc_id": tbl["doc_id"],
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "title": title,
        "lang": tbl["lang"],
    })


def corpus_table(sf_dir: str) -> pa.Table:
    """Whole derived corpus as one Arrow table (small-sf, driver-side use)."""
    return _derive(pq.read_table(f"{sf_dir}/documents.parquet"))


def corpus_shards(sf_dir: str, segment_size: int, expand: int = 1,
                  fields: tuple[str, ...] = ("text",),
                  with_vectors: bool = False):
    """Shard specs + loader for the shuffle-free build path.

    The virtual corpus is ``expand`` deterministic copies of
    documents.parquet (global row r ↦ doc_id r, text of source row r % n);
    shard k covers global rows [k*segment_size, (k+1)*segment_size) — fully
    deterministic, independent of Ray scheduling. The loader caches the
    (tiny) source table per worker process. At real web scale a shard is
    simply one input Parquet file (docIDs from file order).
    """
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    n = pq.read_metadata(path).num_rows
    total = n * expand
    shards = [{"seg": seg, "row_lo": lo, "row_hi": min(lo + segment_size, total)}
              for seg, lo in enumerate(range(0, total, segment_size))]

    def make_docs(spec: dict) -> pa.Table:
        src = _cached_source(path)
        lo, hi = spec["row_lo"], spec["row_hi"]
        parts = []
        r = lo
        while r < hi:
            c, off = divmod(r, n)
            take = min(n - off, hi - r)
            sl = src.slice(off, take)
            if c:
                sl = sl.set_column(
                    sl.schema.get_field_index("doc_id"), "doc_id",
                    pc.add(sl["doc_id"], c * n))
            parts.append(sl)
            r += take
        out = _derive(pa.concat_tables(parts)).select(
            ["doc_id", "url", *sorted(fields)])
        if with_vectors:
            # embeddings align by vec_id == doc_id (mod n for expanded
            # copies) — the KnnFloatVectorField source column
            emb = _cached_embeddings(f"{sf_dir}/embeddings.parquet")
            rows = out["doc_id"].to_numpy() % emb.num_rows
            out = out.append_column(
                "embedding", emb["embedding"].take(pa.array(rows)))
        return out

    return shards, make_docs


_SOURCE_CACHE: dict = {}


def _cached_embeddings(path: str) -> pa.Table:
    t = _SOURCE_CACHE.get(path)
    if t is None:
        import pyarrow.parquet as pq
        t = pq.read_table(path, columns=["vec_id", "embedding"]) \
            .sort_by("vec_id")
        _SOURCE_CACHE[path] = t
    return t


def _cached_source(path: str) -> pa.Table:
    t = _SOURCE_CACHE.get(path)
    if t is None:
        import pyarrow.parquet as pq
        t = pq.read_table(path, columns=["doc_id", "text", "lang", "source"]) \
            .sort_by("doc_id")
        _SOURCE_CACHE[path] = t
    return t


def corpus_dataset(sf_dir: str, columns: list[str] | None = None,
                   expand: int = 1):
    """Derived corpus as a streaming Ray Dataset (the build-path entry).

    At real scale this is a plain ``read_parquet`` of WARC-derived Parquet;
    here the derivation itself is the (cheap, vectorized) first map stage.
    Reads only the source columns actually required.

    ``expand=K`` replicates the corpus K× deterministically (copy i gets
    ``doc_id += i*N``, urls/timestamps re-derived) — the bench knob for
    measuring throughput beyond the tiny synthetic table; no external data.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    need_src = {"doc_id", "text", "lang", "source"}
    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=sorted(need_src))
    if expand > 1:
        n = pq.read_metadata(path).num_rows

        def replicate(tbl: pa.Table) -> pa.Table:
            parts = []
            for i in range(expand):
                t = tbl.set_column(
                    tbl.schema.get_field_index("doc_id"), "doc_id",
                    pc.add(tbl["doc_id"], i * n))
                parts.append(t)
            return pa.concat_tables(parts)

        ds = ds.map_batches(replicate, batch_format="pyarrow")
    ds = ds.map_batches(_derive, batch_format="pyarrow")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def fetch_documents(sf_dir: str, doc_ids: list[int],
                    columns: list[str] | None = None) -> pa.Table:
    """Stored-fields fetch (the StoredFieldVisitor / document() API,
    SURVEY §1.4: the corpus Parquet IS the row store): pull the requested
    docs' stored columns with parquet predicate pushdown — row groups not
    covering the ids never read. Returns rows in doc_id order."""
    import pyarrow.parquet as pq

    cols = None
    if columns is not None:
        src_needed = {"doc_id", "text", "lang", "source"}
        cols = sorted(src_needed)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=cols,
                      filters=[("doc_id", "in", sorted(set(doc_ids)))])
    out = _derive(t.sort_by("doc_id"))
    if columns is not None:
        out = out.select(columns)
    return out
