"""Deterministic Common-Crawl-style corpus (url, warc_ts, html, text, lang).

BASELINE.json input_hint mandates a web-page table with columns
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
This sandbox has no external data, so we derive that table *deterministically*
from the driver's synthetic ``documents.parquet`` (doc_id, text, lang, source,
n_chars):

    url     = 'https://' + source + '.example.com/doc/' + doc_id
    warc_ts = TIMESTAMP '2024-01-01 00:00:00' + doc_id seconds
    html    = encode('<html><body>' + text + '</body></html>')
    text    = text,  lang = lang,  doc_id = doc_id (dense int64, kept as the
              deterministic global doc ordering key — SURVEY §4 "ordering")

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
  encode('<html><body>' || text || '</body></html>') AS html,
  text,
  lang
FROM documents
"""


def _derive(tbl: pa.Table) -> pa.Table:
    doc_id = tbl["doc_id"].to_numpy()
    text = tbl["text"]
    url = pc.binary_join_element_wise(
        "https://", pc.cast(tbl["source"], pa.string()), ".example.com/doc/",
        pc.cast(tbl["doc_id"], pa.string()), "")
    warc_ts = pa.array(_EPOCH + doc_id.astype("timedelta64[s]"),
                       type=pa.timestamp("us"))
    html = pc.cast(pc.binary_join_element_wise(
        "<html><body>", text, "</body></html>", ""), pa.binary())
    return pa.table({
        "doc_id": tbl["doc_id"],
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": tbl["lang"],
    })


def corpus_table(sf_dir: str) -> pa.Table:
    """Whole derived corpus as one Arrow table (small-sf, driver-side use)."""
    return _derive(pq.read_table(f"{sf_dir}/documents.parquet"))


def corpus_dataset(sf_dir: str, columns: list[str] | None = None):
    """Derived corpus as a streaming Ray Dataset (the build-path entry).

    At real scale this is a plain ``read_parquet`` of WARC-derived Parquet;
    here the derivation itself is the (cheap, vectorized) first map stage.
    Reads only the source columns actually required.
    """
    import ray.data as rd

    need_src = {"doc_id", "text", "lang", "source"}
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=sorted(need_src))
    ds = ds.map_batches(_derive, batch_format="pyarrow")
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
