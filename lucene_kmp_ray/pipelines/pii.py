"""PII scrubbing + URL-host filtering for a training-data pipeline.

Both are single-pass ``map_batches`` transforms (no shuffle; the 100 TB
shape equals the sf0.01 shape), fully vectorized on Arrow RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex`` /
``extract_regex``) — no per-row Python.  Exact DuckDB oracles in
``lucene_kmp_ray.oracle`` share the regex strings (RE2 on both sides,
so the dialect is identical by construction).

- ``pii_scrub``: redact emails → IPv4 → phone-like digit runs (in that
  order, each pattern applied to the output of the previous) with
  ``<EMAIL>/<IP>/<PHONE>`` tokens; per-doc match counts are taken at
  each stage, mirroring the sequential application.
- ``url_host_filter``: extract the URL host and drop documents whose
  host is on a blocklist.  The blocklist is broadcast once via the
  task closure (`ray.put` under the hood) — the small side never
  shuffles; at 100 TB this stays a pure map.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-and-re-compatible patterns (no lookbehind/backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\. -]{6,}[0-9]"

# (pattern, replacement) in application order
PII_STAGES = [
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
]

HOST_RE = r"^https?://(?P<host>[^/]+)"

# deterministic demo blocklist over the synthetic corpus's hosts
DEFAULT_BLOCKED_HOSTS = ("src0.example.com", "src13.example.com")


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    counts = []
    for pat, repl in PII_STAGES:
        counts.append(pc.count_substring_regex(text, pattern=pat))
        text = pc.replace_substring_regex(text, pattern=pat,
                                          replacement=repl)
    return pa.table({
        "doc_id": batch["doc_id"],
        "clean_text": text,
        "n_emails": counts[0].cast(pa.int64()),
        "n_ips": counts[1].cast(pa.int64()),
        "n_phones": counts[2].cast(pa.int64()),
    })


def pii_scrub(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(pii_scrub_batch, batch_format="pyarrow")


def url_host_filter(sf_dir: str, blocked=DEFAULT_BLOCKED_HOSTS):
    """(doc_id, host) for documents whose URL host is NOT blocked."""
    import ray.data as rd
    blocked_arr = pa.array(sorted(blocked), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        # urls are derived exactly as the oracle's CORPUS_SQL derives
        # them (source -> https://<source>.example.com/doc/<id>)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        url = pc.binary_join_element_wise(
            pa.array(["https://"] * len(src), pa.string()), src,
            pa.array([".example.com/doc/"] * len(src), pa.string()),
            pc.cast(ids, pa.string()), "")
        host = pc.struct_field(
            pc.extract_regex(url, pattern=HOST_RE), "host")
        mask = pc.invert(pc.is_in(host, value_set=blocked_arr))
        m = mask.to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": ids.filter(pa.array(m)),
            "host": host.filter(pa.array(m)),
        })

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]) \
        .map_batches(keep, batch_format="pyarrow")
