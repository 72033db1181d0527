"""Per-row invariants over the corpus (BASELINE.json input_hint).

The input contract demands byte-identical extracted text per url: for every
page, ``html_to_text(html) == text``. This pipeline enforces it as a
streaming map (the invariant gate a production ingest would run before
indexing), emitting one row per doc with the comparison result so the
driver oracle can cross-check the extraction logic itself in SQL.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.htmlstrip import html_title, html_to_text
from ..sources.corpus import corpus_dataset


def extract_invariant(sf_dir: str):
    """(doc_id, match, title_match, text_len) — both matches must be true
    for every row: body extraction == text AND <title> extraction ==
    title (the fielded-document derivation the index build relies on)."""

    def check(b: pa.Table) -> pa.Table:
        htmls = b["html"].to_pylist()
        extracted = [html_to_text(h) for h in htmls]
        titles = [html_title(h) for h in htmls]
        return pa.table({
            "doc_id": b["doc_id"],
            "match": pc.equal(pa.array(extracted, pa.string()), b["text"]),
            "title_match": pc.equal(pa.array(titles, pa.string()),
                                    b["title"]),
            "text_len": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
        })

    return corpus_dataset(sf_dir, columns=["doc_id", "html", "text",
                                           "title"]) \
        .map_batches(check, batch_format="pyarrow")
