"""Query-matched snippet extraction — the Lucene highlighter role
(lucene/highlighter UnifiedHighlighter's simplest mode) re-expressed as
a Ray Data batch transform.

Semantics (mirrored bit-for-bit by ``oracle.highlight_term_topk``): for
each hit document, the snippet is the ``width``-token window of the
ANALYZED token stream starting ``before`` tokens before the first
occurrence of the query term (clamped to the document start), joined
with single spaces. Analyzed-token snippets (not raw-text offsets) keep
the mirror exact across the tokenizer's case folding; a production
highlighter would map token offsets back to the raw text, which the
reference's analyzers expose the offsets for but the parquet corpus
does not need.

Scale shape: the hit set is top-k (tiny); snippets are computed by a
column-pruned, ``is_in``-filtered pass over the corpus — the filter
prunes at the batch level so only blocks containing hits tokenize.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HL_BEFORE = 3
HL_WIDTH = 8


def snippets_for_docs(sf_dir: str, doc_ids: list[int], term: str,
                      before: int = HL_BEFORE, width: int = HL_WIDTH):
    """(doc_id, snippet) for each doc in ``doc_ids`` containing ``term``.

    One filtered map over the documents table; the doc-id set rides in
    the task closure (top-k sized)."""
    from ..analysis.standard import tokenize
    from ..pipelines.dedup import _read_docs

    wanted = pa.array(sorted(set(int(d) for d in doc_ids)), pa.int64())

    def extract(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["doc_id"], value_set=wanted)
        t = batch.filter(keep)
        ids, snips = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = tokenize(text or "")
            try:
                p = toks.index(term)
            except ValueError:
                continue  # hit doc without the term (not for TermQuery)
            start = max(p - before, 0)
            ids.append(doc_id)
            snips.append(" ".join(toks[start:start + width]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "snippet": pa.array(snips, pa.string())})

    return _read_docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(extract, batch_format="pyarrow")
