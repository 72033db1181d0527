"""Per-field similarity dispatch.

Re-implements ``search/similarities/PerFieldSimilarityWrapper.kt``: the
wrapper's ``scorer(boost, collectionStats, termStats)`` delegates to
``get(collectionStats.field)`` so every field scores under its own
similarity while sharing one Searcher. Here the Searcher resolves
``sim.get(field)`` at each field-scoped scorer-construction site (the
same dispatch point — our CollectionStatistics equivalent is the
``(doc_count, sum_ttf)`` pair fetched per field).

``computeNorm`` parity: the reference's per-field norm dispatch is a
no-op for every similarity this repo ships — all of them inherit
``SimilarityBase``/``BM25Similarity``'s SmallFloat ``intToByte4(length)``
encoding, which is what the index writes unconditionally (``index/
format.py``), so per-field norms are already correct by construction.
"""

from __future__ import annotations


class PerFieldSimilarity:
    """``PerFieldSimilarityWrapper.kt`` analog: ``get(field)`` returns the
    per-field similarity, falling back to ``default``. All entries must
    share one dtype (mixed float32/float64 scores cannot merge in one
    top-k heap)."""

    def __init__(self, default, per_field: dict[str, object]):
        self.default = default
        self.per_field = dict(per_field)
        for f, s in self.per_field.items():
            if s.dtype != default.dtype:
                raise ValueError(
                    f"per-field similarity dtype mismatch on {f!r}: "
                    f"{s.dtype} != {default.dtype}")
        self.dtype = default.dtype

    def get(self, field: str):
        return self.per_field.get(field, self.default)

    # field-less fallback surface (paths with no single field in scope,
    # e.g. CombinedFieldQuery's cross-field pseudo-stats — the reference
    # requires a plain BM25 there and never consults the wrapper)
    def idf(self, doc_freq: int, doc_count: int) -> float:
        return self.default.idf(doc_freq, doc_count)

    def idf_sum(self, doc_freqs, doc_count) -> float:
        return self.default.idf_sum(doc_freqs, doc_count)

    def scorer(self, boost, doc_count, sum_total_term_freq, doc_freqs,
               total_term_freqs=None):
        return self.default.scorer(boost, doc_count, sum_total_term_freq,
                                   doc_freqs, total_term_freqs)
