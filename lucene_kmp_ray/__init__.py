"""lucene_kmp_ray — a Ray-Data-native inverted-index builder and BM25 query engine.

A from-scratch re-expression of the *semantics* of nehemiaharchives/lucene-kmp
(a Kotlin Multiplatform port of Apache Lucene 10.x) on top of Ray Data:

- ``analysis``   — StandardAnalyzer-equivalent tokenization (UAX#29-approximate
                   regex for Latin text, lowercase, 255-char max token).
- ``util``       — SmallFloat norm codec (bit-exact with the reference) and
                   delta+FOR posting-block packing (128-int blocks).
- ``similarity`` — BM25 (k1=1.2, b=0.75) with Lucene's exact float32 expression
                   and lossy 1-byte norms; also a float64 mode for SQL oracles.
- ``index``      — segment build (map_batches/groupby over Arrow), immutable
                   segment files (Parquet), tiered merge, manifests/checkpoints.
- ``search``     — query IR (term/boolean/phrase), per-segment scoring with
                   block-max pruning, TopDocs merge, Ray actor-pool search.
- ``pipelines``  — training-data ops: dedup (exact/minhash/simhash), text
                   stats, ANN search, multimodal stubs.
- ``sources``    — corpus derivation (Common-Crawl-style web-page table).

Everything is built from public knowledge: the Ray Data / PyArrow APIs and the
published Lucene algorithms (BM25, FOR/PForDelta, block-max WAND, tiered merge).
"""

__version__ = "0.1.0"
