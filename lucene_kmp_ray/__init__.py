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


def _tune_allocator() -> None:
    """Raise glibc's mmap/trim thresholds so large numpy temporaries are
    served from the (reused) heap instead of a fresh mmap/munmap pair per
    allocation.

    The default M_MMAP_THRESHOLD (128 KB) makes every posting-block /
    fancy-index temporary in the encode path an mmap that is returned to
    the kernel on free; with 16+ worker processes encoding segments
    concurrently the resulting page-zeroing + mmap churn serializes in the
    kernel and dilates pure-numpy segment inversion >10x (measured: 0.7 s
    single-task -> 10.6 s mean at 16-way concurrency on 32 CPUs; with the
    thresholds raised the same tasks run 0.75-0.9 s). Bounded at 64 MB so
    a worker's idle heap retains at most its steady-state working set —
    sized for web-scale builds where each worker repeatedly inverts
    similar-size segments.
    """
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 26)  # M_MMAP_THRESHOLD = 64 MB
        libc.mallopt(-1, 1 << 26)  # M_TRIM_THRESHOLD = 64 MB
    except Exception:  # non-glibc libc: default allocator behavior is fine
        pass


_tune_allocator()
