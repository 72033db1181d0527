"""Entry-level guarantees for the Japanese chain.

1. Latin-corpus reduction: over pure-ASCII text the kuromoji lattice
   chain is exactly character-class-run tokenization — the equivalence
   the bm25_japanese_top10 SQL oracle and the analyze_flat fast path
   rely on. Swept over the real test corpus.
2. JA_VECTORS (the ja_token_counts ground truth) actually reproduce
   through the analyzer — i.e. the engine matches the reference's
   published vectors, not vice versa.
"""

import re

import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.analysis.japanese import JapaneseAnalyzer

SF_DIR = "/root/testdata/sf0.001"
_ASCII_RUNS = re.compile(r"[A-Za-z]+|[0-9]+")


@pytest.fixture(scope="module")
def analyzer():
    return JapaneseAnalyzer()


def test_latin_corpus_reduction(analyzer):
    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    for s in texts:
        s = s or ""
        assert analyzer(s) == [m.lower() for m in _ASCII_RUNS.findall(s)]


def test_analyze_flat_matches_per_doc(analyzer):
    texts = ["spark merge scan", "Batch 42 stream", "多くの学生が試験に落ちた。"]
    lengths, flat, doc_of, pos = analyzer.analyze_flat(texts)
    toks = flat.to_pylist()
    out = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        out[d].append(t)
    for i, s in enumerate(texts):
        assert out[i] == analyzer(s)
        assert lengths[i] == len(out[i])


def test_ja_vectors_reproduce(analyzer):
    from __ray_entry__ import JA_VECTORS
    for phrase, expected in JA_VECTORS:
        assert analyzer(phrase) == expected, phrase
