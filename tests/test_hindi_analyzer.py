"""Hindi analyzer conformance.

Vectors from reference TestHindiNormalizer.kt / TestHindiStemmer.kt;
Indic compose checks against IndicNormalizer.kt's table semantics.
"""

import pytest

from lucene_kmp_ray.analysis.indic import (HindiAnalyzer, hindi_normalize,
                                           hindi_stem, indic_normalize)

# reference TestHindiNormalizer.kt — full chain = indic then hindi norm
HI_NORM_VECTORS = [
    ("अँगरेज़ी", "अंगरेजि"), ("अँगरेजी", "अंगरेजि"),
    ("अँग्रेज़ी", "अंगरेजि"), ("अँग्रेजी", "अंगरेजि"),
    ("अंगरेज़ी", "अंगरेजि"), ("अंगरेजी", "अंगरेजि"),
    ("अंग्रेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"),
    ("क़र्ज़", "करज"), ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
]

HI_STEM_VECTORS = [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"),
    ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"), ("लडकियों", "लडक"),
    ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("आध्यापीका", "आध्यापीक"), ("आध्यापीकाएं", "आध्यापीक"),
    ("आध्यापीकाओं", "आध्यापीक"),
    ("खाना", "खा"), ("खाता", "खा"), ("खाती", "खा"), ("खा", "खा"),
    ("कठिनाइयां", "कठिन"), ("कठिन", "कठिन"),
]


@pytest.mark.parametrize("word,out", HI_NORM_VECTORS)
def test_hindi_normalize(word, out):
    assert hindi_normalize(indic_normalize(word)) == out


@pytest.mark.parametrize("word,stem", HI_STEM_VECTORS)
def test_hindi_stem(word, stem):
    assert hindi_stem(word) == stem


def test_indic_compose():
    # devanagari AA: letter A + vowel sign AA → letter AA
    assert indic_normalize("अा") == "आ"
    # devanagari candra O (3-char rule): A + sign AA + candra E → 0911
    assert indic_normalize("अाॅ") == "ऑ"
    # devanagari qa: KA + nukta → 0958
    assert indic_normalize("क़") == "क़"
    # cross-block sequences don't compose
    assert indic_normalize("अা") == "अা"
    # non-indic text passes through
    assert indic_normalize("hello") == "hello"


def test_chain_and_stops():
    a = HindiAnalyzer()
    # का is a stop word; क़िताब normalizes then stays
    assert a("का क़िताब लडके") == ["किताब", "लडक"]


def test_analyze_flat_agrees_with_call():
    a = HindiAnalyzer()
    texts = ["का क़िताब लडके", "कठिनाइयां गुरुओं दोस्तों"]
    lengths, flat, doc_of, _pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(x) for x in per_doc]
