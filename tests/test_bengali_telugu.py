"""Bengali + Telugu analyzer conformance.

Vectors extracted VERBATIM (exact codepoints) from reference
TestBengali{Normalizer,Stemmer}.kt and TestTelugu{Normalizer,Stemmer}.kt.
Normalizer vectors run indic-compose + language normalizer (as the
reference filter chains do); stemmer vectors run the stem filter alone
(as the reference stemmer tests do).
"""

import pytest

from lucene_kmp_ray.analysis.indic import (BengaliAnalyzer, TeluguAnalyzer,
                                           bengali_normalize, bengali_stem,
                                           indic_normalize, telugu_normalize,
                                           telugu_stem)

BN_NORM_VECTORS = [
    ('চাঁদ', 'চাদ'),
    ('বাড়ী', 'বারি'),
    ('তীর', 'তির'),
    ('ভূল', 'ভুল'),
    ('অনূপ', 'অনুপ'),
    ('বাঙলা', 'বাংলা'),
    ('ব্যাক্তি', 'বেক্তি'),
    ('সন্ধ্যা', 'সন্ধা'),
    ('স্বদেশ', 'সদেস'),
    ('তত্ত্ব', 'তত্ত'),
    ('বিশ্ব', 'বিসস'),
    ('দুঃখ', 'দুখখ'),
    ('উঃ', 'উহ'),
    ('পুনঃ', 'পুন'),
    ('কণা', 'কনা'),
    ('শরীর', 'সরির'),
    ('বাড়ি', 'বারি'),
]

BN_STEM_VECTORS = [
    ('করেছিলাম', 'কর'),
    ('করিতেছিলে', 'কর'),
    ('খাইতাম', 'খাই'),
    ('যাইবে', 'যা'),
    ('করছিলাম', 'কর'),
    ('করছিলে', 'কর'),
    ('করতাম', 'কর'),
    ('যাব', 'যা'),
    ('যাবে', 'যা'),
    ('করি', 'কর'),
    ('করো', 'কর'),
    ('মেয়েরা', 'মে'),
    ('মেয়েদেরকে', 'মে'),
    ('মেয়েদের', 'মে'),
    ('একটি', 'এক'),
    ('মানুষগুলি', 'মানুষ'),
]

TE_NORM_VECTORS = [
    ('పదాలూ', 'పదాలు'),
    ('అబ్బాయీ', 'అబ్బాయి'),
    ('ఃౌైాిు', 'ౌైాిు'),
    ('ఔఐఆఈఊ', 'ఓఏఅఇఉ'),
]

TE_STEM_VECTORS = [
    ('వస్తువులు', 'వస్తువు'),
    ('పన్నులు', 'పన్ను'),
    ('చేపిస్తున్నది', 'చేపిస్తున్న'),
    ('చేపిస్తున్నడు', 'చేపిస్తున్న'),
]


@pytest.mark.parametrize("word,out", BN_NORM_VECTORS)
def test_bengali_normalize(word, out):
    assert bengali_normalize(indic_normalize(word)) == out


@pytest.mark.parametrize("word,stem", BN_STEM_VECTORS)
def test_bengali_stem(word, stem):
    assert bengali_stem(word) == stem


@pytest.mark.parametrize("word,out", TE_NORM_VECTORS)
def test_telugu_normalize(word, out):
    assert telugu_normalize(indic_normalize(word)) == out


@pytest.mark.parametrize("word,stem", TE_STEM_VECTORS)
def test_telugu_stem(word, stem):
    assert telugu_stem(word) == stem


def test_chains_and_stops():
    assert BengaliAnalyzer()("\u098f\u0987 \u0995\u09b0\u09c7\u099b\u09bf\u09b2\u09be\u09ae") == ["\u0995\u09b0"]
    # the full Telugu chain includes IndicNormalizer, whose TELUGU-MA
    # rule composes \u0c35\u0c41 before stemming (reference behavior)
    assert TeluguAnalyzer()("\u0c12\u0c15 \u0c35\u0c38\u0c4d\u0c24\u0c41\u0c35\u0c41\u0c32\u0c41") == ["\u0c35\u0c38\u0c4d\u0c24\u0c41\u0c2e"]


def test_analyze_flat_agrees_with_call():
    for cls, texts in [
        (BengaliAnalyzer, [v[0] + " " + w[0]
                           for v, w in zip(BN_NORM_VECTORS[:3],
                                           BN_STEM_VECTORS[:3])]),
        (TeluguAnalyzer, [v[0] + " " + w[0]
                          for v, w in zip(TE_NORM_VECTORS[:2],
                                          TE_STEM_VECTORS[:2])]),
    ]:
        a = cls()
        lengths, flat, doc_of, _pos = a.analyze_flat(texts)
        toks = flat.to_pylist()
        per_doc = [[] for _ in texts]
        for t, d in zip(toks, doc_of):
            per_doc[d].append(t)
        assert per_doc == [a(t) for t in texts], cls.__name__
        assert list(lengths) == [len(x) for x in per_doc]
