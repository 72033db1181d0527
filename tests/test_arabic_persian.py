"""Arabic + Persian analyzer conformance.

Vectors from reference TestArabic{NormalizationFilter,StemFilter}.kt
and TestPersian{NormalizationFilter,StemFilter}.kt.
"""

import pytest

from lucene_kmp_ray.analysis.arabic import (ArabicAnalyzer, PersianAnalyzer,
                                            arabic_normalize, arabic_stem,
                                            fold_digits, persian_normalize,
                                            persian_stem)

AR_NORM_VECTORS = [
    ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"),
    ("بنى", "بني"), ("فاطمة", "فاطمه"),
    ("روبرـــــت", "روبرت"), ("مَبنا", "مبنا"),
    ("علِي", "علي"), ("بُوات", "بوات"), ("ولداً", "ولدا"),
    ("ولدٍ", "ولد"), ("ولدٌ", "ولد"), ("نلْسون", "نلسون"),
    ("هتميّ", "هتمي"),
]

AR_STEM_VECTORS = [
    ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"),
    ("كالحسن", "حسن"), ("فالحسن", "حسن"), ("للاخر", "اخر"),
    ("وحسن", "حسن"),
    ("زوجها", "زوج"), ("ساهدان", "ساهد"), ("ساهدات", "ساهد"),
    ("ساهدون", "ساهد"), ("ساهدين", "ساهد"), ("ساهديه", "ساهد"),
    ("ساهدية", "ساهد"), ("ساهده", "ساهد"), ("ساهدة", "ساهد"),
    ("ساهدي", "ساهد"), ("وساهدون", "ساهد"), ("ساهدهات", "ساهد"),
    # shouldn't stem (length guards)
    ("الو", "الو"), ("English", "English"),
]

FA_NORM_VECTORS = [
    ("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
    ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"), ("زادہ", "زاده"),
]


@pytest.mark.parametrize("word,out", AR_NORM_VECTORS)
def test_arabic_normalize(word, out):
    assert arabic_normalize(word) == out


@pytest.mark.parametrize("word,out", AR_STEM_VECTORS)
def test_arabic_stem(word, out):
    assert arabic_stem(word) == out


@pytest.mark.parametrize("word,out", FA_NORM_VECTORS)
def test_persian_normalize(word, out):
    assert persian_normalize(arabic_normalize(word)) == out


def test_persian_stem():
    # cumulative suffix strip with >=2-char remainder guards
    assert persian_stem("كتابها") == "كتاب"
    assert persian_stem("كتابترين") == "كتاب"
    assert persian_stem("كتابات") == "كتاب"
    assert persian_stem("كت") == "كت"


def test_fold_digits():
    assert fold_digits("١٢٣") == "123"      # arabic-indic
    assert fold_digits("۱۲۳") == "123"      # extended arabic-indic
    assert fold_digits("abc123") == "abc123"


def test_chains():
    a = ArabicAnalyzer()
    # stop word removed raw (قد), normalization + stem applied after
    assert a("قد الحسن") == ["حسن"]
    p = PersianAnalyzer()
    # normalized form matches the normalized stop list (که → كه)
    assert p("که کتاب") == ["كتاب"]


def test_analyze_flat_agrees_with_call():
    for cls, texts in [
        (ArabicAnalyzer, ["قد الحسن زوجها", "ساهدون بالحسن"]),
        (PersianAnalyzer, ["که کتابها", "زادہ های"]),
    ]:
        a = cls()
        lengths, flat, doc_of, _pos = a.analyze_flat(texts)
        toks = flat.to_pylist()
        per_doc = [[] for _ in texts]
        for t, d in zip(toks, doc_of):
            per_doc[d].append(t)
        assert per_doc == [a(t) for t in texts], cls.__name__
        assert list(lengths) == [len(x) for x in per_doc]
