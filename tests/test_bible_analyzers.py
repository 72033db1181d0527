"""Bible analyzer family conformance — every assertAnalyzesTo from the
reference's TestBible*Analyzer.kt files (17 chains), the NT-scope
helpers, posInc-0 stacking positions, and flat/per-doc agreement."""

import numpy as np
import pytest

from lucene_kmp_ray.analysis.bible import (
    BIBLE_ANALYZERS,
    ru_requires_new_testament_scope,
    sv_requires_new_testament_scope,
    uk_requires_new_testament_scope,
)

# (lang, text, expected tokens) — reference test vectors, verbatim.
VECTORS = [
    # TestBibleEnglishAnalyzer.kt
    ("en", "weep weeps weeping wept", ["weep", "weep", "weep", "weep"]),
    # TestBibleGermanAnalyzer.kt
    ("de", "Jesu Christi", ["jesu", "jesus", "christi", "christus"]),
    ("de", "Jesus Christus", ["jesus", "christus"]),
    ("de", "Jesum Christum", ["jesum", "jesus", "christum", "christus"]),
    ("de", "Jesu Christo", ["jesu", "jesus", "christo", "christus"]),
    ("de", "von Jesus Christus", ["jesus", "christus"]),
    # TestBibleSpanishAnalyzer.kt
    ("es", "Jesucristo", ["jesucrist", "jesus", "crist"]),
    ("es", "Jesús", ["jesus"]),
    ("es", "Cristo", ["crist"]),
    # TestBiblePortugueseAnalyzer.kt
    ("pt", "Jesus", ["jesus"]),
    ("pt", "Jesua", ["jesu"]),
    ("pt", "Jesus Cristo", ["jesus", "cristo"]),
    # TestBibleSwedishAnalyzer.kt
    ("sv", "Jesu Kristi", ["jesu", "jesus", "kristi", "kristus"]),
    ("sv", "Jesus Kristus", ["jesus", "kristus"]),
    ("sv", "av Jesus Kristus", ["jesus", "kristus"]),
    # TestBibleRussianAnalyzer.kt
    ("ru", "Иисуса", ["иисуса", "иисус"]),
    ("ru", "Иисусу", ["иисусу", "иисус"]),
    ("ru", "Иисуса Христа", ["иисуса", "иисус", "христа", "христос"]),
    ("ru", "Иисусом Христом", ["иисусом", "иисус", "христом", "христос"]),
    # TestBibleHindiAnalyzer.kt
    ("hi", "यीशु", ["यीशु"]),
    ("hi", "यिशै", ["यिश"]),
    ("hi", "यीशु मसीह", ["यीशु", "मसीह"]),
    # TestBibleBengaliAnalyzer.kt
    ("bn", "যীশু", ["যিসু"]),
    ("bn", "যীশুর", ["যিসুর", "যিসু"]),
    ("bn", "খ্রীষ্ট", ["খ্রিস্ট"]),
    ("bn", "খ্রীষ্টের", ["খ্রিস্টের", "খ্রিস্ট"]),
    # TestBibleTeluguAnalyzer.kt
    ("te", "యేసు క్రీస్తు", ["యెసు", "క్రిస్త"]),
    ("te", "యేసు క్రీస్తులో", ["యెసు", "క్రిస్తులొ", "క్రిస్త"]),
    ("te", "యేసు క్రీస్తుతోను", ["యెసు", "క్రిస్తుతొను", "క్రిస్త"]),
    # TestBibleTamilAnalyzer.kt
    ("ta", "இயேசுகிறிஸ்துவின்",
     ["இயேசுகிறிஸ்துவின்", "இயேசுகிறிஸ்து", "இயேசு", "கிறிஸ்து"]),
    ("ta", "இயேசுகிறிஸ்துவைக்கொண்டு",
     ["இயேசுகிறிஸ்துவைக்கொண்டு", "இயேசுகிறிஸ்து", "இயேசு", "கிறிஸ்து"]),
    # TestBibleMarathiAnalyzer.kt
    ("mr", "ख्रिस्त येशू", ["येश", "खरिसत"]),
    ("mr", "येशू ख्रिस्त", ["येश", "खरिसत"]),
    # TestBibleTagalogAnalyzer.kt
    ("tl", "Jesucristo", ["jesucristo", "jesus", "cristo"]),
    ("tl", "Jesus", ["jesus"]),
    ("tl", "Cristo", ["cristo"]),
    # TestBibleVietnameseAnalyzer.kt
    ("vi", "Jêsus-Christ", ["jesus", "christ"]),
    ("vi", "Jêsus Christ", ["jesus", "christ"]),
    ("vi", "Jêsus", ["jesus"]),
    ("vi", "Christ", ["christ"]),
    ("vi", "Tin lành Chúa Jêsus Christ cứu",
     ["tin lanh", "chua jesus", "jesus", "christ cuu", "christ"]),
    # TestBibleJapaneseAnalyzer.kt
    ("ja", "キリスト・イエス", ["イエス", "キリスト"]),
    ("ja", "イエス・キリスト", ["イエス", "キリスト"]),
    # TestBibleKoreanAnalyzer.kt
    ("ko", "예수아", ["예수아"]),
    ("ko", "예수", ["예수"]),
    ("ko", "예수 그리스도", ["예수", "그리스도"]),
    # TestBibleUkrainianAnalyzer.kt
    ("uk", "Ісуса", ["ісуса", "ісус"]),
    ("uk", "Ісуса Христа", ["ісуса", "ісус", "христа", "христос"]),
    ("uk", "Ісусом Христом", ["ісусом", "ісус", "христом", "христос"]),
]

_INST = {}


def _an(lang):
    if lang not in _INST:
        _INST[lang] = BIBLE_ANALYZERS[lang]()
    return _INST[lang]


@pytest.mark.parametrize("lang,text,want", VECTORS,
                         ids=[f"{l}-{i}" for i, (l, _, _) in
                              enumerate(VECTORS)])
def test_reference_vectors(lang, text, want):
    assert _an(lang)(text) == want


@pytest.mark.parametrize("lang,text,want", VECTORS,
                         ids=[f"{l}-{i}" for i, (l, _, _) in
                              enumerate(VECTORS)])
def test_analyze_flat_agrees(lang, text, want):
    dl, flat, doc_of, pos = _an(lang).analyze_flat(["", text, text])
    toks = flat.to_pylist()
    n = len(want)
    assert dl.tolist() == [0, n, n]
    assert toks[:n] == want and toks[n:] == want
    assert doc_of.tolist() == [1] * n + [2] * n


def test_stacked_positions_posinc_zero():
    # TestBibleGermanAnalyzer posIncrements = [1, 0, 1, 0]
    _, flat, _, pos = _an("de").analyze_flat(["Jesu Christi"])
    assert flat.to_pylist() == ["jesu", "jesus", "christi", "christus"]
    assert pos.tolist() == [0, 0, 1, 1]
    # TestBibleTamilAnalyzer posIncrements = [1, 0, 0, 0]
    _, flat, _, pos = _an("ta").analyze_flat(["இயேசுகிறிஸ்துவின்"])
    assert pos.tolist() == [0, 0, 0, 0]
    # TestBibleTeluguAnalyzer [1, 1, 0]
    _, flat, _, pos = _an("te").analyze_flat(["యేసు క్రీస్తులో"])
    assert pos.tolist() == [0, 1, 1]


def test_vietnamese_compound_split_positions():
    # the compound replace emits christ at posInc 1 and shifts the rest
    a = _an("vi")
    tp = a._tokens_pos("Tin lành Chúa Jêsus Christ cứu")
    assert tp == [("tin lanh", 0), ("chua jesus", 1), ("jesus", 1),
                  ("christ cuu", 2), ("christ", 2)]
    tp = a._tokens_pos("Jêsus Christ amen")
    assert tp == [("jesus", 0), ("christ", 1), ("amen", 2)]


def test_marathi_reference_contains_assertions():
    a = _an("mr")
    t1 = a("अब्राहामाचा पुत्र दावीद याचा पुत्र जो येशू ख्रिस्त याची वंशावळ.")
    assert "येश" in t1 and "खरिसत" in t1
    t2 = a("येशू ख्रिस्ताचा दास")
    assert "येश" in t2 and "खरिसत" in t2
    t3 = a("गुप्त गोष्टींचा ख्रिस्त येशूकडून न्याय करील")
    assert "येश" in t3 and "खरिसत" in t3
    t4 = a("येशूवर विश्वास आणि ख्रिस्तावरील कृपा")
    assert "येश" in t4 and "खरिसत" in t4


def test_nt_scope_helpers():
    assert ru_requires_new_testament_scope("Иисуса")
    assert ru_requires_new_testament_scope("Христа")
    assert ru_requires_new_testament_scope("Иисуса Христа")
    assert not ru_requires_new_testament_scope("Иисуса, сына Навина")
    assert not ru_requires_new_testament_scope("Иисус Навин")
    assert sv_requires_new_testament_scope("Jesu")
    assert sv_requires_new_testament_scope("Jesu Kristi")
    assert sv_requires_new_testament_scope("Kristi")
    assert not sv_requires_new_testament_scope("Jesua")
    assert uk_requires_new_testament_scope("Ісуса")
    assert uk_requires_new_testament_scope("Ісуса Христа")
    assert not uk_requires_new_testament_scope("Ісус Навин")
    assert not uk_requires_new_testament_scope("Ісуса, сина Навина")


def test_nepali_zwj_strip_and_chain():
    a = _an("ne")
    # ZWNJ/ZWJ inside a word is stripped pre-tokenization
    assert a("श्री‌मान्") == a("श्रीमान्")
    assert a("श्री‍मान्") == a("श्रीमान्")


def test_random_strings_smoke():
    # checkRandomData analog: no chain crashes or emits empty tokens
    import random
    rng = random.Random(42)
    alphabet = ("abc ABC '’ яи ісж যীশুখ యేసుక இயேசுகி येशूख्रि 123 "
                "イエス・キ 예수그 Jêsus-")
    for lang in BIBLE_ANALYZERS:
        a = _an(lang)
        for _ in range(25):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 40)))
            toks = a(s)
            assert all(isinstance(t, str) and t for t in toks), (lang, s)
