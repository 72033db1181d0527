"""Nori-semantics Korean analyzer conformance.

Vectors from the reference's own test suite (TestKoreanAnalyzer.kt,
TestKoreanTokenizer.kt) for the lexicon-covered subset; plus the
Latin-corpus reduction sweep backing the bm25_korean SQL oracle.
"""

import re

import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.analysis.korean import KoreanAnalyzer, KoreanTokenizer

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def analyzer():
    return KoreanAnalyzer()


# --- TestKoreanAnalyzer.kt testBasics ---------------------------------


def test_basics_terms_offsets_posinc(analyzer):
    toks = analyzer.analyze_tokens("한국은 대단한 나라입니다.")
    assert [t[0] for t in toks] == ["한국", "대단", "나라", "이"]
    assert [t[1] for t in toks] == [0, 4, 8, 10]
    assert [t[2] for t in toks] == [2, 6, 10, 13]
    assert [t[3] for t in toks] == [1, 2, 3, 1]


def test_tokenizer_decompound_offsets():
    # inverse stop-tags vector: particles/endings with INFLECT morphemes
    # sharing the token span (TestKoreanAnalyzer.kt second vector)
    t = KoreanTokenizer()
    toks = t.tokenize("한국은 대단한 나라입니다.")
    got = [(x.surface, x.start, x.end) for x in toks]
    assert ("은", 2, 3) in got
    assert ("하", 6, 7) in got and ("ᆫ", 6, 7) in got
    assert ("이", 10, 13) in got and ("ᄇ니다", 10, 13) in got


# --- TestKoreanTokenizer.kt 평창 vectors -------------------------------


def test_compound_decompose_offsets():
    t = KoreanTokenizer()
    got = [(x.surface, x.start, x.end)
           for x in t.tokenize("2018 평창 동계올림픽대회")]
    assert got == [("2018", 0, 4), ("평창", 5, 7), ("동계", 8, 10),
                   ("올림픽", 10, 13), ("대회", 13, 15)]


def test_unknown_unigrams():
    t = KoreanTokenizer(output_unknown_unigrams=True)
    got = [x.surface for x in t.tokenize("2018 평창 동계올림픽대회")]
    assert got[:4] == ["2", "0", "1", "8"]


def test_decompound_mode_none():
    t = KoreanTokenizer(mode="none")
    got = [x.surface for x in t.tokenize("동계올림픽대회")]
    assert got == ["동계", "올림픽대회"]


def test_decompound_mode_mixed():
    t = KoreanTokenizer(mode="mixed")
    got = [x.surface for x in t.tokenize("올림픽대회")]
    # morphemes plus the compound surface itself
    assert "올림픽" in got and "대회" in got and "올림픽대회" in got


# --- chain pieces ------------------------------------------------------


def test_pos_stop_tags(analyzer):
    # particles (J*) and endings (E*) removed, nouns kept
    assert analyzer("서울의 올림픽대회") == ["서울", "올림픽", "대회"]


def test_space_penalty_applies():
    # standalone 입니다 after a space still resolves via the lexicon
    a = KoreanAnalyzer()
    assert a("한국 검색 엔진 입니다") == ["한국", "검색", "엔진", "이"]


def test_unknown_hangul_grouped(analyzer):
    # out-of-lexicon hangul run groups into one UNKNOWN token (kept)
    out = analyzer("블록체인")
    assert out == ["블록체인"]


def test_punctuation_discarded(analyzer):
    assert analyzer("!?.") == []
    assert analyzer("") == []


def test_mixed_latin(analyzer):
    assert analyzer("Ray Data 2024") == ["ray", "data", "2024"]


def test_latin_corpus_reduction(analyzer):
    texts = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    pat = re.compile(r"[A-Za-z]+|[0-9]+")
    for s in texts:
        s = s or ""
        assert analyzer(s) == [m.lower() for m in pat.findall(s)]


def test_ko_vectors_reproduce(analyzer):
    from __ray_entry__ import KO_VECTORS
    for phrase, expected in KO_VECTORS:
        assert analyzer(phrase) == expected, phrase


# --- TestKoreanNumberFilter.kt ----------------------------------------


def test_number_normalization():
    from lucene_kmp_ray.analysis.korean import ko_normalize_number as nn
    vecs = [("삼", "3"), ("영삼", "3"), ("십만이천오백", "102500"),
            ("600만", "6000000"), ("천", "1000"), ("10만", "100000"),
            ("일조", "1000000000000"), ("３", "3"), ("００３", "3")]
    for s, e in vecs:
        assert nn(s) == e, s


def test_number_filter_sentence():
    from lucene_kmp_ray.analysis.korean import (KoreanTokenizer,
                                                ko_number_filter)
    t = KoreanTokenizer()
    toks = ko_number_filter(t.tokenize("오늘 십만이천오백원의 와인 구입"))
    assert [(x.surface, x.start, x.end) for x in toks] == [
        ("오늘", 0, 2), ("102500", 3, 9), ("원", 9, 10), ("의", 10, 11),
        ("와인", 12, 14), ("구입", 15, 17)]


def test_number_filter_compound():
    from lucene_kmp_ray.analysis.korean import (KoreanTokenizer,
                                                ko_number_filter)
    t = KoreanTokenizer()
    toks = ko_number_filter(t.tokenize("자본금 600만 원"))
    assert [x.surface for x in toks] == ["자본", "금", "6000000", "원"]


def test_reading_form_hanja(analyzer):
    # TestKoreanReadingFormFilter.kt: hanja folds to its hangul reading
    assert analyzer("車丞相") == ["차", "승상"]


# --- TestKoreanTokenizer.kt user-dictionary vectors --------------------


def test_user_dict_cpp():
    from lucene_kmp_ray.analysis.korean import KoreanTokenizer
    t = KoreanTokenizer(user_dict="c++\nC샤프\n세종\n세종시 세종 시")
    got = [(x.surface, x.start, x.end)
           for x in t.tokenize("c++ 프로그래밍 언어")]
    assert got == [("c++", 0, 3), ("프로그래밍", 4, 9), ("언어", 10, 12)]


def test_user_dict_segmented_compound():
    from lucene_kmp_ray.analysis.korean import KoreanTokenizer
    t = KoreanTokenizer(user_dict="세종시 세종 시")
    assert [(x.surface, x.start, x.end) for x in t.tokenize("세종시")] == \
        [("세종", 0, 2), ("시", 2, 3)]
    # NONE mode keeps the user compound whole
    t2 = KoreanTokenizer(mode="none", user_dict="세종시 세종 시")
    assert [x.surface for x in t2.tokenize("세종시")] == ["세종시"]
