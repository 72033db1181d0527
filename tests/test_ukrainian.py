"""UkrainianAnalyzer — the reference's UkrainianMorfologikAnalyzer chain
(char normalization → tokenize → shipped stop list → curated morfologik
lemma fan-out). Every assertion is a published reference vector
(TestUkrainianAnalyzer.kt:24-113)."""

from lucene_kmp_ray.analysis.ukrainian import (UkrainianAnalyzer,
                                               _stops, normalize)


def _a():
    return UkrainianAnalyzer()


def test_digits_kept():
    # testDigitsInUkrainianCharset
    assert _a()("text 1000") == ["text", "1000"]


def test_reusable_token_stream():
    a = _a()
    expected = ["п'єса", "черга", "рухатися", "емоційно", "напружений",
                "кола", "коло", "кіл", "ритм", "енд", "блюз"]
    text = ("Ця п'єса, у свою чергу, рухається по емоційно-напруженому "
            "колу за ритм-енд-блюзом.")
    assert a(text) == expected
    assert a(text) == expected  # reuse


def test_special_chars_normalized():
    # testSpecialCharsTokenStream: 6 apostrophe/accent variants all
    # conflate to the same lemma
    text = "м'яса м'я́са мʼяса м’яса м‘яса м`яса"
    assert _a()(text) == ["м'ясо"] * 6


def test_caps_and_multi_lemma():
    # testCapsTokenStream: capitalized dictionary lemmas, stop "цих"/"і"
    assert _a()("Цих Чайковського і Ґете.") == \
        ["Чайковське", "Чайковський", "Гете"]


def test_char_normalization_ghe():
    # testCharNormalization: Ґ -> Г before lookup
    assert _a()("Ґюмрі та Гюмрі.") == ["Гюмрі", "Гюмрі"]


def test_sample_sentence():
    assert _a()("Це — проект генерування словника з тегами частин мови "
                "для української мови.") == \
        ["проект", "генерування", "словник", "тег", "частина", "мова",
         "українська", "український", "Українська", "мова"]


def test_default_stopwords():
    # testDefaultStopWords: the shipped list carries "аби"
    assert "аби" in _stops()
    assert len(_stops()) > 1200


def test_normalize_map():
    assert normalize("м’яса") == "м'яса"
    assert normalize("Ґґ") == "Гг"
    assert normalize("м'я́са") == "м'яса"
    assert normalize("со­фт") == "софт"


def test_analyze_flat_agrees_with_callable():
    a = _a()
    texts = ["Ця п'єса, у свою чергу", "", "text 1000",
             "Цих Чайковського і Ґете."]
    lengths, flat, doc_of, positions = a.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(flat.to_pylist(), doc_of):
        per_doc[d].append(t)
    for i, text in enumerate(texts):
        assert per_doc[i] == a(text)
        assert lengths[i] == len(per_doc[i])
