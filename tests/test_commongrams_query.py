"""CommonGramsQueryFilter reference vectors
(TestCommonGramsFilter.kt testCommonGramsQueryFilter — the full s/n
table — and TestCommonGramsQueryFilterFactory.kt testDefaults)."""

import pytest

from lucene_kmp_ray.analysis.filters import common_grams_query_filter

COMMON = frozenset({"s", "of", "the"})  # per the reference test


@pytest.mark.parametrize("text,expected", [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("n n n", ["n", "n", "n"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("n n s", ["n", "n_s"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("n s n", ["n_s", "s_n"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("n s s", ["n_s", "s_s"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("s n n", ["s_n", "n", "n"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("s n s", ["s_n", "n_s"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("s s n", ["s_s", "s_n"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("s s s", ["s_s", "s_s"]),
    ("of the of", ["of_the", "the_of"]),
])
def test_query_filter_vectors(text, expected):
    assert common_grams_query_filter(text.split(), COMMON) == expected


def test_factory_defaults():
    # TestCommonGramsQueryFilterFactory.testDefaults: default stop set
    # contains "the" -> "testing the factory" keeps only the bigrams
    assert common_grams_query_filter(
        "testing the factory".split(), {"the"}) == \
        ["testing_the", "the_factory"]


def test_no_common_words_passthrough():
    assert common_grams_query_filter(["a", "b"], set()) == ["a", "b"]
    assert common_grams_query_filter([], {"the"}) == []
