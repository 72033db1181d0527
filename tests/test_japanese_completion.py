"""JapaneseCompletionFilter + KatakanaRomanizer conformance
(TestJapaneseCompletionFilter.kt vectors; IME-fragment inputs are
width-folded upfront, which is where our chain applies CJKWidth)."""

import pytest

from lucene_kmp_ray.analysis.completion import (
    JapaneseCompletionAnalyzer,
    romanize_keystrokes,
)
from lucene_kmp_ray.analysis.japanese import cjk_width_fold_offsets

INDEX_VECTORS = [
    ("東京", ["東京", "toukyou"]),
    ("東京都", ["東京", "toukyou", "都", "to"]),
    ("ドラえもん", ["ドラえもん", "doraemon", "doraemonn"]),
    ("ソースコード", ["ソース", "soーsu", "コード", "koーdo"]),
    ("々", ["々"]),
    ("是々", ["是", "ze", "々"]),
    ("是々の", ["是", "ze", "々", "の", "no"]),
]

QUERY_VECTORS = [
    ("東京", ["東京", "toukyou"]),
    ("東京都", ["東京", "toukyou", "都", "to"]),
    ("ドラえもん", ["ドラえもん", "doraemon", "doraemonn"]),
    # QUERY mode concatenates the kana run into one pending token
    ("ソースコード", ["ソースコード", "soーsukoーdo"]),
    ("反社会的勢力", ["反", "han", "hann", "社会", "syakai", "shakai",
                      "的", "teki", "勢力", "seiryoku"]),
    ("々", ["々"]),
    ("是々", ["是", "ze", "々"]),
]

IME_VECTORS = [
    ("東京ｔ", ["東京t", "toukyout"]),
    ("サッｋ", ["サッk", "sakk"]),
    ("反ｓｙ", ["反sy", "hansy", "hannsy"]),
    ("さーきゅｒ", ["さーきゅr", "saーkyur"]),
]


@pytest.mark.parametrize("text,expected", INDEX_VECTORS)
def test_completion_index(text, expected):
    a = JapaneseCompletionAnalyzer(mode="index")
    assert a(text) == expected


@pytest.mark.parametrize("text,expected", QUERY_VECTORS)
def test_completion_query(text, expected):
    a = JapaneseCompletionAnalyzer(mode="query")
    assert a(text) == expected


@pytest.mark.parametrize("text,expected", IME_VECTORS)
def test_completion_query_ime_fragment(text, expected):
    a = JapaneseCompletionAnalyzer(mode="query")
    folded, _ = cjk_width_fold_offsets(text)
    assert a(folded) == expected


def test_romanizer_variants():
    assert romanize_keystrokes("シャ") == ["sya", "sha"]
    # cartesian expansion across keystrokes
    out = romanize_keystrokes("ジャジャ")
    assert set(out) == {"zyazya", "jazya", "zyaja", "jaja"}
    # sokuon digraphs
    assert "sakk" in romanize_keystrokes("サッk")
