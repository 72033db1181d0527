"""Compound word decomposition conformance — every
assertTokenStreamContents from the reference's
TestCompoundWordTokenFilter.kt, plus HyphenationTree behavior and the
stacked posInc-0 positions."""

import pytest

from lucene_kmp_ray.analysis.compound import (
    DEFAULT_MAX_SUBWORD_SIZE,
    DEFAULT_MIN_SUBWORD_SIZE,
    DEFAULT_MIN_WORD_SIZE,
    DictionaryCompoundAnalyzer,
    HyphenationCompoundAnalyzer,
    HyphenationTree,
)

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]

_HYPH = None


def _hyph():
    global _HYPH
    if _HYPH is None:
        _HYPH = HyphenationTree.danish()
    return _HYPH


def test_hyphenation_compound_words_da():
    a = HyphenationCompoundAnalyzer(
        _hyph(), ["læse", "hest"], DEFAULT_MIN_WORD_SIZE,
        DEFAULT_MIN_SUBWORD_SIZE, DEFAULT_MAX_SUBWORD_SIZE, False)
    assert a("min veninde som er lidt af en læsehest") == [
        "min", "veninde", "som", "er", "lidt", "af", "en",
        "læsehest", "læse", "hest"]
    # posIncrements 1,1,1,1,1,1,1,1,0,0 — subwords share the position
    _, flat, _, pos = a.analyze_flat(
        ["min veninde som er lidt af en læsehest"])
    assert pos.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 7, 7]


def test_hyphenation_compound_words_de_longest_match():
    a = HyphenationCompoundAnalyzer(
        _hyph(), ["basketball", "basket", "ball", "kurv"],
        DEFAULT_MIN_WORD_SIZE, DEFAULT_MIN_SUBWORD_SIZE, 40, True)
    assert a("basketballkurv") == [
        "basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_only():
    a = HyphenationCompoundAnalyzer(_hyph(), None,
                                    DEFAULT_MIN_WORD_SIZE, 2, 4)
    assert a("basketballkurv") == [
        "basketballkurv", "ba", "sket", "ball", "bal", "kurv"]
    a = HyphenationCompoundAnalyzer(_hyph(), None,
                                    DEFAULT_MIN_WORD_SIZE, 4, 6)
    assert a("basketballkurv") == [
        "basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]


def test_dumb_compound_words_se():
    a = DictionaryCompoundAnalyzer(SE_DICT)
    assert a("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
             "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
             "Skomakare Vindrutetorkare Vindrutetorkarblad abba") == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor", "Biltak",
        "Bil", "tak", "Slagborr", "Slag", "borr", "Hammarborr",
        "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral", "Basfiolsfodral",
        "Bas", "fiol", "fodral", "Basfiolsfodralmakaregesäll", "Bas",
        "fiol", "fodral", "makare", "gesäll", "Skomakare", "Sko",
        "makare", "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]


def test_invalid_parameter_combination():
    with pytest.raises(ValueError):
        DictionaryCompoundAnalyzer(
            ["basketball", "basket", "ball", "kurv"],
            DEFAULT_MIN_WORD_SIZE, DEFAULT_MIN_SUBWORD_SIZE, 40,
            only_longest_match=False, reuse_chars=False)


def test_reuse_chars_false_skips_consumed():
    # reference docstring example: 'schwein' + reuseChars=False keeps
    # only the longer 'schwein', not the inner 'wein'
    a = DictionaryCompoundAnalyzer(
        ["schwein", "wein"], only_longest_match=True, reuse_chars=False)
    assert a("hausschwein") == ["hausschwein", "schwein"]
    b = DictionaryCompoundAnalyzer(
        ["schwein", "wein"], only_longest_match=True, reuse_chars=True)
    assert b("hausschwein") == ["hausschwein", "schwein", "wein"]


def test_hyphenation_tree_basics():
    t = _hyph()
    # hyphenation points for the test word (drives the testHyphenation
    # Only expectations): {0, 2, 6, 9, 10, 14}
    assert t.hyphenate("basketballkurv") == [0, 2, 6, 9, 10, 14]
    # too short / non-letter containing words return None
    assert t.hyphenate("a") is None
    assert t.hyphenate("ab1cd") is None


def test_min_word_size_gate():
    a = DictionaryCompoundAnalyzer(SE_DICT)
    # tokens shorter than minWordSize (5) are never decomposed
    assert a("Bil") == ["Bil"]
