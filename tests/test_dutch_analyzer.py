"""DutchAnalyzer conformance: reference TestDutchAnalyzer.kt vectors.

Covers the snowball Dutch stemmer (prelude Y/I marking, R1/R2 suffix
steps, undoubling, step-4 vowel undoubling, postlude) plus the
DEFAULT_STEM_DICT overrides and the stop list.
"""

import pytest

from lucene_kmp_ray.analysis.dutch import (DUTCH_STOP_WORDS, DutchAnalyzer,
                                           dutch_stem)

# reference analysis/common/.../nl/TestDutchAnalyzer.kt testWithSnowballExamples
SNOWBALL_VECTORS = [
    ("lichaamsziek", "lichaamsziek"), ("lichamelijk", "licham"),
    ("lichamelijke", "licham"), ("lichamelijkheden", "licham"),
    ("lichamen", "licham"), ("lichere", "licher"), ("licht", "licht"),
    ("lichtbeeld", "lichtbeeld"), ("lichtbruin", "lichtbruin"),
    ("lichtdoorlatende", "lichtdoorlat"), ("lichte", "licht"),
    ("lichten", "licht"), ("lichtende", "lichtend"),
    ("lichtenvoorde", "lichtenvoord"), ("lichter", "lichter"),
    ("lichtere", "lichter"), ("lichters", "lichter"),
    ("lichtgevoeligheid", "lichtgevoel"), ("lichtgewicht", "lichtgewicht"),
    ("lichtgrijs", "lichtgrijs"), ("lichthoeveelheid", "lichthoevel"),
    ("lichtintensiteit", "lichtintensiteit"), ("lichtje", "lichtj"),
    ("lichtjes", "lichtjes"), ("lichtkranten", "lichtkrant"),
    ("lichtkring", "lichtkring"), ("lichtkringen", "lichtkring"),
    ("lichtregelsystemen", "lichtregelsystem"), ("lichtste", "lichtst"),
    ("lichtstromende", "lichtstrom"), ("lichtte", "licht"),
    ("lichtten", "licht"), ("lichttoetreding", "lichttoetred"),
    ("lichtverontreinigde", "lichtverontreinigd"),
    ("lichtzinnige", "lichtzinn"), ("lid", "lid"), ("lidia", "lidia"),
    ("lidmaatschap", "lidmaatschap"), ("lidstaten", "lidstat"),
    ("lidvereniging", "lidveren"), ("opgingen", "opging"),
    ("opglanzing", "opglanz"), ("opglanzingen", "opglanz"),
    ("opglimlachten", "opglimlacht"), ("opglimpen", "opglimp"),
    ("opglimpende", "opglimp"), ("opglimping", "opglimp"),
    ("opglimpingen", "opglimp"), ("opgraven", "opgrav"),
    ("opgrijnzen", "opgrijnz"), ("opgrijzende", "opgrijz"),
    ("opgroeien", "opgroei"), ("opgroeiende", "opgroei"),
    ("opgroeiplaats", "opgroeiplat"), ("ophaal", "ophal"),
    ("ophaaldienst", "ophaaldienst"), ("ophaalkosten", "ophaalkost"),
    ("ophaalsystemen", "ophaalsystem"), ("ophaalt", "ophaalt"),
    ("ophaaltruck", "ophaaltruck"), ("ophalen", "ophal"),
    ("ophalend", "ophal"), ("ophalers", "ophaler"), ("ophef", "ophef"),
    ("opheldering", "ophelder"), ("ophemelde", "ophemeld"),
    ("ophemelen", "ophemel"), ("opheusden", "opheusd"),
    ("ophief", "ophief"), ("ophield", "ophield"),
    ("ophieven", "ophiev"), ("ophoepelt", "ophoepelt"),
    ("ophoog", "ophog"), ("ophoogzand", "ophoogzand"),
    ("ophopen", "ophop"), ("ophoping", "ophop"),
    ("ophouden", "ophoud"),
    # testSnowballCorrectness
    ("opheffen", "opheff"), ("opheffende", "opheff"),
    ("opheffing", "opheff"),
]


@pytest.mark.parametrize("word,stem", SNOWBALL_VECTORS)
def test_snowball_vectors(word, stem):
    assert dutch_stem(word) == stem


def test_stem_overrides():
    # TestDutchAnalyzer.testStemOverrides: dict bypasses the stemmer
    a = DutchAnalyzer()
    assert a("fiets") == ["fiets"]
    assert a("bromfiets") == ["bromfiets"]
    assert a("ei") == ["eier"]
    assert a("kind") == ["kinder"]
    # without the override "kind" would stem to itself anyway, but "ei"
    # maps to a term the stemmer would never produce
    assert dutch_stem("ei") == "ei"


def test_prelude_marking():
    # y after vowel and i between vowels act as consonants
    assert dutch_stem("ophaaiyen") == dutch_stem("ophaaiyen")
    # accent fold: é→e before stemming
    assert dutch_stem("café") == dutch_stem("cafe")


def test_stop_and_chain():
    a = DutchAnalyzer()
    assert a("de lichamen en het licht") == ["licham", "licht"]
    assert "de" in DUTCH_STOP_WORDS and "het" in DUTCH_STOP_WORDS


def test_analyze_flat_agrees_with_call():
    a = DutchAnalyzer()
    texts = ["de lichamen lichtgevoeligheid", "ophalen fiets ei",
             "kind opheffende café"]
    lengths, flat, doc_of, _pos = a.analyze_flat(texts)
    toks = flat.to_pylist()
    per_doc = [[] for _ in texts]
    for t, d in zip(toks, doc_of):
        per_doc[d].append(t)
    assert per_doc == [a(t) for t in texts]
    assert list(lengths) == [len(x) for x in per_doc]
