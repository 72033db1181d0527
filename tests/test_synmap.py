"""Synonym file parsers + multi-word SynonymFilter — every
assertAnalyzesTo from the reference's TestSolrSynonymParser.kt and
TestWordnetSynonymParser.kt, plus the ParseException contracts."""

import pyarrow.compute as pc
import pytest

from lucene_kmp_ray.analysis.core import (
    KeywordAnalyzer,
    SimpleAnalyzer,
    WhitespaceAnalyzer,
)
from lucene_kmp_ray.analysis.standard import EnglishAnalyzer
from lucene_kmp_ray.analysis.synmap import (
    SolrSynonymParser,
    SynonymFilterAnalyzer,
    SynonymParseError,
    WordnetSynonymParser,
)


class LowerWS:
    """MockTokenizer.WHITESPACE with lowercase=true."""

    def __call__(self, text):
        return [t.lower() for t in WhitespaceAnalyzer()(text)]

    def analyze_flat(self, texts):
        dl, flat, doc, pos = WhitespaceAnalyzer().analyze_flat(texts)
        return dl, pc.utf8_lower(flat), doc, pos


def _posinc(analyzer, text):
    r = analyzer.tokens_pos(text)
    toks = [t for t, _ in r]
    incs, prev = [], -1
    for _, p in r:
        incs.append(p - prev)
        prev = p
    return toks, incs


WORDNET = ("s(100000001,1,'woods',n,1,0).\n"
           "s(100000001,2,'wood',n,1,0).\n"
           "s(100000001,3,'forest',n,1,0).\n"
           "s(100000002,1,'wolfish',n,1,0).\n"
           "s(100000002,2,'ravenous',n,1,0).\n"
           "s(100000003,1,'king',n,1,1).\n"
           "s(100000003,2,'baron',n,1,1).\n"
           "s(100000004,1,'king''s evil',n,1,1).\n"
           "s(100000004,2,'king''s meany',n,1,1).\n")


def test_solr_simple():
    testFile = ("i-pod, ipod, ipoooood\n" "foo => foo bar\n"
                "foo => baz\n" "this test, that testing")
    m = SolrSynonymParser(True, True, LowerWS()).parse(testFile).build()
    a = SynonymFilterAnalyzer(m, base=LowerWS())
    assert _posinc(a, "ball") == (["ball"], [1])
    assert _posinc(a, "i-pod") == (["i-pod", "ipod", "ipoooood"],
                                   [1, 0, 0])
    assert _posinc(a, "foo") == (["foo", "baz", "bar"], [1, 0, 1])
    assert _posinc(a, "this test") == (
        ["this", "that", "test", "testing"], [1, 0, 1, 0])


def test_solr_position_length_simple():
    m = SolrSynonymParser(True, True, LowerWS()) \
        .parse("spider man, spiderman").build()
    a = SynonymFilterAnalyzer(m, base=LowerWS())
    assert _posinc(a, "spider man") == (
        ["spider", "spiderman", "man"], [1, 0, 1])


def test_solr_escaped():
    m = SolrSynonymParser(True, True, KeywordAnalyzer()) \
        .parse("a\\=>a => b\\=>b\n" "a\\,a => b\\,b").build()
    a = SynonymFilterAnalyzer(m, base=KeywordAnalyzer())
    assert a("ball") == ["ball"]
    assert a("a=>a") == ["b=>b"]
    assert a("a,a") == ["b,b"]


def test_solr_invalid_double_map():
    with pytest.raises(SynonymParseError):
        SolrSynonymParser(True, True, LowerWS()).parse("a => b => c")


def test_solr_invalid_analyzes_to_nothing():
    for f in ("a => 1", "1 => a"):
        with pytest.raises(SynonymParseError):
            SolrSynonymParser(True, True, SimpleAnalyzer()).parse(f)


def test_solr_invalid_positions():
    # "the" is an English stopword -> posinc gap inside the phrase
    for f in ("testola => the test", "the test => testola"):
        with pytest.raises(SynonymParseError):
            SolrSynonymParser(True, True, EnglishAnalyzer()).parse(f)


def test_wordnet_synonyms():
    m = WordnetSynonymParser(True, True, WhitespaceAnalyzer()) \
        .parse(WORDNET).build()
    a = SynonymFilterAnalyzer(m, base=WhitespaceAnalyzer())
    assert _posinc(a, "Lost in the woods") == (
        ["Lost", "in", "the", "woods", "wood", "forest"],
        [1, 1, 1, 1, 0, 0])
    assert a("king") == ["king", "baron"]
    assert _posinc(a, "king's evil") == (
        ["king's", "king's", "evil", "meany"], [1, 0, 1, 0])
    assert _posinc(a, "Lost in the forest") == (
        ["Lost", "in", "the", "forest", "woods", "wood"],
        [1, 1, 1, 1, 0, 0])


def test_wordnet_contract():
    m = WordnetSynonymParser(True, False, WhitespaceAnalyzer()) \
        .parse(WORDNET).build()
    a = SynonymFilterAnalyzer(m, base=WhitespaceAnalyzer())
    # contract: every synset member maps to the FIRST member
    assert a("wood") == ["woods"]
    assert a("forest") == ["woods"]
    assert a("baron") == ["king"]


def test_greedy_longest_match_non_overlapping():
    m = SolrSynonymParser(True, True, LowerWS()) \
        .parse("a b c => abc\n" "a b => ab").build()
    a = SynonymFilterAnalyzer(m, base=LowerWS())
    assert a("a b c") == ["abc"]      # longest wins
    assert a("a b x") == ["ab", "x"]  # shorter rule after failed longest
    assert a("a b a b") == ["ab", "ab"]  # non-overlapping restart


def test_analyze_flat_matches_calls():
    m = SolrSynonymParser(True, True, LowerWS()) \
        .parse("foo => foo bar").build()
    a = SynonymFilterAnalyzer(m, base=LowerWS())
    dl, flat, doc, pos = a.analyze_flat(["foo x", ""])
    assert flat.to_pylist() == ["foo", "bar", "x"]
    assert dl.tolist() == [3, 0]
    assert pos.tolist() == [0, 1, 2]
