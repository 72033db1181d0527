"""Reference vectors for the r5 session-8 miscellaneous filters.

Vectors come straight from the reference's live tests:
TestConcatenateGraphFilter.kt, TestDateRecognizerFilter.kt,
TestDelimitedTermFrequencyTokenFilter.kt, TestDropIfFlaggedFilter.kt,
TestKeywordMarkerFilter.kt (incl. the LUCENE-2901 composition),
TestLimitTokenOffsetFilter.kt, TestLimitTokenPositionFilter.kt and
TestConditionalTokenFilter.kt testSimple.
"""

import re

import pytest

from lucene_kmp_ray.analysis.filters_misc import (
    CONCAT_SEP, apply_unless_keyword, concatenate_graph_filter,
    concatenating_token_stream, conditional_filter,
    date_recognizer_filter, delimited_term_frequency, drop_if_flagged,
    english_default_date_recognizer, limit_token_offset_filter,
    limit_token_position_filter, pattern_date_recognizer,
    pattern_keyword_marks, set_keyword_marks)

S = CONCAT_SEP


def test_concatenate_graph_basic():
    assert CONCAT_SEP == "\u001f"
    assert concatenate_graph_filter(["mykeyword"]) == ["mykeyword"]
    assert concatenate_graph_filter(
        ["mykeyword", "another", "keyword"], sep=None,
        preserve_pos_inc=False) == ["mykeywordanotherkeyword"]
    assert concatenate_graph_filter(["mykeyword", "another", "keyword"]) \
        == ["mykeyword" + S + "another" + S + "keyword"]
    assert concatenate_graph_filter([]) == []


def test_concatenate_graph_stopword_holes():
    # "a mykeyword a keyword" minus stop "a"
    assert concatenate_graph_filter(
        [("mykeyword", 2), ("keyword", 2)], sep=S,
        preserve_pos_inc=True) == [S + "mykeyword" + S + S + "keyword"]
    assert concatenate_graph_filter(
        [("mykeyword", 2), ("keyword", 2)], sep=S,
        preserve_pos_inc=False) == ["mykeyword" + S + "keyword"]
    # "A B C D E F J H" minus stops {A, D, E, J}
    assert concatenate_graph_filter(
        [("B", 2), ("C", 1), ("F", 3), ("H", 2)], sep="-",
        preserve_pos_inc=True) == ["-B-C---F--H"]
    assert concatenate_graph_filter(
        [("B", 2), ("C", 1), ("F", 3), ("H", 2)], sep="-",
        preserve_pos_inc=False) == ["B-C-F-H"]


def test_concatenate_graph_synonym_paths():
    r = concatenate_graph_filter(
        [("mykeyword", 1), ("mysynonym", 0), ("three words synonym", 0),
         ("another", 1), ("keyword", 1)], sep="-", preserve_pos_inc=False)
    assert r == ["mykeyword-another-keyword", "mysynonym-another-keyword",
                 "three words synonym-another-keyword"]
    with pytest.raises(ValueError):
        concatenate_graph_filter(
            [("a", 1)] + [(str(i), 0) for i in range(200)],
            max_graph_expansions=100)


def test_date_recognizer():
    rec = pattern_date_recognizer("MM/dd/yyyy")
    toks = ("The red fox jumped over the lazy dogs on 7/11/2006 "
            "The dogs finally reacted on 7/12/2006").split()
    assert len(date_recognizer_filter(toks, rec)) == 2
    assert english_default_date_recognizer("2006-07-11")
    assert english_default_date_recognizer("July 11, 2006")
    assert not english_default_date_recognizer("foo")
    assert not english_default_date_recognizer("2006-02-30")
    assert not pattern_date_recognizer("MM/dd/yyyy")("13/40/2006")
    assert not pattern_date_recognizer("MM/dd/yyyy")("2/30/2006")
    assert pattern_date_recognizer("yyyy-MM-dd")("2006-7-1")
    with pytest.raises(ValueError):
        pattern_date_recognizer("dd.MM.yyyy")


def test_delimited_term_frequency():
    t = delimited_term_frequency(
        "The quick|40 red|4 fox|06 jumped|1 over the lazy|2 "
        "brown|123 dogs|1024".split())
    assert t == [("The", 1), ("quick", 40), ("red", 4), ("fox", 6),
                 ("jumped", 1), ("over", 1), ("the", 1), ("lazy", 2),
                 ("brown", 123), ("dogs", 1024)]
    with pytest.raises(ValueError,
                       match="Term frequency must be 1 or greater"):
        delimited_term_frequency(["foo", "bar|-20"])
    with pytest.raises(ValueError):
        delimited_term_frequency(["bar|1.2"])


def test_drop_if_flagged():
    assert drop_if_flagged(
        [("foo", 0), ("bar", 1), ("baz", 2), ("bam", 7)], 5) == \
        [("foo", 0), ("bar", 1), ("baz", 2)]
    assert drop_if_flagged(
        [("foo", 4), ("bar", 1), ("baz", 2), ("bam", 7)], 4) == \
        [("bar", 1), ("baz", 2)]


def test_keyword_marker():
    tk = "The quIck browN LuceneFox Jumps".split()
    m = set_keyword_marks(tk, {"lucenefox"}, ignore_case=True)
    assert apply_unless_keyword(tk, m, str.lower) == \
        ["the", "quick", "brown", "LuceneFox", "jumps"]
    m2 = pattern_keyword_marks(tk, "[a-zA-Z]+[fF]ox")
    assert apply_unless_keyword(tk, m2, str.lower) == \
        ["the", "quick", "brown", "LuceneFox", "jumps"]
    m3 = pattern_keyword_marks(tk, "[a-zA-Z]+[f]ox")
    assert apply_unless_keyword(tk, m3, str.lower) == \
        ["the", "quick", "brown", "lucenefox", "jumps"]


def test_keyword_marker_composition():
    # LUCENE-2901: stacked markers OR together
    tk = "Dogs Trees Birds Houses".split()
    mm = set_keyword_marks(
        tk, {"Dogs", "Trees"},
        prior=set_keyword_marks(tk, {"Birds", "Houses"}))
    assert apply_unless_keyword(tk, mm, str.lower) == tk
    mp = pattern_keyword_marks(
        tk, "Dogs|Trees", prior=pattern_keyword_marks(tk, "Birds|Houses"))
    assert apply_unless_keyword(tk, mp, str.lower) == tk


def test_limit_token_offset():
    off = [("A1", 0), ("B2", 3), ("C3", 6), ("D4", 9), ("E5", 12),
           ("F6", 15)]
    assert [t for t, _ in limit_token_offset_filter(off, 3)] == \
        ["A1", "B2"]
    with pytest.raises(ValueError):
        limit_token_offset_filter(off, -1)


def test_limit_token_position():
    assert limit_token_position_filter(["1", "2", "3", "4", "5"], 2) == \
        ["1", "2"]
    assert limit_token_position_filter(["1"], 2) == ["1"]
    assert limit_token_position_filter(["1", "2"], 2) == ["1", "2"]
    # posinc-aware: a hole advances the position past the limit
    assert limit_token_position_filter([("a", 1), ("b", 2)], 2) == \
        [("a", 1)]
    with pytest.raises(ValueError):
        limit_token_position_filter(["1"], 0)


def test_conditional_filter():
    assert conditional_filter(
        "Alice Bob Clara David".split(),
        lambda t: not re.fullmatch(".*o.*", t),
        lambda ts: [x.lower() for x in ts]) == \
        ["alice", "Bob", "clara", "david"]
    with pytest.raises(ValueError):
        conditional_filter(["a", "b"], lambda t: True, lambda ts: ts[:1])


def test_concatenating_token_stream():
    assert concatenating_token_stream(["a", "b"], ["c"]) == \
        ["a", "b", "c"]
