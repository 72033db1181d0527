"""Miscellaneous filter conformance (LengthFilter, Truncate, Trim,
KeepWord, Capitalization, Scandinavian normalize/fold, Fingerprint,
KeywordRepeat+RemoveDuplicates, StemmerOverride)."""

from lucene_kmp_ray.analysis.filters_misc import (
    capitalization_filter,
    codepoint_count_filter,
    fingerprint_filter,
    keep_word_filter,
    keyword_repeat_stems,
    length_filter,
    scandinavian_fold,
    scandinavian_normalize,
    stemmer_override,
    trim_filter,
    truncate_filter,
)


def test_length_and_codepoint():
    toks = ["a", "abc", "abcdef", "abcdefgh"]
    assert length_filter(toks, 2, 6) == ["abc", "abcdef"]
    assert codepoint_count_filter(toks, 2, 6) == ["abc", "abcdef"]


def test_truncate_and_trim():
    assert truncate_filter(["abcdefgh", "ab"], 4) == ["abcd", "ab"]
    assert trim_filter(["  x ", "y"]) == ["x", "y"]


def test_keep_word():
    assert keep_word_filter(["a", "b", "c"], {"b"}) == ["b"]


def test_capitalization():
    assert capitalization_filter(["kiTTEN", "x"]) == ["Kitten", "X"]


def test_scandinavian_fold_published_classes():
    # ScandinavianFoldingFilter.kt doc: all these must collide
    cls1 = ["blåbærsyltetøj", "blåbärsyltetöj", "blaabaarsyltetoej",
            "blabarsyltetoj"]
    assert len({scandinavian_fold(w) for w in cls1}) == 1
    cls2 = ["räksmörgås", "ræksmørgås", "ræksmörgaos", "raeksmoergaas",
            "raksmorgas"]
    assert len({scandinavian_fold(w) for w in cls2}) == 1
    assert scandinavian_fold("räksmörgås") == "raksmorgas"


def test_scandinavian_normalize_published_classes():
    cls = ["blåbærsyltetøj", "blåbärsyltetöj", "blaabaersyltetoej"]
    assert {scandinavian_normalize(w) for w in cls} == {"blåbærsyltetøj"}
    # fold-only collisions must NOT collide under normalization
    assert scandinavian_normalize("blabarsyltetoj") != "blåbærsyltetøj"


def test_fingerprint():
    assert fingerprint_filter(["b", "a", "b"]) == ["a b"]
    assert fingerprint_filter([]) == []


def test_keyword_repeat_stems():
    from lucene_kmp_ray.analysis.porter import porter_stem
    assert keyword_repeat_stems(["running", "run"], porter_stem) == \
        ["running", "run", "run"]


def test_stemmer_override():
    from lucene_kmp_ray.analysis.porter import porter_stem
    out = stemmer_override(["running", "happened"],
                           {"happened": "happen!"}, porter_stem)
    assert out == ["run", "happen!"]


def test_mapping_char_filter():
    from lucene_kmp_ray.analysis.filters_misc import mapping_char_filter
    m = {"ph": "f", "qu": "kw", "x": "ks"}
    assert mapping_char_filter("phonequix", m) == "fonekwiks"
    # longest match wins
    m2 = {"a": "1", "ab": "2"}
    assert mapping_char_filter("abab", m2) == "22"


def test_hyphenated_words():
    from lucene_kmp_ray.analysis.filters_misc import (
        hyphenated_words_filter)
    assert hyphenated_words_filter(["hyphen-", "ated", "word"]) == \
        ["hyphenated", "word"]
    assert hyphenated_words_filter(["trailing-"]) == ["trailing"]


def test_protected_term():
    from lucene_kmp_ray.analysis.filters_misc import protected_term_filter
    from lucene_kmp_ray.analysis.porter import porter_stem
    out = protected_term_filter(["running", "jumping"], {"running"},
                                porter_stem)
    assert out == ["running", "jump"]


def test_dictionary_compound():
    from lucene_kmp_ray.analysis.filters_misc import (
        dictionary_compound_filter)
    d = {"donau", "dampf", "schiff", "wein", "schwein"}
    out = dictionary_compound_filter(["donaudampfschiff"], d)
    assert out == ["donaudampfschiff", "donau", "dampf", "schiff"]
    # reuseChars default: schwein also yields wein
    out2 = dictionary_compound_filter(["hausschwein"], d | {"haus"})
    assert out2 == ["hausschwein", "haus", "schwein", "wein"]
    # onlyLongestMatch keeps one match per start
    out3 = dictionary_compound_filter(["hausschwein"], d | {"haus"},
                                      only_longest_match=True)
    assert out3 == ["hausschwein", "haus", "schwein", "wein"]
    # short tokens pass through untouched
    assert dictionary_compound_filter(["haus"], d) == ["haus"]


def test_english_minimal_stem():
    from lucene_kmp_ray.analysis.filters_misc import english_minimal_stem
    vecs = {"queries": "query", "phrases": "phrase", "corpus": "corpus",
            "stress": "stress", "kittens": "kitten", "foxes": "foxe",
            "dies": "dy", "aies": "aies", "is": "is", "ties": "ty",
            "gas": "ga"}
    for w, e in vecs.items():
        assert english_minimal_stem(w) == e, w


def test_type_token_filter():
    from lucene_kmp_ray.analysis.classic import classic_tokenize
    from lucene_kmp_ray.analysis.filters_misc import type_token_filter
    tt = classic_tokenize("AT&T sells 1-2-3 shares")
    assert type_token_filter(tt, {"<NUM>"}) == ["AT&T", "sells", "shares"]
    assert type_token_filter(tt, {"<COMPANY>"}, use_whitelist=True) == \
        ["AT&T"]


def test_type_as_synonym():
    from lucene_kmp_ray.analysis.filters_misc import type_as_synonym_filter
    out = type_as_synonym_filter([("at&t", "<COMPANY>")], prefix="_type_")
    assert out == ["at&t", "_type_<COMPANY>"]
