"""ASCIIFolding / Shingle / Synonym filter analyzers (SURVEY §2.2 misc
filters; shingle vectors from TestShingleAnalyzerWrapper.kt:144)."""
import numpy as np
import pyarrow as pa

from lucene_kmp_ray.analysis.filters import (ASCIIFoldingAnalyzer,
                                             ShingleAnalyzer,
                                             SynonymAnalyzer, fold_to_ascii)


def test_fold_to_ascii():
    assert fold_to_ascii("café") == "cafe"
    assert fold_to_ascii("naïve") == "naive"
    assert fold_to_ascii("über") == "uber"
    assert fold_to_ascii("œß") == "oess"
    assert fold_to_ascii("høj") == "hoj"
    assert fold_to_ascii("ascii") == "ascii"
    assert fold_to_ascii("中") == "中"  # no ASCII mapping → unchanged


def test_ascii_folding_analyzer_paths_agree():
    a = ASCIIFoldingAnalyzer()
    texts = ["Café crème naïve", "plain words", ""]
    assert a(texts[0]) == ["cafe", "creme", "naive"]
    dl, flat, doc_of, pos = a.analyze_flat(texts)
    assert flat.to_pylist() == [t for txt in texts for t in a(txt)]
    assert dl.tolist() == [3, 2, 0]


def test_shingle_reference_vectors():
    # TestShingleAnalyzerWrapper testReusableTokenStream (size 2)
    a = ShingleAnalyzer()
    assert a("please divide into shingles") == \
        ["please", "please divide", "divide", "divide into", "into",
         "into shingles", "shingles"]
    # min=3 max=4 vectors (subset)
    a34 = ShingleAnalyzer(min_n=3, max_n=4)
    got = a34("please divide this sentence into shingles")
    assert got[:3] == ["please", "please divide this",
                       "please divide this sentence"]
    assert "divide this sentence into" in got
    assert got[-1] == "shingles"
    # no unigrams
    a2 = ShingleAnalyzer(output_unigrams=False)
    assert a2("a b c") == ["a b", "b c"]


def test_shingle_analyze_flat_positions():
    a = ShingleAnalyzer()
    texts = ["please divide into shingles", "one", ""]
    dl, flat, doc_of, pos = a.analyze_flat(texts)
    # same multiset per (doc, pos) as the scalar path; shingle shares the
    # position of its first token (posIncr 0)
    per_doc = {}
    for t, d, p in zip(flat.to_pylist(), doc_of.tolist(), pos.tolist()):
        per_doc.setdefault(d, []).append((p, t))
    assert sorted(per_doc[0]) == sorted([
        (0, "please"), (0, "please divide"), (1, "divide"),
        (1, "divide into"), (2, "into"), (2, "into shingles"),
        (3, "shingles")])
    assert per_doc[1] == [(0, "one")]
    assert dl.tolist() == [7, 1, 0]  # shingles count toward norm length


def test_synonym_analyzer_injection():
    a = SynonymAnalyzer({"fast": ("quick", "rapid")})
    assert a("fast scan") == ["fast", "quick", "rapid", "scan"]
    dl, flat, doc_of, pos = a.analyze_flat(["fast scan", "no match"])
    per = sorted(zip(doc_of.tolist(), pos.tolist(), flat.to_pylist()))
    # synonyms share position 0 with the original (posIncr 0)
    assert per[:3] == [(0, 0, "fast"), (0, 0, "quick"), (0, 0, "rapid")]
    assert (0, 1, "scan") in per
    assert dl.tolist() == [4, 2]  # injected tokens count toward length
    # keep_orig=False replaces
    b = SynonymAnalyzer({"fast": ("quick",)}, keep_orig=False)
    assert b("fast scan") == ["quick", "scan"]


def test_synonym_end_to_end_phrase(ray_session, tmp_path):
    """Same-position injection: a phrase query crossing the synonym
    position matches both surface forms (the posIncr=0 graph property)."""
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import PhraseQuery, Searcher, TermQuery

    texts = ["the fast scan works", "the quick scan works", "no match"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(3)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "syn")
    build_index(ds, idx, segment_size=2,
                analyzer=SynonymAnalyzer({"fast": ("quick",)}))
    s = Searcher(IndexReader(idx))
    # quick matches doc 0 (via injection) AND doc 1 (surface)
    assert sorted(h.doc_id for h in
                  s.search(TermQuery("quick"), k=10).score_docs) == [0, 1]
    # phrase "quick scan" matches both docs: injected quick sits at the
    # same position as fast
    td = s.search(PhraseQuery(("quick", "scan")), k=10)
    assert sorted(h.doc_id for h in td.score_docs) == [0, 1]


def test_common_grams_analyzer():
    from lucene_kmp_ray.analysis.filters import CommonGramsAnalyzer
    a = CommonGramsAnalyzer()
    # gram emitted (at the left token's position) whenever either
    # neighbor is a common word; common words stay in the stream
    assert a("the quick fox is fast") == [
        "the", "the_quick", "quick", "fox", "fox_is", "is",
        "is_fast", "fast"]
    assert a("quick brown fox") == ["quick", "brown", "fox"]
    # batch path agrees with the per-token path, grams at left position
    nl, flat, doc_of, pos = a.analyze_flat(
        ["the quick fox is fast", "quick brown fox"])
    per_doc = [[] for _ in range(2)]
    for t, d in zip(flat.to_pylist(), doc_of.tolist()):
        per_doc[d].append(t)
    assert per_doc == [a("the quick fox is fast"),
                       a("quick brown fox")]
    assert nl.tolist() == [8, 3]


def test_pattern_tokenizer_analyzer():
    from lucene_kmp_ray.analysis.filters import PatternTokenizerAnalyzer
    # split mode (group -1): empties dropped
    split = PatternTokenizerAnalyzer(r"[^0-9A-Za-z]+", group=-1)
    assert split("Hello, World! 42") == ["hello", "world", "42"]
    assert split("--a--b--") == ["a", "b"]
    # match mode (group 0): tokens are the matches
    match = PatternTokenizerAnalyzer(r"[A-Za-z]+", group=0)
    assert match("Hello, World! 42") == ["hello", "world"]
    # batch path agrees with per-token path
    nl, flat, doc_of, pos = split.analyze_flat(["a,b", "", "x  y"])
    assert nl.tolist() == [2, 0, 2]
    assert flat.to_pylist() == ["a", "b", "x", "y"]


def test_reverse_string_analyzer():
    from lucene_kmp_ray.analysis.filters import ReverseStringAnalyzer
    a = ReverseStringAnalyzer()
    assert a("Hello world") == ["olleh", "dlrow"]
    m = ReverseStringAnalyzer(marker="\u0001")
    # marker appended BEFORE reversal leads the emitted term
    assert m("ab") == ["\u0001ba"]
    nl, flat, doc_of, pos = m.analyze_flat(["ab cd", ""])
    assert flat.to_pylist() == ["\u0001ba", "\u0001dc"]
    assert nl.tolist() == [2, 0]
