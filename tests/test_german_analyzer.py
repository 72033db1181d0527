"""German + CJK analyzer families through the pluggable analyzer slot.

German vectors follow the reference chain (GermanAnalyzer.kt: LowerCase →
Stop → GermanNormalizationFilter → GermanLightStemFilter) with the
normalization cases of TestGermanNormalizationFilter.kt and UniNE-paper
stemming examples; CJK vectors come from TestCJKAnalyzer.kt (adopted from
TestCJKTokenizer).
"""
import numpy as np
import pyarrow as pa

from lucene_kmp_ray.analysis.cjk import CJKAnalyzer, cjk_width_fold
from lucene_kmp_ray.analysis.german import (GermanAnalyzer,
                                            german_light_stem,
                                            german_normalize)


def test_german_normalization_reference_vectors():
    # TestGermanNormalizationFilter.kt (on lowercased input)
    assert german_normalize("schaltflächen") == "schaltflachen"
    assert german_normalize("schaltflaechen") == "schaltflachen"
    assert german_normalize("dauer") == "dauer"  # ue after vowel keeps e
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("") == ""
    assert german_normalize("quelle") == "quelle"  # ue after q keeps e


def test_german_light_stem_vectors():
    # UniNE algorithm behavior (GermanLightStemmer.kt semantics)
    assert german_light_stem("hauser") == "haus"       # -er
    assert german_light_stem("grenzen") == "grenz"     # -en
    assert german_light_stem("hauses") == "haus"       # -es
    assert german_light_stem("hunds") == "hund"        # -s after valid end
    assert german_light_stem("derbst") == "derb"       # step2 -st
    assert german_light_stem("derbsten") == "derb"     # step1 then step2
    assert german_light_stem("bücher") == "buch"       # accent fold + -er
    assert german_light_stem("tage") == "tag"          # -e
    assert german_light_stem("apfel") == "apfel"       # no matching suffix
    assert german_light_stem("rot") == "rot"           # min lengths guard


def test_german_analyzer_chain():
    a = GermanAnalyzer()
    # stop words drop BEFORE normalization (daß/für match raw lowercase)
    assert a("die Häuser und der Garten") == ["haus", "gart"]
    assert a("daß für") == []
    # batch path agrees with the scalar path
    texts = ["die Häuser und der Garten", "Bücher lesen", "", "daß"]
    dl, flat, doc_of, pos = a.analyze_flat(texts)
    got = flat.to_pylist()
    exp = [t for txt in texts for t in a(txt)]
    assert got == exp
    assert dl.tolist() == [len(a(t)) for t in texts]
    # stop-filter position gaps preserved (StopFilter posInc semantics)
    assert pos.tolist()[:2] == [1, 4]  # häuser at 1, garten at 4


def test_german_analyzer_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery

    texts = ["die Häuser sind groß", "ein Haus im Garten",
             "Bücher über Gärten", "nichts relevantes hier"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(4)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "de")
    a = GermanAnalyzer()
    build_index(ds, idx, segment_size=2, analyzer=a)
    s = Searcher(IndexReader(idx))
    (term,) = a("Häuser")  # query analyzed the same way → 'haus'
    assert term == "haus"
    hits = sorted(h.doc_id for h in s.search(TermQuery(term), k=10).score_docs)
    assert hits == [0, 1]  # Häuser and Haus both stem to haus


def test_cjk_bigram_reference_vectors():
    a = CJKAnalyzer()
    # TestCJKAnalyzer.kt testJa1 / testJa2
    assert a("一二三四五六七八九十") == \
        ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九",
         "九十"]
    assert a("一 二三四 五六七八九 十") == \
        ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]
    # testC
    assert a("abc defgh ijklmn opqrstu vwxy z") == \
        ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]
    # testFinalOffset / testMix
    assert a("あい") == ["あい"]
    assert a("あいtest") == ["あい", "test"]
    assert a("testあい    ") == ["test", "あい"]
    assert a("あいうえおabcかきくけこ") == \
        ["あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ",
         "けこ"]
    assert a("あいうえおabんcかきくけ こ") == \
        ["あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく",
         "くけ", "こ"]
    # testSurrogates (astral Han bigrams per codepoint)
    assert a("𩬅艱鍟䇹愯瀛") == ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]
    # stop filter drops classic English stops AFTER bigramming
    assert a("the 中国") == ["中国"]


def test_cjk_width_fold():
    assert cjk_width_fold("Ｔｅｓｔｓ") == "Tests"
    a = CJKAnalyzer()
    assert a("Ｔｅｓｔｓ 中国") == ["tests", "中国"]


def test_cjk_analyze_flat_matches_scalar():
    a = CJKAnalyzer()
    texts = ["一 二三四 五六七八九 十", "あいtest", "", "the 中国"]
    dl, flat, doc_of, pos = a.analyze_flat(texts)
    exp = [t for txt in texts for t in a(txt)]
    assert flat.to_pylist() == exp
    assert dl.tolist() == [len(a(t)) for t in texts]
    assert (np.diff(pos[doc_of == 0]) == 1).all()  # sequential positions


def test_cjk_phrase_end_to_end(ray_session, tmp_path):
    """Bigram positions are consecutive, so a CJK 'phrase' (adjacent
    bigrams) matches — the NGramPhraseQuery-style property."""
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import PhraseQuery, Searcher, TermQuery

    texts = ["我是中国人", "中国 我是", "人中国是我"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(3)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "cjk")
    build_index(ds, idx, segment_size=2, analyzer=CJKAnalyzer())
    s = Searcher(IndexReader(idx))
    # "中国" bigram present in docs 0,1,2 (doc2 has 中国 inside the run)
    assert sorted(h.doc_id for h in
                  s.search(TermQuery("中国"), k=10).score_docs) == [0, 1, 2]
    # phrase 我是,是中,中国 = the contiguous substring 我是中国 → doc 0 only
    td = s.search(PhraseQuery(("我是", "是中", "中国")), k=10)
    assert [h.doc_id for h in td.score_docs] == [0]
