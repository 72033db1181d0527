"""Tokenizer + HTML extraction: reference StandardAnalyzer semantics and
Python↔DuckDB (oracle) parity."""
import duckdb
import pyarrow.parquet as pq
import pytest

from lucene_kmp_ray.analysis import (MAX_TOKEN_LENGTH, sql_tokens_expr,
                                     tokenize)
from lucene_kmp_ray.analysis.htmlstrip import html_to_text
from lucene_kmp_ray.sources.corpus import CORPUS_SQL, corpus_table

SF = "/root/testdata/sf0.001"


def test_standard_cases():
    # StandardAnalyzer classics: lowercase, symbol split, MidNumLet joins
    assert tokenize("XY&Z Corporation - xyz@example.com") == \
        ["xy", "z", "corporation", "xyz", "example.com"]
    assert tokenize("can't 3.14 foo_bar The THE the") == \
        ["can't", "3.14", "foo_bar", "the", "the", "the"]
    assert tokenize("") == []
    assert tokenize("   \n\t ") == []


def test_max_token_length_split():
    # StandardTokenizer.kt:105: over-long tokens are split, not dropped
    long = "a" * (MAX_TOKEN_LENGTH + 10)
    assert tokenize(long) == ["a" * MAX_TOKEN_LENGTH, "a" * 10]


def test_sql_parity_sf0001():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    rows = con.sql(
        f"SELECT doc_id, {sql_tokens_expr('text')} toks FROM documents "
        "ORDER BY doc_id").fetchall()
    docs = pq.read_table(f"{SF}/documents.parquet").sort_by("doc_id")
    for (_, toks), txt in zip(rows, docs["text"].to_pylist()):
        assert toks == tokenize(txt)


def test_corpus_derivation_matches_sql():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql_t = con.sql(CORPUS_SQL + " ORDER BY doc_id").arrow()
    py_t = corpus_table(SF).sort_by("doc_id")
    for col in ["doc_id", "url", "text", "lang", "warc_ts"]:
        assert sql_t[col].to_pylist() == py_t[col].to_pylist(), col
    assert [bytes(x) for x in sql_t["html"].to_pylist()] == \
        py_t["html"].to_pylist()


def test_html_extraction_invariant():
    """Per-row invariant (BASELINE.json): extracted text == text per url."""
    t = corpus_table(SF)
    for h, txt in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert html_to_text(h) == txt


def test_html_strip_features():
    assert html_to_text(b"<p>a <b>b</b></p><script>x=1;</script>c") == "a bc"
    assert html_to_text("<!-- hi --><div>x &amp; y</div>") == "x & y"


def test_tokenize_flat_fast_equals_slow_paths():
    """The vectorized batch tokenizer must agree with the per-doc regex on
    every edge case (the class table is generated from the regex, but run
    semantics — joiners, boundaries, doc attribution — are asserted here)."""
    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  tokenize_flat)
    texts = [
        "Hello, World! it's example.com v2.0",
        "",
        "..leading 'quoted' trailing. dots.. a..b",
        "under_score 3.14 can't won’t a'b'c x",
        "ünïcödé Ωmega ΔΔ mixed123abc",
        "a" * 600 + " tail",          # over-long token → slow path
        "tab\tsep\nnewline  spaces",
        "'", ".", "’", "a", "1",
    ]
    dl_f, toks_f = tokenize_flat(texts)
    dl_s, toks_s = _tokenize_flat_slow(texts)
    assert dl_f.tolist() == dl_s.tolist()
    assert toks_f.to_pylist() == toks_s.to_pylist()
    # each subset without the long token exercises the FAST path
    sub = texts[:5] + texts[6:]
    dl_f2, toks_f2 = tokenize_flat(sub)
    dl_s2, toks_s2 = _tokenize_flat_slow(sub)
    assert dl_f2.tolist() == dl_s2.tolist()
    assert toks_f2.to_pylist() == toks_s2.to_pylist()


def test_tokenize_flat_nul_and_astral_fallback():
    from lucene_kmp_ray.analysis.standard import tokenize, tokenize_flat
    dl, toks = tokenize_flat(["has\x00nul token", "plain text"])
    assert dl.tolist() == [3, 2]
    assert toks.to_pylist() == tokenize("has\x00nul token") + \
        tokenize("plain text")
    dl2, toks2 = tokenize_flat(["emoji 🎉 and 𝒜stral", "ok"])
    assert dl2.tolist() == [len(tokenize("emoji 🎉 and 𝒜stral")), 1]
    assert toks2.to_pylist() == tokenize("emoji 🎉 and 𝒜stral") + \
        tokenize("ok")


def test_cjk_segmentation_reference_vectors():
    """Conformance vectors from the reference's TestStandardAnalyzer.kt
    (testChinese:240, testKoreanSA:341, testKorean:372, testJapanese:378,
    testSupplementary:366): Han/Hiragana one token per char, Katakana and
    Hangul runs."""
    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  tokenize, tokenize_flat)
    cases = [
        ("我是中国人。 １２３４ Ｔｅｓｔｓ ",
         ["我", "是", "中", "国", "人", "１２３４", "ｔｅｓｔｓ"]),
        ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
        ("훈민정음", ["훈민정음"]),
        ("仮名遣い カタカナ",
         ["仮", "名", "遣", "い", "カタカナ"]),
        ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
        ("abc漢def", ["abc", "漢", "def"]),
        ("アアaア", ["アア", "a", "ア"]),
    ]
    for text, exp in cases:
        assert tokenize(text) == exp, text
        _, fast = tokenize_flat([text])
        assert fast.to_pylist() == exp, ("fast", text)
        _, slow = _tokenize_flat_slow([text])
        assert slow.to_pylist() == exp, ("slow", text)


def test_cjk_sql_mirror_agrees():
    import duckdb

    from lucene_kmp_ray.analysis.standard import sql_tokens_expr, tokenize
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    for c in ["我是中国人。 Ｔｅｓｔｓ", "仮名遣い カタカナ", "안녕 한글",
              "abc漢def", "the fast key"]:
        got = con.sql(f"SELECT {expr} AS toks FROM (SELECT ? AS t)",
                      params=[c]).fetchone()[0]
        assert got == tokenize(c), c


def test_combining_marks_and_more_languages():
    """UAX#29 Extend support (reference vectors: testCombiningMarks,
    testThai, testLao, testRussian idea, LUCENE-1545 'moͤchte'): combining
    marks continue word runs, Katakana/Hangul runs and CJK singles; all
    four tokenizer paths (scalar, scanner, regex fallback, SQL) agree."""
    import duckdb

    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  sql_tokens_expr, tokenize,
                                                  tokenize_flat)
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    cases = [
        ("壹゙ ざ ザ 아゙", ["壹゙", "ざ", "ザ", "아゙"]),  # testCombiningMarks
        ("moͤchte", ["moͤchte"]),                        # LUCENE-1545
        ("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔",
         ["การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"]),  # testThai
        ("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ",
         ["ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"]),            # testLao
        ("Вики́педия", ["вики́педия"]),
        ("ዊኪፔድያ የባለ ብዙ ቋንቋ", ["ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ"]),  # testAmharic
        ("Γράφεται σε συνεργασία", ["γράφεται", "σε", "συνεργασία"]),
        ("ویکی پدیای دانشنامهٔ", ["ویکی", "پدیای", "دانشنامهٔ"]),  # testFarsi
        ("এই বিশ্বকোষ পরিচালনা", ["এই", "বিশ্বকোষ", "পরিচালনা"]),  # testBengali
    ]
    import pyarrow as pa
    import pyarrow.compute as pc
    for text, exp_raw in cases:
        exp = pc.utf8_lower(pa.array(exp_raw, pa.string())).to_pylist()
        assert tokenize(text) == exp, text
        assert tokenize_flat([text])[1].to_pylist() == exp, ("fast", text)
        assert _tokenize_flat_slow([text])[1].to_pylist() == exp, \
            ("slow", text)
        got_sql = con.sql(f"SELECT {expr} AS t FROM (SELECT ? AS t)",
                          params=[text]).fetchone()[0]
        assert got_sql == exp, ("sql", text)


def test_emoji_segmentation_reference_vectors():
    """<EMOJI> token type (TestStandardAnalyzer.kt:444-505): bare emoji
    split per pictograph, ZWJ sequences and modifier/VS16 chains stay one
    token, regional indicators pair, keycaps combine; text-presentation
    VS15 behaves per the reference. All four paths agree."""
    import duckdb

    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  sql_tokens_expr, tokenize,
                                                  tokenize_flat)
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    cases = [
        ("💩 💩💩", ["💩", "💩", "💩"]),          # testEmoji
        ("👩‍❤️‍👩", ["👩‍❤️‍👩"]),  # ZWJ sequence
        ("👨🏼‍⚕️", ["👨🏼‍⚕️"]),        # modifier + ZWJ
        ("🇺🇸🇺🇸", ["🇺🇸", "🇺🇸"]),               # regional indicators
        ("#️⃣", ["#️⃣"]),                          # keycap
        ("3️⃣", ["3️⃣"]),
        ("#︎", []),                          # text presentation
        ("3︎", ["3︎"]),
        ("⭕︎", ["⭕"]),
        ("poo💩poo", ["poo", "💩", "poo"]),       # testEmojiTokenization
        ("💩中國💩", ["💩", "中", "國", "💩"]),
    ]
    for text, exp in cases:
        assert tokenize(text) == exp, repr(text)
        assert tokenize_flat([text])[1].to_pylist() == exp, ("fast", text)
        assert _tokenize_flat_slow([text])[1].to_pylist() == exp, \
            ("slow", text)
        got_sql = con.sql(f"SELECT {expr} AS t FROM (SELECT ? AS t)",
                          params=[text]).fetchone()[0]
        assert got_sql == exp, ("sql", repr(text))

def test_mid_letter_num_reference_vectors():
    """UAX#29 Mid* conformance (TestStandardAnalyzer.kt testMid:397-441):
    MidLetter ':' joins letters, MidNum ',' joins numerics, MidNumLet '.'
    joins either same-class pair; doubled/mixed joiners split; '_'
    (ExtendNumLet) bridges. All four paths agree."""
    import duckdb

    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  sql_tokens_expr, tokenize,
                                                  tokenize_flat)
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    cases = [
        ("A:B", ["a:b"]), ("A::B", ["a", "b"]),
        ("1.2", ["1.2"]), ("A.B", ["a.b"]),
        ("1..2", ["1", "2"]), ("A..B", ["a", "b"]),
        ("1,2", ["1,2"]), ("1,,2", ["1", "2"]),
        ("A.:B", ["a", "b"]), ("A:.B", ["a", "b"]),
        ("1,.2", ["1", "2"]), ("1.,2", ["1", "2"]),
        ("A:B_A:B", ["a:b_a:b"]), ("A:B_A::B", ["a:b_a", "b"]),
        ("1.2_1.2", ["1.2_1.2"]), ("A.B_A.B", ["a.b_a.b"]),
        ("1.2_1..2", ["1.2_1", "2"]), ("A.B_A..B", ["a.b_a", "b"]),
        ("1,2_1,2", ["1,2_1,2"]), ("1,2_1,,2", ["1,2_1", "2"]),
        ("C_A.:B", ["c_a", "b"]), ("C_A:.B", ["c_a", "b"]),
        ("3_1,.2", ["3_1", "2"]), ("3_1.,2", ["3_1", "2"]),
        # flank classes must match: letter.digit splits (WB6/WB11)
        ("R2.D2", ["r2", "d2"]), ("216.239.63.104", ["216.239.63.104"]),
        ("1,000 items", ["1,000", "items"]),
        # testApostrophesSA / testNumericSA classics still hold
        ("O'Reilly's", ["o'reilly's"]), ("21.35", ["21.35"]),
        ("B2B 2B", ["b2b", "2b"]),
    ]
    for text, exp in cases:
        assert tokenize(text) == exp, text
        assert tokenize_flat([text])[1].to_pylist() == exp, ("fast", text)
        assert _tokenize_flat_slow([text])[1].to_pylist() == exp, \
            ("slow", text)
        got_sql = con.sql(f"SELECT {expr} AS t FROM (SELECT ? AS t)",
                          params=[text]).fetchone()[0]
        assert got_sql == exp, ("sql", text)


def test_nfd_mark_before_joiner_parity():
    """A combining mark between a word char and a joiner (NFD text like
    "Jose<U+0301>'s") must not break fast/slow/SQL agreement: marks are
    WB4-transparent around Mid* joiners on every path."""
    import unicodedata

    import duckdb

    from lucene_kmp_ray.analysis.standard import (_tokenize_flat_slow,
                                                  sql_tokens_expr, tokenize,
                                                  tokenize_flat)
    con = duckdb.connect()
    expr = sql_tokens_expr("t")
    nfd = unicodedata.normalize("NFD", "José's and José’s A:É B,1́")
    py = tokenize(nfd)
    assert py[0].endswith("'s") and len(py[0]) > 3  # joined through mark
    assert tokenize_flat([nfd])[1].to_pylist() == py
    assert _tokenize_flat_slow([nfd])[1].to_pylist() == py
    got = con.sql(f"SELECT {expr} AS t FROM (SELECT ? AS t)",
                  params=[nfd]).fetchone()[0]
    assert got == py
