"""Kuromoji-semantics Japanese analyzer conformance.

Vectors from the reference's own test suite:
- TestJapaneseAnalyzer.kt testBasics / testDecomposition
- TestSearchMode.kt SEGMENTATION_TESTS (the subset whose vocabulary is in
  the compact curated lexicon; lines relying on IPADIC entries outside it
  are not asserted)
No Ray needed — pure analysis chain.
"""

import pytest

from lucene_kmp_ray.analysis.japanese import (
    JapaneseAnalyzer,
    JapaneseTokenizer,
    cjk_width_fold_offsets,
)


@pytest.fixture(scope="module")
def analyzer():
    return JapaneseAnalyzer()


@pytest.fixture(scope="module")
def search_tok():
    return JapaneseTokenizer(mode="search")


# --- TestJapaneseAnalyzer.kt testBasics -------------------------------


def test_basics_terms_offsets_posinc(analyzer):
    toks = analyzer.analyze_tokens("多くの学生が試験に落ちた。")
    assert [t[0] for t in toks] == ["多く", "学生", "試験", "落ちる"]
    assert [t[1] for t in toks] == [0, 3, 6, 9]
    assert [t[2] for t in toks] == [2, 5, 8, 11]
    assert [t[3] for t in toks] == [1, 2, 2, 2]


# --- TestJapaneseAnalyzer.kt testDecomposition ------------------------

DECOMPOSITION = [
    ("シニアソフトウェアエンジニア", ["シニア", "ソフトウェア", "エンジニア"]),
    # katakana stem: マネージャー -> マネージャ
    ("シニアプロジェクトマネージャー", ["シニア", "プロジェクト", "マネージャ"]),
    ("関西国際空港", ["関西", "国際", "空港"]),
    ("コニカミノルタホールディングス", ["コニカ", "ミノルタ", "ホールディングス"]),
    ("成田空港", ["成田", "空港"]),
    ("京都大学硬式野球部", ["京都大", "学", "硬式", "野球", "部"]),
]


@pytest.mark.parametrize("text,expected", DECOMPOSITION)
def test_decomposition(analyzer, text, expected):
    assert analyzer(text) == expected


# --- TestSearchMode.kt SEGMENTATION_TESTS (lexicon-covered subset) ----

SEARCH_SEGMENTATION = [
    ("関西国際空港", ["関西", "国際", "空港"]),
    ("成田空港", ["成田", "空港"]),
    ("羽田空港", ["羽田", "空港"]),
    ("東京大学", ["東京", "大学"]),
    ("京都大学", ["京都", "大学"]),
    ("京都大学硬式野球部", ["京都大", "学", "硬式", "野球", "部"]),
    ("ソフトウェアエンジニア", ["ソフトウェア", "エンジニア"]),
    ("シニアソフトウェアエンジニア", ["シニア", "ソフトウェア", "エンジニア"]),
    ("システムアーキテクト", ["システム", "アーキテクト"]),
    ("シニアシステムアーキテクト", ["シニア", "システム", "アーキテクト"]),
    ("ソフトバンクモバイル", ["ソフトバンク", "モバイル"]),
    ("マイケルジャクソン", ["マイケル", "ジャクソン"]),
    ("ホールディングス", ["ホールディングス"]),
    ("ソフトウェアエンジニアリング", ["ソフトウェア", "エンジニアリング"]),
    ("クリスマスショッピング", ["クリスマス", "ショッピング"]),
    ("ダウンロードファイル", ["ダウンロード", "ファイル"]),
    ("リレハンメルオリンピック", ["リレハンメル", "オリンピック"]),
    # the 13-char NAIST compound fully decomposes via stacked penalties
    ("奈良先端科学技術大学院大学",
     ["奈良", "先端", "科学", "技術", "大学院", "大学"]),
    ("シニアセールスエンジニア", ["シニア", "セールス", "エンジニア"]),
    ("プロジェクトマネジャー", ["プロジェクト", "マネジャー"]),
    ("シニアプロジェクトマネジャー",
     ["シニア", "プロジェクト", "マネジャー"]),
    ("サッポロホールディングス", ["サッポロ", "ホールディングス"]),
]


@pytest.mark.parametrize("text,expected", SEARCH_SEGMENTATION)
def test_search_segmentation(search_tok, text, expected):
    assert [t.surface for t in search_tok.tokenize(text)] == expected


def test_normal_mode_keeps_compounds():
    t = JapaneseTokenizer(mode="normal")
    assert [x.surface for x in t.tokenize("関西国際空港")] == ["関西国際空港"]
    assert [x.surface for x in t.tokenize("東京大学")] == ["東京大学"]


# --- chain pieces ------------------------------------------------------


def test_base_form_filter(analyzer):
    # 落ち (一段 連用形) lemmatized to 落ちる
    assert analyzer("試験に落ちた") == ["試験", "落ちる"]


def test_pos_and_stopword_removal(analyzer):
    # は (係助詞) dropped by POS; これ dropped by stopword list
    assert analyzer("これは学生です") == ["学生"]


def test_katakana_stem_min_length(analyzer):
    # マネージャー(>=4 katakana, trailing ー) stemmed; センター also
    toks = analyzer("マネージャーのセンター")
    assert toks == ["マネージャ", "センタ"]


def test_cjk_width_fold():
    folded, origin = cjk_width_fold_offsets("ＡＢＣ")
    assert folded == "ABC" and origin == [0, 1, 2]
    # halfwidth katakana with voice marks combine (shrinks)
    folded, origin = cjk_width_fold_offsets("ﾏﾈｰｼﾞｬｰ")
    assert folded == "マネージャー"
    assert origin[0] == 0 and origin[-1] == 6


def test_halfwidth_katakana_roundtrip(analyzer):
    assert analyzer("ﾏﾈｰｼﾞｬｰ") == ["マネージャ"]


def test_fullwidth_ascii_lowercased(analyzer):
    assert analyzer("ＦＵＬＬＷＩＤＴＨ　ｔｅｘｔ") == ["fullwidth", "text"]


def test_unknown_words(analyzer):
    # unknown katakana run groups into one token; latin stays whole
    out = analyzer("Lucene ライブラリ")
    assert out == ["lucene", "ライブラリ"]


def test_punctuation_discarded(analyzer):
    assert analyzer("。、！？") == []
    assert analyzer("") == []


def test_offsets_cover_original_text(analyzer):
    text = "多くの学生が試験に落ちた。"
    for term, start, end, _ in analyzer.analyze_tokens(text):
        assert 0 <= start < end <= len(text)


def test_mixed_numeric(analyzer):
    # numeric runs group per char.def (NUMERIC group=true)
    out = analyzer("2024年")
    assert "2024" in out


# --- TestJapaneseNumberFilter.kt --------------------------------------

NUMBER_VECTORS = [
    ("〇〇七", "7"), ("一〇〇〇", "1000"), ("三千2百２十三", "3223"),
    ("兆", "1000000000000"), ("十万二千五百", "102500"),
    ("１０万", "100000"), ("６００万", "6000000"),
    ("3", "3"), ("３", "3"), ("三", "3"),
    ("03", "3"), ("０３", "3"), ("〇三", "3"),
    ("003", "3"), ("００３", "3"), ("〇〇三", "3"),
    ("千", "1000"), ("1千", "1000"), ("3.2千", "3200"),
    ("1.2万345.67", "12345.67"), ("4,647.100", "4647.1"), ("15,7", "157"),
]


@pytest.mark.parametrize("text,expected", NUMBER_VECTORS)
def test_number_normalization(text, expected):
    from lucene_kmp_ray.analysis.japanese import ja_normalize_number
    assert ja_normalize_number(text) == expected


def test_number_filter_sentence():
    from lucene_kmp_ray.analysis.japanese import ja_number_filter
    t = JapaneseTokenizer(mode="search")
    toks = ja_number_filter(t.tokenize("本日十万二千五百円のワインを買った"))
    assert [(x.surface, x.start, x.end) for x in toks] == [
        ("本日", 0, 2), ("102500", 2, 8), ("円", 8, 9), ("の", 9, 10),
        ("ワイン", 10, 13), ("を", 13, 14), ("買っ", 14, 16), ("た", 16, 17)]


def test_number_filter_fullwidth_digits():
    from lucene_kmp_ray.analysis.japanese import ja_number_filter
    t = JapaneseTokenizer(mode="search", discard_punctuation=False)
    toks = ja_number_filter(t.tokenize("昨日のお寿司は１０万円でした。"))
    assert [(x.surface, x.start, x.end) for x in toks] == [
        ("昨日", 0, 2), ("の", 2, 3), ("お", 3, 4), ("寿司", 4, 6),
        ("は", 6, 7), ("100000", 7, 10), ("円", 10, 11), ("でし", 11, 13),
        ("た", 13, 14), ("。", 14, 15)]


def test_number_filter_mixed():
    from lucene_kmp_ray.analysis.japanese import ja_number_filter
    t = JapaneseTokenizer(mode="search")
    toks = ja_number_filter(t.tokenize("アティリカの資本金は６００万円です"))
    assert [x.surface for x in toks] == [
        "アティリカ", "の", "資本", "金", "は", "6000000", "円", "です"]


def test_unparseable_number_unchanged():
    from lucene_kmp_ray.analysis.japanese import ja_normalize_number
    assert ja_normalize_number("abc") == "abc"


# --- TestJapaneseIterationMarkCharFilter.kt + kana uppercase ----------

ITERATION_VECTORS = [
    ("時々", "時時"), ("馬鹿々々しい", "馬鹿馬鹿しい"),
    ("ミスヾ", "ミスズ"), ("おゝの", "おおの"), ("みすゞ", "みすず"),
    ("じゞ", "じじ"), ("こゝろ", "こころ"), ("学問のすゝめ", "学問のすすめ"),
    ("々", "々"),            # no source char: mark passes through
    ("時々。時々", "時時。時時"),  # full stop resets the span
]


@pytest.mark.parametrize("text,expected", ITERATION_VECTORS)
def test_iteration_mark_fold(text, expected):
    from lucene_kmp_ray.analysis.japanese import iteration_mark_fold
    assert iteration_mark_fold(text) == expected


def test_iteration_mark_flags():
    from lucene_kmp_ray.analysis.japanese import iteration_mark_fold
    assert iteration_mark_fold("時々", normalize_kanji=False) == "時々"
    assert iteration_mark_fold("おゝの", normalize_kana=False) == "おゝの"


def test_kana_uppercase():
    from lucene_kmp_ray.analysis.japanese import (hiragana_uppercase,
                                                  katakana_uppercase)
    assert hiragana_uppercase("ちょっとまって") == "ちよつとまつて"
    assert katakana_uppercase("ストップウォッチ") == "ストツプウオツチ"
    assert katakana_uppercase("セㇷ゚テンバー") == "セプテンバー"


# --- TestExtendedMode.kt -----------------------------------------------


def test_extended_mode_unknown_unigrams():
    t = JapaneseTokenizer(mode="extended")
    # rare kanji (incl. a surrogate-pair char) split into unigrams
    got = [x.surface for x in t.tokenize("𩬅艱鍟䇹愯瀛")]
    assert got == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]


def test_extended_mode_known_words_intact():
    t = JapaneseTokenizer(mode="extended")
    got = [x.surface for x in t.tokenize("関西国際空港")]
    assert got == ["関西", "国際", "空港"]


def test_extended_mode_katakana_unigrams():
    t = JapaneseTokenizer(mode="extended")
    # unknown katakana run splits; known katakana stays whole
    got = [x.surface for x in t.tokenize("ヌレグチェ")]
    assert got == ["ヌ", "レ", "グ", "チ", "ェ"]


# --- TestJapaneseReadingFormFilter.kt + ToStringUtil Hepburn ----------

HEPBURN_VECTORS = [
    ("マージャン", "majan"), ("ウーロンチャ", "uroncha"),
    ("チャーハン", "chahan"), ("チャーシュー", "chashu"),
    ("シューマイ", "shumai"), ("コンヤ", "kon'ya"),
    ("センセイ", "sensei"), ("キョウ", "kyō"), ("シンバシ", "shimbashi"),
]


@pytest.mark.parametrize("kana,expected", HEPBURN_VECTORS)
def test_hepburn_romanization(kana, expected):
    from lucene_kmp_ray.analysis.japanese import romanize_katakana
    assert romanize_katakana(kana) == expected


def test_reading_form_katakana():
    from lucene_kmp_ray.analysis.japanese import reading_form
    t = JapaneseTokenizer(mode="search")
    toks = reading_form(t.tokenize("今夜はロバート先生と話した"))
    assert [x.surface for x in toks] == [
        "コンヤ", "ハ", "ロバート", "センセイ", "ト", "ハナシ", "タ"]


def test_reading_form_romaji():
    from lucene_kmp_ray.analysis.japanese import reading_form
    t = JapaneseTokenizer(mode="search")
    toks = reading_form(t.tokenize("今夜はロバート先生と話した"),
                        use_romaji=True)
    assert [x.surface for x in toks] == [
        "kon'ya", "ha", "robato", "sensei", "to", "hanashi", "ta"]


def test_reading_form_halfwidth_input():
    from lucene_kmp_ray.analysis.japanese import (cjk_width_fold_offsets,
                                                  reading_form)
    folded, _ = cjk_width_fold_offsets("今夜はﾛﾊﾞｰﾄ先生と話した")
    t = JapaneseTokenizer(mode="search")
    toks = reading_form(t.tokenize(folded))
    assert [x.surface for x in toks] == [
        "コンヤ", "ハ", "ロバート", "センセイ", "ト", "ハナシ", "タ"]


# --- TestJapaneseTokenizer.kt user-dictionary vectors ------------------


@pytest.fixture(scope="module")
def user_dict():
    from lucene_kmp_ray.analysis.japanese import UserDictionary
    return UserDictionary("""
# Custom segmentation for long entries
日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞
関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,テスト名詞
朝青龍,朝青龍,アサショウリュウ,カスタム人名
abcd,a b cd,foo1 foo2 foo3,bar
abcdefg,ab cd efg,foo1 foo2 foo4,bar
""")


def test_user_dict_segmentation(user_dict):
    t = JapaneseTokenizer(mode="search", user_dict=user_dict)
    got = [(x.surface, x.start, x.end)
           for x in t.tokenize("関西国際空港に行った")]
    assert got == [("関西", 0, 2), ("国際", 2, 4), ("空港", 4, 6),
                   ("に", 6, 7), ("行っ", 7, 9), ("た", 9, 10)]


def test_user_dict_whole_word(user_dict):
    t = JapaneseTokenizer(mode="search", user_dict=user_dict)
    # 朝青龍 stays whole (search-mode penalty rescore skips USER tokens)
    assert [x.surface for x in t.tokenize("朝青龍")] == ["朝青龍"]


def test_user_dict_ascii_split(user_dict):
    t = JapaneseTokenizer(mode="search", user_dict=user_dict)
    assert [x.surface for x in t.tokenize("abcd")] == ["a", "b", "cd"]


def test_user_dict_readings(user_dict):
    from lucene_kmp_ray.analysis.japanese import reading_form
    t = JapaneseTokenizer(mode="search", user_dict=user_dict)
    toks = reading_form(t.tokenize("日本経済新聞"))
    assert [x.surface for x in toks] == ["ニホン", "ケイザイ", "シンブン"]


# --- TestJapaneseBaseFormFilter.kt --------------------------------------


def test_base_form_sentence():
    t = JapaneseTokenizer(mode="search")
    toks = t.tokenize("それはまだ実験段階にあります")
    assert [x.base_form or x.surface for x in toks] == \
        ["それ", "は", "まだ", "実験", "段階", "に", "ある", "ます"]
    # without the filter the inflected surfaces pass through
    assert [x.surface for x in toks] == \
        ["それ", "は", "まだ", "実験", "段階", "に", "あり", "ます"]
