"""SoraniAnalyzer conformance vectors from the reference's
TestSoraniNormalizationFilter.kt / TestSoraniStemFilter.kt."""

from lucene_kmp_ray.analysis.kurdish import (SoraniAnalyzer,
                                             sorani_normalize, sorani_stem)


def test_normalize_y_k():
    assert sorani_normalize("ي") == "ی"
    assert sorani_normalize("ى") == "ی"
    assert sorani_normalize("ی") == "ی"
    assert sorani_normalize("ك") == "ک"
    assert sorani_normalize("ک") == "ک"


def test_normalize_h():
    assert sorani_normalize("ه‌") == "ە"
    assert sorani_normalize("ه‌ک") == "ەک"
    assert sorani_normalize("ھ") == "ه"
    assert sorani_normalize("ة") == "ە"
    # final-H rule applies only to the last original char
    assert sorani_normalize("ههه") == "ههە"


def test_normalize_rr():
    assert sorani_normalize("ڒ") == "ڕ"
    assert sorani_normalize("ررر") == "ڕرر"


def test_normalize_remove():
    for c in ("ـًٌٍَُِّ"
              "ْ‌"):
        assert sorani_normalize(c) == ""
    assert sorani_normalize("") == ""


def test_stem_singular():
    assert sorani_stem("پیاوێک") == "پیاو"            # -ek
    assert sorani_stem("دەرگایەک") == "دەرگا"    # -yek
    assert sorani_stem("پیاوەكە".replace("ك", "ک")) == "پیاو"  # -aka
    assert sorani_stem("دەرگاكە".replace("ك", "ک")) == "دەرگا"  # -ka
    assert sorani_stem("کتاویە") == "کتاوی"          # -a
    assert sorani_stem("دەرگایە") == "دەرگا"        # -ya


def test_stem_plural():
    assert sorani_stem("پیاوان") == "پیاو"            # -An
    assert sorani_stem("دەرگایان") == "دەرگا"    # -yAn
    assert sorani_stem("پیاوەکان") == "پیاو"        # -akAn
    assert sorani_stem("دەرگاکان") == "دەرگا"    # -kAn
    assert sorani_stem("پیاوانە") == "پیاو"          # -Ana
    assert sorani_stem("دەرگایانە") == "دەرگا"  # -yAna


def test_stem_ezafe_postpositions_possessives():
    assert sorani_stem("هۆتیلی") == "هۆتیل"
    assert sorani_stem("هۆتیلێکی") == "هۆتیل"
    assert sorani_stem("هۆتیلانی") == "هۆتیل"
    assert sorani_stem("دوورەوە") == "دوور"          # -awa
    assert sorani_stem("نیوەشەودا") == "نیوەشەو"  # -dA
    assert sorani_stem("سۆرانا") == "سۆران"          # -A
    assert sorani_stem("پارەمان") == "پارە"          # -mAn
    assert sorani_stem("پارەتان") == "پارە"          # -tAn
    assert sorani_stem("پارەیان") == "پارە"          # -yAn


def test_analyzer_chain():
    a = SoraniAnalyzer()
    # "aka" definite + normalization (KAF → KEHEH) through the full chain
    assert a("پیاوەكە") == ["پیاو"]
    # stop word removed
    assert a("ئەم پیاوە") == ["پیاو"]
    # English text passes through untouched (stop/stem are no-ops)
    assert a("The merge runs") == ["the", "merge", "runs"]


def test_sql_parity_on_vectors():
    """The generated SQL normalizer+stemmer must agree with the Python
    chain on every conformance vector."""
    import duckdb

    from lucene_kmp_ray.oracle import _ckb_norm_sql, _SQL_DIGIT_FOLD

    words = ["ي", "ى", "ك", "ه‌",
             "ه‌ک", "ھ", "ة",
             "ههه", "ڒ", "ررر",
             "ـ", "ًر", "پیاوەکان", "دەرگایانە",
             "هۆتیلێکی", "نیوەشەودا", "پارەمان", "merge", "a­b"]
    con = duckdb.connect()
    expr = _SQL_DIGIT_FOLD.format(col=_ckb_norm_sql("w"))
    got = con.execute(
        f"SELECT {expr} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    from lucene_kmp_ray.analysis.kurdish import _ckb_pre
    assert [g[0] for g in got] == [_ckb_pre(w) for w in words]
