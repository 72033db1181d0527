"""ThaiAnalyzer conformance: syllable state machine, chain order
(tokenize → lowercase → digit fold → stop), and recursive-CTE SQL
parity."""

import duckdb

from lucene_kmp_ray.analysis.thai import ThaiAnalyzer, thai_segments


def test_syllable_segmentation():
    assert thai_segments("ภาษาไทย") == ["ภา", "ษา", "ไทย"]
    assert thai_segments("การ") == ["การ"]
    assert thai_segments("ไม่") == ["ไม่"]
    assert thai_segments("เป็นการ") == ["เป็น", "การ"]
    assert thai_segments("merge") == ["merge"]
    assert thai_segments("ทดสอบ123") == ["ทด", "สอ", "บ", "123"]


def test_chain_stop_and_digits():
    a = ThaiAnalyzer()
    # single-syllable stopwords are filtered after segmentation
    assert a("การ ไม่ เป็น") == []
    # Thai digits fold to ASCII (DecimalDigitFilter), Latin lowercases
    assert a("๑๒๓ FIFA") == ["123", "fifa"]
    assert a("merge window") == ["merge", "window"]


def test_sql_scan_parity():
    from lucene_kmp_ray.oracle import _th_scan_ctes
    words = ["ภาษาไทย", "การทดสอบ", "เป็นการ", "ไม่", "ที่สุด", "ศิลป์",
             "๑๒๓", "กรุงเทพฯ", "ทดสอบ123", "สํานักงาน", "ความเร็ว",
             "ต่างๆ", "เรียนรู้", "ประเทศไทย", "อยากรู้อยากเห็น"]
    vals = ",".join(f"'{w}'" for w in words)
    sql = f"""
WITH RECURSIVE thsrc AS (SELECT unnest([{vals}]) AS traw),
{_th_scan_ctes('thsrc')}
SELECT traw, seg FROM thsegs
"""
    got: dict[str, list[str]] = {}
    for traw, seg in duckdb.sql(sql).fetchall():
        got.setdefault(traw, []).append(seg)
    for w in words:
        assert sorted(got.get(w, [])) == sorted(thai_segments(w)), w
