"""Belarusian/Haitian/Uzbek/Urdu conformance: vectors from the
reference's Test*Analyzer.kt suites plus generated-SQL parity fuzz."""

import random

from lucene_kmp_ray.analysis import extra_misc as em
from lucene_kmp_ray.analysis.arabic import fold_digits


def test_belarusian():
    a = em.BelarusianAnalyzer()
    assert a("Мінску") == ["мінск"]
    assert a("пʼе") == ["п'е"]
    assert a("١٢٣٤") == ["1234"]
    assert a("я і ты ў мінску") == ["мінск"]


def test_haitian():
    a = em.HaitianAnalyzer()
    assert a("Kreyòl") == ["kreyol"]
    assert a("rapidman") == ["rapid"]
    assert a("Mwen ap pale ak timoun yo rapidman") == [
        "pale", "timoun", "rapid"]


def test_uzbek():
    a = em.UzbekAnalyzer()
    assert a("Oʻzbekistonda") == ["o'zbekiston"]
    assert a("kitoblardan") == ["kitob"]
    assert a("uylarimizdan") == ["uy"]
    assert a("bu kitoblar va uylar") == ["kitob", "uy"]


def test_urdu():
    a = em.UrduAnalyzer()
    assert a("پاکستان") == ["پاکستان"]
    assert a("پاکستانی") == ["پاکستانی"]
    assert a("۱۲۳۴") == ["1234"]


def test_sql_parity():
    import duckdb

    from lucene_kmp_ray import oracle

    random.seed(101)
    con = duckdb.connect()

    def run(lang, words, py_norm, py_stem):
        words = sorted(set(w for w in words if w))
        norm, stem = oracle._misc_extra_sql(lang)
        if lang == "uz":
            stem_sql = f"""
u0 AS (SELECT doc_id, t0, CASE WHEN length(t0) <= 2 THEN NULL
       ELSE t0 END AS w FROM normed2),
u1 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({stem}) END AS w FROM u0),
u2 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({stem}) END AS w FROM u1),
u3 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({stem}) END AS w FROM u2)
SELECT t0, coalesce(w, t0) FROM u3 ORDER BY doc_id"""
        elif lang == "ur":
            pfx, infix, sfx = stem.removeprefix(
                "__UR_STAGES__").split("|||")
            stem_sql = f"""
u0 AS (SELECT doc_id, t0, CASE WHEN length(t0) <= 3 THEN NULL
       ELSE t0 END AS w FROM normed2),
u1 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({pfx}) END AS w FROM u0),
u2 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({infix}) END AS w FROM u1),
u3 AS (SELECT doc_id, t0, CASE WHEN w IS NULL THEN NULL
       ELSE ({sfx}) END AS w FROM u2)
SELECT t0, coalesce(w, t0) FROM u3 ORDER BY doc_id"""
        else:
            stem_sql = f"""
uf AS (SELECT doc_id, t0, t0 AS w FROM normed2)
SELECT t0, ({stem}) FROM uf ORDER BY doc_id"""
        sql = f"""
WITH raws AS (SELECT row_number() OVER () AS doc_id, traw
              FROM (SELECT unnest(?) AS traw)),
normed2 AS (SELECT doc_id, {norm} AS t0 FROM raws),
{stem_sql}
"""
        rows = con.execute(sql, [words]).fetchall()
        for wraw, (nt, st) in zip(words, rows):
            pn = py_norm(fold_digits(wraw))
            assert nt == pn, (lang, wraw)
            assert st == py_stem(pn), (lang, wraw)

    words = ["мінску", "пʼе"]
    for _ in range(400):
        base = "".join(random.choice("абвгдеёжзійклмнопрстуўфхىь’")
                       for _ in range(random.randint(1, 8)))
        words.append(base + random.choice(em.BE_SUFFIXES + [""]))
    run("be", words, em.belarusian_normalize, em.belarusian_stem)

    words = ["kreyòl", "rapidman", "m'ap", "pale'm"]
    for _ in range(400):
        base = "".join(random.choice("abdeghiklmnopstuwy'òàè")
                       for _ in range(random.randint(1, 7)))
        words.append(random.choice(["m'", "w'", "l'", ""]) + base +
                     random.choice(["'m", "'w", "man", ""]))
    run("ht", words, em.haitian_normalize, em.haitian_stem)

    words = ["oʻzbekistonda", "kitoblardan", "uylarimizdan"]
    for _ in range(400):
        base = "".join(random.choice("abdegijklmnopqrstuvxyzʻ'")
                       for _ in range(random.randint(1, 6)))
        words.append(base + random.choice(em.UZ_SUFFIXES + ["", ""]))
    run("uz", words, lambda t: t.translate(str.maketrans(em._UZ_MAP)),
        em.uzbek_stem)

    urchars = ("ابپتٹثجحخدڈذرڑزژسشصضطظعغفقکگلمنںوؤہھءیئے"
               "آأۓٔٓـًٌٍَُِّ")
    words = ["پاکستان", "پاکستانی"]
    for _ in range(400):
        base = "".join(random.choice(urchars)
                       for _ in range(random.randint(1, 7)))
        words.append(random.choice(em.UR_PREFIXES + ["", ""]) + base +
                     random.choice(em.UR_SUFFIXES + ["", ""]))
    run("ur", words, em.urdu_normalize, em.urdu_stem)
