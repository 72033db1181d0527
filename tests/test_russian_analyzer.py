"""Russian snowball chain.

Conformance vectors from the reference TestRussianAnalyzer.kt
(testReusableTokenStream / testDigitsInRussianCharset) and a
Python↔SQL parity sweep over Cyrillic words proving
oracle._russian_stem_ctes implements the same stemmer.
"""

import random

import duckdb

from lucene_kmp_ray.analysis.russian import (RussianAnalyzer, mark_rv_r2,
                                             russian_stem)
from lucene_kmp_ray.oracle import _russian_stem_ctes


def test_reference_vectors():
    # TestRussianAnalyzer.kt testReusableTokenStream
    a = RussianAnalyzer()
    assert a("Вместе с тем о силе электромагнитной энергии имели "
             "представление еще") == \
        ["вмест", "сил", "электромагнитн", "энерг", "имел",
         "представлен"]
    assert a("Но знание это хранилось в тайне") == \
        ["знан", "эт", "хран", "тайн"]


def test_digits_pass_through():
    # TestRussianAnalyzer.kt testDigitsInRussianCharset
    a = RussianAnalyzer()
    assert a("text 1000") == ["text", "1000"]


def test_stem_steps():
    # perfective gerund after а
    assert russian_stem("пробежавшись") == "пробежа"
    # reflexive + verb
    assert russian_stem("хранилось") == "хран"
    # noun а / и endings
    assert russian_stem("книга") == "книг"
    assert russian_stem("книги") == "книг"
    # adjective + trailing и step
    assert russian_stem("важная") == "важн"
    # ё folds to е before everything
    assert russian_stem("ёлка") == russian_stem("елка")
    # tidy-up ь
    assert russian_stem("статья") == "стат"


def test_regions():
    # в-м-е-с-т-е: RV after е(idx 2); R2 scan: е с → vowel т? trace via fn
    pv, p2 = mark_rv_r2("вместе")
    assert pv == 3
    # word with no vowels: both regions empty
    pv, p2 = mark_rv_r2("кт")
    assert pv == 2 and p2 == 2


def test_sql_mirror_parity():
    rng = random.Random(5)
    alpha = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
    words = ("вместе силе электромагнитной энергии имели представление "
             "знание это хранилось тайне пробежавшись книга книги важная "
             "статьи статья слабость лучший сильнейшее думавшаяся "
             "остановиться нность").split()
    words += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
              for _ in range(600)]
    words = sorted(set(words))
    con = duckdb.connect()
    con.execute("CREATE TABLE rkept(doc_id INTEGER, t0 VARCHAR)")
    con.executemany("INSERT INTO rkept VALUES (?,?)",
                    list(enumerate(words)))
    sql = ("WITH " + _russian_stem_ctes()
           + " SELECT doc_id, term FROM rterms ORDER BY doc_id")
    for i, term in con.execute(sql).fetchall():
        assert term == russian_stem(words[i]), words[i]
