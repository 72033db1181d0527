"""The staged-SQL Porter mirror (oracle._porter_cols) must agree with
the Python Porter (analysis/porter.py) — this equivalence is what makes
bm25_english_top10 / bm25_chinese_top10 hash oracles valid."""

import re

import duckdb
import pytest

from lucene_kmp_ray.analysis.porter import porter_stem
from lucene_kmp_ray.oracle import _porter_cols, _TrPipe


def _sql_stems(words: list[str]) -> dict[str, str]:
    P = _TrPipe(["t0"])
    stem = _porter_cols(P, "t0")
    ctes, last = P.emit("uniq", "pos")
    vals = ", ".join(f"('{w}')" for w in words)
    sql = (f"WITH uniq(t0) AS (VALUES {vals}),\n{ctes}\n"
           f"SELECT t0, {stem} FROM {last}")
    return dict(duckdb.connect().execute(sql).fetchall())


CLASSIC = [
    "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
    "plastered", "bled", "motoring", "sing", "conflated", "troubled",
    "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
    "failing", "filing", "happy", "sky", "relational", "conditional",
    "rational", "valenci", "hesitanci", "digitizer", "conformabli",
    "radicalli", "differentli", "vileli", "analogousli",
    "vietnamization", "predication", "operator", "feudalism",
    "decisiveness", "hopefulness", "callousness", "formaliti",
    "sensitiviti", "sensibiliti", "triplicate", "formative", "formalize",
    "electriciti", "electrical", "hopeful", "goodness", "revival",
    "allowance", "inference", "airliner", "gyroscopic", "adjustable",
    "defensible", "irritant", "replacement", "adjustment", "dependent",
    "adoption", "homologou", "communism", "activate", "angulariti",
    "homologous", "effective", "bowdlerize", "probate", "rate", "cease",
    "controll", "roll", "controlling", "generalization", "oscillate",
    "giving", "leaves", "lived", "oversized", "syzygy", "yyyy",
    "flies", "dies", "died", "owned", "fly", "crying", "string",
    "meetings", "archaeology", "logi",
]


def test_classic_vectors_agree():
    got = _sql_stems(CLASSIC)
    for w in CLASSIC:
        assert got[w] == porter_stem(w), w


def test_repo_vocabulary_agrees():
    words = set()
    for path in ["/root/repo/SURVEY.md", "/root/repo/README.md"]:
        words.update(re.findall(r"[a-z]+", open(path).read().lower()))
    words = sorted(words)[:3000]
    got = _sql_stems(words)
    bad = [w for w in words if got[w] != porter_stem(w)]
    assert not bad, bad[:10]


@pytest.mark.parametrize("n", [500])
def test_random_letter_soup_agrees(n):
    import random
    rng = random.Random(42)
    words = ["".join(rng.choice("abcdefgilmnorstuvwyz")
                     for _ in range(rng.randint(1, 12)))
             for _ in range(n)]
    words = sorted(set(words))
    got = _sql_stems(words)
    bad = [w for w in words if got[w] != porter_stem(w)]
    assert not bad, bad[:10]
