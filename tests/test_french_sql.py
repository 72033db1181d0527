"""The staged-SQL French light-stemmer mirror (oracle._fr_stem_cols)
must agree with the Python stemmer (analysis/french.py) — this makes
bm25_french_top10 a valid hash oracle."""

import re

import duckdb

from lucene_kmp_ray.analysis.french import french_light_stem
from lucene_kmp_ray.oracle import _fr_stem_cols, _TrPipe

VECTORS = """chevaux cheval aux eaux baux chanter chantent chante
finissement finissant abaissement agissant element vivement
attentivement qualificatrice qualificateur certificatrice indicateur
explicatrice explicateur creatrice createur administratrice
administrateur animateur operatrice trice deuxième troisième chanteuse
porteuse chanteur menteur berceuse premières ère attentive attentif
folle molle personnelle personnel traditionnelle poète complète
politique publique scientifique richesse gentillesse patinage
voisinage organisation ritualisation utilisation organisateur
realisateur information tradition position nation proposition
batteries batterie continu continue continuer barreaux barreau
journaux journal baisse baissant""".split()


def _sql_stems(words):
    P = _TrPipe(["t0"])
    stem = _fr_stem_cols(P, "t0")
    ctes, last = P.emit("uniq", "frs")
    vals = ", ".join(f"('{w}')" for w in words)
    sql = (f"WITH uniq(t0) AS (VALUES {vals}),\n{ctes}\n"
           f"SELECT t0, {stem} FROM {last}")
    return dict(duckdb.connect().execute(sql).fetchall())


def test_french_vectors_agree():
    got = _sql_stems(sorted(set(VECTORS)))
    for w in sorted(set(VECTORS)):
        assert got[w] == french_light_stem(w), w


def test_repo_vocabulary_agrees():
    words = set()
    for path in ["/root/repo/SURVEY.md", "/root/repo/README.md"]:
        words.update(re.findall(r"[a-z]+", open(path).read().lower()))
    words = sorted(words)[:3000]
    got = _sql_stems(words)
    bad = [w for w in words if got[w] != french_light_stem(w)]
    assert not bad, bad[:10]


def test_random_soup_agrees():
    import random
    rng = random.Random(7)
    alphabet = "aeilmnorstuxèéêcfv"
    words = sorted({"".join(rng.choice(alphabet)
                            for _ in range(rng.randint(1, 14)))
                    for _ in range(400)})
    got = _sql_stems(words)
    bad = [w for w in words if got[w] != french_light_stem(w)]
    assert not bad, bad[:10]
