"""Catalan analysis chain.

Reference chain (``/root/reference/analysis/common/.../ca/CatalanAnalyzer.kt``):
StandardTokenizer → ElisionFilter(d/l/m/n/s/t) → LowerCase → Stop →
SnowballFilter(CatalanStemmer).

The stemmer is the reference's simplified rule set
(``tartarus/snowball/ext/CatalanStemmer.kt``): middot → '.', accent
fold (à/á→a è/é→e ì/í/ï→i ò/ó→o ù/ú/ü→u), then the first matching of
the word-specific rules (llengues/llengua/diccionari/institut/estudis/
catalans) or the generic es/s/a strips with a 4-char guard.

SQL mirror: ``oracle.bm25_catalan_topk`` (same tables).
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

CATALAN_STOP_WORDS = frozenset("""
a abans ací ah així això al aleshores algun alguna algunes alguns alhora allà allí allò als altra altre altres amb ambdues ambdós apa aquell aquella aquelles aquells aquest aquesta aquestes aquests aquí baix cada cadascuna cadascunes cadascuns cadascú com contra d'un d'una d'unes d'uns dalt de del dels des després dins dintre donat doncs durant e eh el els em en encara ens entre eren es esta estaven esteu està estàvem estàveu et etc ets fins fora gairebé ha han has havia he hem heu hi ho i igual iguals ja l'hi la les li li'n llavors m'he ma mal malgrat mateix mateixa mateixes mateixos me mentre meu meus meva meves molt molta moltes molts mon mons més n'he n'hi ne ni no nogensmenys només nosaltres nostra nostre nostres o oh oi on pas pel pels per perquè però poc poca pocs poques potser propi qual quals quan quant que quelcom qui quin quina quines quins què s'ha s'han sa semblant semblants ses seu seus seva seves si sobre sobretot solament sols son sons sota sou sóc són t'ha t'han t'he ta tal també tampoc tan tant tanta tantes teu teus teva teves ton tons tot tota totes tots un una unes uns us va vaig vam van vas veu vosaltres vostra vostre vostres érem éreu és
""".split())

CATALAN_ARTICLES = frozenset("d l m n s t".split())

_CA_FOLD = str.maketrans("àáèéìíïòóùúü·", "aaeeiiioouuu.")

# (suffix, min_len_exclusive, drop) in reference `when` order; 0 guard
# means unconditional
CA_RULES = [
    ("llengues", 0, 2), ("llengua", 0, 1), ("diccionari", 0, 3),
    ("institut", 0, 4), ("estudis", 0, 2), ("catalans", 0, 1),
    ("es", 4, 2), ("s", 4, 1), ("a", 4, 1),
]


def catalan_stem(w: str) -> str:
    if not w:
        return w
    w = w.translate(_CA_FOLD)
    for sfx, min_len, drop in CA_RULES:
        if w.endswith(sfx) and (min_len == 0 or len(w) > min_len):
            return w[:len(w) - drop]
    return w


def _elide_ca(tok: str) -> str:
    for apo in ("'", "’"):
        i = tok.find(apo)
        if 0 < i and tok[:i] in CATALAN_ARTICLES and i + 1 < len(tok):
            return tok[i + 1:]
    return tok


class CatalanAnalyzer(_RomanceAnalyzer):
    name = "catalan"
    stop_words = CATALAN_STOP_WORDS
    elide = staticmethod(_elide_ca)

    def _stem(self, tok: str) -> str:
        return catalan_stem(tok)
