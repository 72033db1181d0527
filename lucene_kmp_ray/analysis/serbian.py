"""Serbian analysis chain.

Reference chain (``/root/reference/analysis/common/.../sr/SerbianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(SerbianStemmer) →
SerbianNormalizationFilter — note the stemmer runs BEFORE the
Cyrillic→bald-Latin normalization, so the Latin suffix rules only fire
on Latin-script tokens (faithful to the reference order).

The stemmer is the reference's simplified rule set
(``tartarus/snowball/ext/SerbianStemmer.kt``: first matching of
ima/ovima/evima/nim/ni/će/te with length guards); the normalizer
(``sr/SerbianNormalizationFilter.kt``) maps Cyrillic to Latin, expands
ђ/đ→dj, љ→lj, њ→nj, џ→dz, and folds ž/č/ć/š diacritics.

SQL mirror: ``oracle.bm25_serbian_topk`` (same tables).
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

SERBIAN_STOP_WORDS = frozenset("""
a ali bi bih bila bile bili bilo bio bise bismo biste biti biše bude budem budemo budes budete budeš budimo budite budu ce cemo ces cete cu i ili je jesam jesi jesmo jeste jesu mogu moze mozemo mozes mozete može možemo možete možeš ne nece necemo neces necete necu neće nećemo nećete nećeš neću nije nijesam nijesi nijesmo nijeste nijesu nisam nisi nismo niste nisu pa sam si smo ste su će ćemo ćete ćeš ću а али би била биле били било био бисе бисмо бисте бити бих бише буде будем будемо будес будете будеш будимо будите буду и или могу може можемо можете можеш мозе моземо мозес мозете не неце нецемо нецес нецете нецу неће нећемо нећете нећеш нећу нисам ниси нисмо нисте нису није нијесам нијеси нијесмо нијесте нијесу па сам си смо сте су це цемо цес цете цу је јесам јеси јесмо јесте јесу ће ћемо ћете ћеш ћу
""".split())

# (suffix, min_len_exclusive, drop) in reference `when` order
SR_RULES = [
    ("ima", 4, 3), ("ovima", 6, 5), ("evima", 6, 5), ("nim", 4, 2),
    ("ni", 3, 1), ("ima", 5, 3), ("će", 3, 1), ("te", 3, 1),
]

# Cyrillic → Latin (1:1), plus diacritic folds
SR_MAP = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "ћ": "c", "ц": "c", "ч": "c", "č": "c",
    "ć": "c", "у": "u", "ф": "f", "х": "h", "ш": "s", "š": "s",
}
# expanding maps (1 → 2 chars), applied per char in the same scan
SR_EXPAND = {"ђ": "dj", "đ": "dj", "љ": "lj", "њ": "nj", "џ": "dz"}


def serbian_stem(w: str) -> str:
    for sfx, min_len, drop in SR_RULES:
        if w.endswith(sfx) and len(w) > min_len:
            return w[:len(w) - drop]
    return w


def serbian_normalize(s: str) -> str:
    out = []
    for c in s:
        e = SR_EXPAND.get(c)
        if e is not None:
            out.append(e)
        else:
            out.append(SR_MAP.get(c, c))
    return "".join(out)


class SerbianAnalyzer(_RomanceAnalyzer):
    name = "serbian"
    stop_words = SERBIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return serbian_normalize(serbian_stem(tok))
