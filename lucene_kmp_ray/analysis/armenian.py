"""Armenian analysis chain.

Reference chain (``/root/reference/analysis/common/.../hy/ArmenianAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(ArmenianStemmer).

ArmenianStemmer (``tartarus/snowball/ext/ArmenianStemmer.kt``,
Snowball 2.2): regions pV (after the first vowel of ա ե է ը ի ո ւ օ)
and R2; four sequential longest-match suffix deletions — ending
(bounded to pV, deleted only when the suffix starts in R2), verb,
adjective, noun (each bounded to pV).  A committed longest match whose
R2 condition fails deletes nothing (snowball ``find_among_b``).

SQL mirror: ``oracle.bm25_armenian_topk``.  Conformance is covered by
SQL-parity fuzzing in tests/test_armenian_analyzer.py (the reference
ships no Armenian stemmer vectors).
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

ARMENIAN_STOP_WORDS = frozenset("""
այդ այլ այն այս dու dուք եմ են ենք ես եք է էի էին էինք էիր էիք էր
ըստ թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ մի ն նա նաև նրա նրանք
որ որը որոնք որպես ու ում պիտի վրա և
""".split())

HY_VOWELS = frozenset("աեէըիոււօ")

HY_ENDING = [
    "ությանդ",
    "ությանը",
    "ությանն",
    "ությանս",
    "ներում",
    "ության",
    "անում",
    "երում",
    "ներին",
    "ներով",
    "վանից",
    "ներից",
    "վանդ",
    "ներդ",
    "վանը",
    "ները",
    "ների",
    "երին",
    "ներն",
    "վանս",
    "անով",
    "երով",
    "ոջից",
    "երից",
    "ամբ",
    "անդ",
    "ոջդ",
    "երդ",
    "ուդ",
    "անը",
    "ոջը",
    "երը",
    "երի",
    "վան",
    "երն",
    "ուն",
    "ոջս",
    "վով",
    "ներ",
    "վից",
    "ցից",
    "ուց",
    "սա",
    "վա",
    "վի",
    "ան",
    "ին",
    "ոջ",
    "ով",
    "եր",
    "ից",
    "ոց",
    "դ",
    "ը",
    "ի",
    "ն",
    "ց",
]

HY_VERB = [
    "ացրինք",
    "վեցինք",
    "ացնալ",
    "եցնել",
    "ացվել",
    "եցվել",
    "կոտել",
    "ացրին",
    "վեցին",
    "ացրիր",
    "վեցիր",
    "ացրեց",
    "ալուց",
    "ելուց",
    "ացրիք",
    "վեցիք",
    "ացանք",
    "ացինք",
    "եցինք",
    "ացրի",
    "վեցի",
    "անալ",
    "ենալ",
    "ցնել",
    "ատել",
    "ոտել",
    "վում",
    "ացան",
    "ացին",
    "եցին",
    "ալիս",
    "ելիս",
    "ացավ",
    "եցավ",
    "ալով",
    "ելով",
    "ացար",
    "եցար",
    "ացիր",
    "եցիր",
    "ալու",
    "ելու",
    "ացաք",
    "ացիք",
    "եցիք",
    "ցանք",
    "ացա",
    "եցա",
    "ացի",
    "եցի",
    "ըալ",
    "ըել",
    "նել",
    "չել",
    "վել",
    "տել",
    "ված",
    "ում",
    "ցան",
    "ցաք",
    "անք",
    "վե",
    "ալ",
    "ել",
    "ան",
    "ավ",
    "ար",
    "աց",
    "եց",
    "աք",
    "ա",
]

HY_ADJECTIVE = [
    "երորդ",
    "րորդ",
    "որակ",
    "ական",
    "արան",
    "եկեն",
    "երեն",
    "որէն",
    "ովին",
    "լայն",
    "վուն",
    "ավետ",
    "ալի",
    "ակի",
    "գին",
    "պես",
    "կոտ",
    "բար",
    "եղ",
    "են",
    "ին",
    "իվ",
    "ատ",
]

HY_NOUN = [
    "ություն",
    "մունք",
    "ույթ",
    "ուհի",
    "անակ",
    "ստան",
    "արան",
    "եղէն",
    "յուն",
    "ուստ",
    "ավոր",
    "անօց",
    "ալիք",
    "անիք",
    "վածք",
    "ույք",
    "ունք",
    "որդ",
    "յակ",
    "ուկ",
    "պան",
    "ածո",
    "ուս",
    "գար",
    "վոր",
    "չեք",
    "ենք",
    "ոնք",
    "իչք",
    "արք",
    "ցի",
    "իլ",
    "ակ",
    "իկ",
    "ան",
    "իչ",
    "ոց",
    "ու",
    "իք",
    "ք",
]


def _find_del(w: str, table, bound: int):
    """Longest suffix starting at >= bound (find_among_b semantics);
    returns its start or -1."""
    for sfx in table:
        if len(w) - len(sfx) >= bound and w.endswith(sfx):
            return len(w) - len(sfx)
    return -1


def _hy_regions(w: str) -> tuple[int, int]:
    n = len(w)
    i = 0
    while i < n and w[i] not in HY_VOWELS:
        i += 1
    if i == n:
        return n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in HY_VOWELS:
        i += 1
    while i < n and w[i] not in HY_VOWELS:
        i += 1
    if i == n:
        return pv, n
    while i < n and w[i] in HY_VOWELS:
        i += 1
    if i == n:
        return pv, n
    return pv, i + 1


def armenian_stem(w: str) -> str:
    pv, p2 = _hy_regions(w)
    if len(w) < pv:
        return w
    s = _find_del(w, HY_ENDING, pv)
    if s >= 0 and s >= p2:
        w = w[:s]
    for table in (HY_VERB, HY_ADJECTIVE, HY_NOUN):
        s = _find_del(w, table, pv)
        if s >= 0:
            w = w[:s]
    return w


class ArmenianAnalyzer(_RomanceAnalyzer):
    name = "armenian"
    stop_words = ARMENIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return armenian_stem(tok)
