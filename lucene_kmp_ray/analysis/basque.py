"""Basque analysis chain.

Reference chain (``/root/reference/analysis/common/.../eu/BasqueAnalyzer.kt``):
StandardTokenizer → LowerCase → Stop → SnowballFilter(BasqueStemmer).

BasqueStemmer (``tartarus/snowball/ext/BasqueStemmer.kt``, Snowball
2.2): Spanish-style RV plus standard R1/R2 over the five vowels.  The
three steps run as snowball ``repeat`` loops that CARRY THE CURSOR:
after a match at [s, c) the next search matches suffixes ending at s —
text right of the first match (including no-op rewrites like
arabera→arabera) is never rescanned.  aditzak (verbs) repeats until a
miss or a failed region check, izenak (nouns) continues from where
aditzak stopped, adjetiboak applies once.  Each entry either deletes
when its start lies inside RV/R1/R2 (a failed check ends the loop) or
rewrites to a fixed form unconditionally.

SQL mirror: ``oracle.bm25_basque_topk`` (both repeat loops as
cursor-carrying recursive CTEs).  Parity fuzzing lives in
tests/test_basque_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

BASQUE_STOP_WORDS = frozenset("""
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek
beste bezala da dago dira ditu du dute edo egin ere eta eurak ez
gainera gu gutxi guzti haiei haiek haietan hainbeste hala han handik
hango hara hari hark hartan hau hauei hauek hauetan hemen hemendik
hemengo hi hona honek honela honetan honi hor hori horiei horiek
horietan horko horra horrek horrela horretan horri hortik hura izan
ni noiz nola non nondik nongo nor nora ze zein zen zenbait zenbat
zer zergatik ziren zituzten zu zuek zuen zuten
""".split())

EU_VOWELS = frozenset("aeiou")

# (suffix, region, replacement) — region-bounded delete when region set,
# fixed rewrite otherwise; longest-first
EU_ADITZAK = [
    ("tzailea", "rv", ""),
    ("arabera", "", "arabera"),
    ("atseden", "", "atseden"),
    ("kundea", "rv", ""),
    ("tailea", "rv", ""),
    ("taldia", "rv", ""),
    ("garria", "r2", ""),
    ("karria", "rv", ""),
    ("tezina", "rv", ""),
    ("kizuna", "rv", ""),
    ("gailua", "rv", ""),
    ("erreza", "rv", ""),
    ("gaitza", "rv", ""),
    ("kaitza", "rv", ""),
    ("kuntza", "rv", ""),
    ("tzaile", "rv", ""),
    ("tarazi", "rv", ""),
    ("aldatu", "rv", ""),
    ("baditu", "", "baditu"),
    ("bidea", "rv", ""),
    ("kidea", "rv", ""),
    ("pidea", "rv", ""),
    ("galea", "rv", ""),
    ("gunea", "rv", ""),
    ("kunea", "rv", ""),
    ("tzaga", "rv", ""),
    ("aldia", "rv", ""),
    ("karia", "rv", ""),
    ("tzaka", "rv", ""),
    ("ezina", "rv", ""),
    ("korra", "rv", ""),
    ("kunde", "rv", ""),
    ("tzake", "rv", ""),
    ("tzeke", "rv", ""),
    ("taile", "rv", ""),
    ("taldi", "rv", ""),
    ("etari", "rv", ""),
    ("garri", "r2", ""),
    ("karri", "rv", ""),
    ("arazi", "rv", ""),
    ("rekin", "rv", ""),
    ("tezin", "rv", ""),
    ("kizun", "rv", ""),
    ("gailu", "rv", ""),
    ("errez", "rv", ""),
    ("gaitz", "rv", ""),
    ("kaitz", "rv", ""),
    ("idea", "rv", ""),
    ("gaia", "rv", ""),
    ("mena", "rv", ""),
    ("pena", "rv", ""),
    ("kina", "rv", ""),
    ("kuna", "rv", ""),
    ("tuna", "rv", ""),
    ("bera", "rv", ""),
    ("kera", "rv", ""),
    ("pera", "rv", ""),
    ("orra", "rv", ""),
    ("dura", "rv", ""),
    ("gura", "rv", ""),
    ("kura", "rv", ""),
    ("tura", "rv", ""),
    ("keta", "rv", ""),
    ("bide", "rv", ""),
    ("kide", "rv", ""),
    ("pide", "rv", ""),
    ("gale", "rv", ""),
    ("gune", "rv", ""),
    ("kune", "rv", ""),
    ("atze", "rv", ""),
    ("aldi", "rv", ""),
    ("kari", "rv", ""),
    ("lari", "rv", ""),
    ("tari", "rv", ""),
    ("rean", "rv", ""),
    ("etan", "rv", ""),
    ("ezin", "rv", ""),
    ("dako", "rv", ""),
    ("tzat", "rv", ""),
    ("tatu", "rv", ""),
    ("tzez", "rv", ""),
    ("era", "rv", ""),
    ("eta", "rv", ""),
    ("eza", "rv", ""),
    ("tza", "r2", ""),
    ("ide", "rv", ""),
    ("tze", "rv", ""),
    ("gai", "rv", ""),
    ("ari", "rv", ""),
    ("ean", "rv", ""),
    ("kan", "rv", ""),
    ("men", "rv", ""),
    ("pen", "rv", ""),
    ("kin", "rv", ""),
    ("tun", "rv", ""),
    ("ago", "rv", ""),
    ("tio", "rv", ""),
    ("kor", "rv", ""),
    ("atu", "rv", ""),
    ("ka", "rv", ""),
    ("la", "rv", ""),
    ("le", "rv", ""),
    ("ki", "rv", ""),
    ("an", "rv", ""),
    ("go", "rv", ""),
    ("or", "rv", ""),
    ("du", "rv", ""),
    ("tu", "rv", ""),
    ("ez", "rv", ""),
]

EU_IZENAK = [
    ("minutuko", "", "minutu"),
    ("garrena", "rv", ""),
    ("gerrena", "rv", ""),
    ("kaldea", "rv", ""),
    ("taldea", "rv", ""),
    ("tzalea", "rv", ""),
    ("zionea", "rv", ""),
    ("aurrea", "rv", ""),
    ("taldia", "rv", ""),
    ("handia", "rv", ""),
    ("mendia", "rv", ""),
    ("garria", "r2", ""),
    ("larria", "rv", ""),
    ("kirria", "rv", ""),
    ("ontzia", "rv", ""),
    ("gibela", "rv", ""),
    ("urrena", "rv", ""),
    ("tzaina", "rv", ""),
    ("tasuna", "rv", ""),
    ("kondoa", "rv", ""),
    ("tzarra", "rv", ""),
    ("mendua", "rv", ""),
    ("mentua", "rv", ""),
    ("koitza", "rv", ""),
    ("gintza", "rv", ""),
    ("kintza", "rv", ""),
    ("kuntza", "rv", ""),
    ("garren", "rv", ""),
    ("gerren", "rv", ""),
    ("tariko", "rv", ""),
    ("gintzo", "rv", ""),
    ("gintzu", "rv", ""),
    ("denda", "rv", ""),
    ("gabea", "rv", ""),
    ("kabea", "rv", ""),
    ("aldea", "rv", ""),
    ("ordea", "rv", ""),
    ("zalea", "rv", ""),
    ("gilea", "rv", ""),
    ("kumea", "rv", ""),
    ("gunea", "rv", ""),
    ("kotea", "rv", ""),
    ("artea", "rv", ""),
    ("ostea", "rv", ""),
    ("etxea", "rv", ""),
    ("aldia", "rv", ""),
    ("degia", "rv", ""),
    ("tegia", "rv", ""),
    ("nahia", "rv", ""),
    ("tokia", "rv", ""),
    ("karia", "rv", ""),
    ("laria", "rv", ""),
    ("taria", "rv", ""),
    ("keria", "rv", ""),
    ("teria", "rv", ""),
    ("duria", "rv", ""),
    ("bizia", "rv", ""),
    ("aurka", "", "aurka"),
    ("kaila", "rv", ""),
    ("skila", "rv", ""),
    ("zaina", "rv", ""),
    ("garna", "rv", ""),
    ("asuna", "rv", ""),
    ("ondoa", "rv", ""),
    ("takoa", "rv", ""),
    ("zinoa", "rv", ""),
    ("taroa", "rv", ""),
    ("zaroa", "rv", ""),
    ("liara", "rv", ""),
    ("tiara", "rv", ""),
    ("etara", "rv", ""),
    ("tzara", "rv", ""),
    ("korra", "rv", ""),
    ("ordua", "rv", ""),
    ("lekua", "rv", ""),
    ("burua", "rv", ""),
    ("durua", "rv", ""),
    ("estua", "rv", ""),
    ("eroza", "rv", ""),
    ("antza", "rv", ""),
    ("kalde", "rv", ""),
    ("talde", "rv", ""),
    ("tzale", "rv", ""),
    ("zione", "rv", ""),
    ("aurre", "rv", ""),
    ("taldi", "rv", ""),
    ("geldi", "", "geldi"),
    ("handi", "rv", ""),
    ("mendi", "rv", ""),
    ("garri", "r2", ""),
    ("larri", "rv", ""),
    ("kirri", "rv", ""),
    ("ontzi", "rv", ""),
    ("tarik", "rv", ""),
    ("gibel", "rv", ""),
    ("urren", "rv", ""),
    ("tzain", "rv", ""),
    ("tasun", "rv", ""),
    ("aizun", "rv", ""),
    ("kondo", "rv", ""),
    ("trako", "", "tra"),
    ("etako", "rv", ""),
    ("igaro", "", "igaro"),
    ("behar", "rv", ""),
    ("zehar", "", "zehar"),
    ("mendu", "rv", ""),
    ("mentu", "rv", ""),
    ("koitz", "rv", ""),
    ("kada", "rv", ""),
    ("anda", "rv", ""),
    ("emea", "rv", ""),
    ("enea", "rv", ""),
    ("unea", "rv", ""),
    ("anga", "rv", ""),
    ("gaia", "rv", ""),
    ("geia", "rv", ""),
    ("egia", "rv", ""),
    ("ohia", "rv", ""),
    ("koia", "rv", ""),
    ("aria", "rv", ""),
    ("eria", "rv", ""),
    ("asia", "rv", ""),
    ("ezia", "rv", ""),
    ("joka", "", "jok"),
    ("gela", "rv", ""),
    ("tila", "rv", ""),
    ("kana", "rv", ""),
    ("kina", "rv", ""),
    ("mina", "rv", ""),
    ("duna", "rv", ""),
    ("ngoa", "rv", ""),
    ("zioa", "rv", ""),
    ("zkoa", "rv", ""),
    ("aroa", "rv", ""),
    ("eroa", "rv", ""),
    ("oroa", "rv", ""),
    ("osoa", "rv", ""),
    ("ttoa", "rv", ""),
    ("ztoa", "rv", ""),
    ("txoa", "rv", ""),
    ("tzoa", "rv", ""),
    ("dara", "rv", ""),
    ("tara", "rv", ""),
    ("bera", "rv", ""),
    ("kera", "rv", ""),
    ("pera", "rv", ""),
    ("keta", "rv", ""),
    ("tsua", "rv", ""),
    ("txua", "rv", ""),
    ("tzua", "rv", ""),
    ("gabe", "rv", ""),
    ("kabe", "rv", ""),
    ("kide", "rv", ""),
    ("alde", "rv", ""),
    ("orde", "rv", ""),
    ("zale", "rv", ""),
    ("gile", "rv", ""),
    ("kume", "rv", ""),
    ("gune", "rv", ""),
    ("kote", "rv", ""),
    ("arte", "rv", ""),
    ("oste", "rv", ""),
    ("etxe", "rv", ""),
    ("aldi", "rv", ""),
    ("degi", "rv", ""),
    ("tegi", "rv", ""),
    ("nahi", "rv", ""),
    ("toki", "rv", ""),
    ("kari", "rv", ""),
    ("lari", "rv", ""),
    ("tari", "rv", ""),
    ("duri", "rv", ""),
    ("kail", "rv", ""),
    ("etan", "rv", ""),
    ("tzen", "r1", ""),
    ("zain", "rv", ""),
    ("asun", "rv", ""),
    ("ondo", "rv", ""),
    ("tako", "rv", ""),
    ("tuko", "rv", ""),
    ("zino", "rv", ""),
    ("taro", "rv", ""),
    ("zaro", "rv", ""),
    ("giro", "rv", ""),
    ("liar", "rv", ""),
    ("tiar", "rv", ""),
    ("tzar", "rv", ""),
    ("ordu", "rv", ""),
    ("leku", "rv", ""),
    ("buru", "r2", ""),
    ("duru", "rv", ""),
    ("tatu", "r1", ""),
    ("estu", "rv", ""),
    ("eroz", "rv", ""),
    ("ada", "rv", ""),
    ("nea", "rv", ""),
    ("pea", "rv", ""),
    ("tea", "rv", ""),
    ("kia", "rv", ""),
    ("oia", "rv", ""),
    ("tia", "rv", ""),
    ("ska", "rv", ""),
    ("xka", "rv", ""),
    ("zka", "rv", ""),
    ("ola", "rv", ""),
    ("ena", "rv", ""),
    ("una", "rv", ""),
    ("koa", "rv", ""),
    ("noa", "rv", ""),
    ("toa", "rv", ""),
    ("ñoa", "rv", ""),
    ("ara", "rv", ""),
    ("ora", "r2", ""),
    ("tra", "rv", ""),
    ("osa", "rv", ""),
    ("eta", "rv", ""),
    ("sta", "rv", ""),
    ("dua", "rv", ""),
    ("tua", "rv", ""),
    ("zua", "rv", ""),
    ("eza", "rv", ""),
    ("tza", "r2", ""),
    ("eme", "rv", ""),
    ("une", "rv", ""),
    ("gai", "rv", ""),
    ("gei", "rv", ""),
    ("egi", "rv", ""),
    ("ohi", "rv", ""),
    ("goi", "rv", ""),
    ("koi", "rv", ""),
    ("ari", "rv", ""),
    ("asi", "rv", ""),
    ("ail", "rv", ""),
    ("kan", "rv", ""),
    ("tan", "rv", ""),
    ("ren", "r2", ""),
    ("ten", "r1", ""),
    ("kin", "rv", ""),
    ("min", "rv", ""),
    ("dun", "rv", ""),
    ("ngo", "rv", ""),
    ("zio", "rv", ""),
    ("eko", "rv", ""),
    ("sko", "rv", ""),
    ("zko", "rv", ""),
    ("aro", "rv", ""),
    ("ero", "rv", ""),
    ("oro", "rv", ""),
    ("oso", "rv", ""),
    ("tto", "rv", ""),
    ("zto", "rv", ""),
    ("txo", "rv", ""),
    ("tzo", "rv", ""),
    ("dar", "rv", ""),
    ("tar", "rv", ""),
    ("kor", "rv", ""),
    ("ket", "rv", ""),
    ("tsu", "rv", ""),
    ("txu", "rv", ""),
    ("tzu", "rv", ""),
    ("ga", "rv", ""),
    ("ka", "rv", ""),
    ("na", "rv", ""),
    ("ra", "rv", ""),
    ("sa", "rv", ""),
    ("ta", "rv", ""),
    ("za", "rv", ""),
    ("ge", "rv", ""),
    ("ne", "rv", ""),
    ("pe", "rv", ""),
    ("te", "rv", ""),
    ("di", "rv", ""),
    ("ki", "rv", ""),
    ("oi", "rv", ""),
    ("ti", "rv", ""),
    ("ñi", "rv", ""),
    ("ak", "rv", ""),
    ("ek", "rv", ""),
    ("en", "r1", ""),
    ("go", "rv", ""),
    ("ko", "rv", ""),
    ("no", "rv", ""),
    ("ro", "rv", ""),
    ("to", "rv", ""),
    ("ño", "rv", ""),
    ("zp", "rv", ""),
    ("ar", "rv", ""),
    ("or", "r2", ""),
    ("os", "rv", ""),
    ("du", "rv", ""),
    ("tu", "rv", ""),
    ("zu", "rv", ""),
    ("ez", "rv", ""),
    ("tz", "rv", ""),
    ("z", "rv", ""),
]

EU_ADJETIBOAK = [
    ("keria", "rv", ""),
    ("lanik", "rv", ""),
    ("larik", "rv", ""),
    ("zlea", "", "z"),
    ("dade", "rv", ""),
    ("tade", "rv", ""),
    ("date", "rv", ""),
    ("tate", "rv", ""),
    ("ztik", "rv", ""),
    ("era", "rv", ""),
    ("rik", "rv", ""),
    ("ero", "rv", ""),
    ("la", "rv", ""),
    ("gi", "rv", ""),
    ("ki", "rv", ""),
    ("ik", "rv", ""),
    ("go", "rv", ""),
    ("ro", "rv", ""),
    ("to", "rv", ""),
]


def _eu_regions(w: str) -> tuple[int, int, int]:
    """Spanish-style RV + standard R1/R2 (snowball mark_regions)."""
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in EU_VOWELS:
            if w[1] not in EU_VOWELS:
                i = 2
                while i < n and w[i] not in EU_VOWELS:
                    i += 1
                if i < n:
                    pv = i + 1
            else:
                i = 2
                while i < n and w[i] in EU_VOWELS:
                    i += 1
                if i < n:
                    pv = i + 1
        else:
            if w[1] not in EU_VOWELS:
                i = 2
                while i < n and w[i] not in EU_VOWELS:
                    i += 1
                if i < n:
                    pv = i + 1
            else:
                if n > 2:
                    pv = 3
    i = 0
    while i < n and w[i] not in EU_VOWELS:
        i += 1
    while i < n and w[i] in EU_VOWELS:
        i += 1
    p1 = p2 = n
    if i < n:
        p1 = i + 1
        i = p1
        while i < n and w[i] not in EU_VOWELS:
            i += 1
        while i < n and w[i] in EU_VOWELS:
            i += 1
        if i < n:
            p2 = i + 1
    return pv, p1, p2


def _eu_match(w: str, c: int, table):
    """Longest entry matching as a suffix of w[:c] (find_among_b with
    cursor c, limit_backward 0)."""
    for sfx, region, repl in table:
        s = c - len(sfx)
        if s >= 0 and w[s:c] == sfx:
            return s, region, repl
    return -1, "", ""


def _eu_loop(w: str, c: int, table, bounds) -> tuple[str, int]:
    while True:
        s, region, repl = _eu_match(w, c, table)
        if s < 0:
            return w, c
        if region:
            if s < bounds[region]:
                return w, c        # committed match, failed check
            w = w[:s] + w[c:]
        else:
            w = w[:s] + repl + w[c:]
        c = s


def basque_stem(w: str) -> str:
    pv, p1, p2 = _eu_regions(w)
    bounds = {"rv": pv, "r1": p1, "r2": p2}
    c = len(w)
    w, c = _eu_loop(w, c, EU_ADITZAK, bounds)
    w, c = _eu_loop(w, c, EU_IZENAK, bounds)
    s, region, repl = _eu_match(w, c, EU_ADJETIBOAK)
    if s >= 0:
        if region:
            if s >= bounds[region]:
                w = w[:s] + w[c:]
        else:
            w = w[:s] + repl + w[c:]
    return w


class BasqueAnalyzer(_RomanceAnalyzer):
    name = "basque"
    stop_words = BASQUE_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return basque_stem(tok)
