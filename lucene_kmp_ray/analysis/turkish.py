"""Turkish analysis chain (snowball TurkishStemmer, kmp semantics).

Reference chain (``/root/reference/analysis/common/.../tr/TurkishAnalyzer.kt``
createComponents): StandardTokenizer → ApostropheFilter (truncate at first
' or ’, ``tr/ApostropheFilter.kt``) → TurkishLowerCaseFilter (dotted/
dotless-i casing, ``tr/TurkishLowerCaseFilter.kt``) → StopFilter →
SnowballFilter(TurkishStemmer).

The stemmer is an exact port of the reference's generated snowball code
(``tartarus/snowball/ext/TurkishStemmer.kt``, Snowball 2.2.0): backward
suffix marking with vowel-harmony checks, nominal-verb then noun suffix
phases, the recursive ki-chain, and the postlude (reserved words ad/soyad,
append-U after d/g, final-consonant devoicing). Two load-bearing snowball
semantics mirrored exactly:

- ``slice_del`` is IRREVERSIBLE: a failed condition after a deletion only
  restores the cursor (end-relative), never the text — so e.g. a 'lar'
  strip inside the ki chain persists even when the chained recursion
  fails. All deletions in this port are applied the moment the kt code
  calls slice_del.
- ``stem()`` returning false (fewer than two syllables, reserved word, or
  the continue_stemming flag cleared by the lAr nominal-verb branch)
  means SnowballFilter keeps the ORIGINAL token, even though the internal
  buffer was modified.

The oracle mirror (``oracle.bm25_turkish_topk``) GENERATES the same logic
as staged-CTE SQL from the same suffix tables (see oracle._tr_stem_ctes).
Vectors from TestTurkishAnalyzer.kt in tests/test_turkish_analyzer.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TURKISH_STOP_WORDS = frozenset("""
acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben benden
beni benim beri beş bile bin bir birçok biri birkaç birkez birşey birşeyi biz
bize bizden bizi bizim böyle böylece bu buna bunda bundan bunlar bunları
bunların bunu bunun burada çok çünkü da daha dahi de defa değil diğer diye
doksan dokuz dolayı dolayısıyla dört edecek eden ederek edilecek ediliyor
edilmesi ediyor eğer elli en etmesi etti ettiği ettiğini gibi göre halen
hangi hatta hem henüz hep hepsi her herhangi herkesin hiç hiçbir için iki ile
ilgili ise işte itibaren itibariyle kadar karşın katrilyon kendi kendilerine
kendini kendisi kendisine kendisini kez ki kim kimden kime kimi kimse kırk
milyar milyon mu mü mı nasıl ne neden nedenle nerde nerede nereye niye niçin
o olan olarak oldu olduğu olduğunu olduklarını olmadı olmadığı olmak olması
olmayan olmaz olsa olsun olup olur olursa oluyor on ona ondan onlar onlardan
onları onların onu onun otuz oysa öyle pek rağmen sadece sanki sekiz seksen
sen senden seni senin siz sizden sizi sizin şey şeyden şeyi şeyler şöyle şu
şuna şunda şundan şunları şunu tarafından trilyon tüm üç üzere var vardı ve
veya ya yani yapacak yapılan yapılması yapıyor yapmak yaptı yaptığı yaptığını
yaptıkları yedi yerine yetmiş yine yirmi yoksa yüz zaten
""".split())

VOWEL = frozenset("aeıioöuü")
G_U = frozenset("ıiuü")
V1 = frozenset("aıou")   # harmony class of a
V2 = frozenset("eiöü")   # harmony class of e
V3 = frozenset("aı")     # harmony class of ı
V4 = frozenset("ei")     # harmony class of i
V5 = frozenset("ou")     # harmony class of o and u
V6 = frozenset("öü")     # harmony class of ö and ü
HARMONY = {"a": V1, "e": V2, "ı": V3, "i": V4,
           "o": V5, "ö": V6, "u": V5, "ü": V6}

# among tables (TurkishStemmer.kt a_0..a_23) — find_among_b = longest wins
A_POSS = ("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız")
A_LARI = ("leri", "ları")
A_NU = ("ni", "nu", "nü", "nı")
A_NUN = ("in", "un", "ün", "ın")
A_YA = ("a", "e")
A_NA = ("na", "ne")
A_DA = ("da", "ta", "de", "te")
A_NDA = ("nda", "nde")
A_DAN = ("dan", "tan", "den", "ten")
A_NDAN = ("ndan", "nden")
A_YLA = ("la", "le")
A_NCA = ("ca", "ce")
A_YUM = ("im", "um", "üm", "ım")
A_SUN = ("sin", "sun", "sün", "sın")
A_YUZ = ("iz", "uz", "üz", "ız")
A_SUNUZ = ("siniz", "sunuz", "sünüz", "sınız")
A_LAR = ("lar", "ler")
A_NUZ = ("niz", "nuz", "nüz", "nız")
A_DUR = ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
A_CASINA = ("casına", "cesine")
A_YDU = ("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
         "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
         "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
         "du", "tu", "dü", "tü", "dı", "tı")
A_YSA = ("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
A_YMUS = ("miş", "muş", "müş", "mış")


class _T:
    """Backward-cursor snowball word state. Saves/restores are
    END-relative (``limit - cursor``) exactly as in the generated kt —
    this is what keeps restore points valid across slice_del, which
    shrinks the string between cursor and the old end."""

    __slots__ = ("w", "c", "ket")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)

    # -- save/restore (end-relative) --
    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.w) - v

    # -- backward primitives (limit_backward is always 0 here) --
    def eq_s_b(self, s: str) -> bool:
        if self.c < len(s) or self.w[self.c - len(s):self.c] != s:
            return False
        self.c -= len(s)
        return True

    def in_b(self, group) -> bool:
        if self.c <= 0 or self.w[self.c - 1] not in group:
            return False
        self.c -= 1
        return True

    def out_b(self, group) -> bool:
        if self.c <= 0 or self.w[self.c - 1] in group:
            return False
        self.c -= 1
        return True

    def among_b(self, words) -> bool:
        best = ""
        for s in words:
            if len(s) > len(best) and self.c >= len(s) and \
                    self.w.endswith(s, 0, self.c):
                best = s
        if not best:
            return False
        self.c -= len(best)
        return True

    def goto_b(self, group) -> bool:
        """gopast backward: move cursor until char at c-1 ∈ group (cursor
        NOT consumed past it); False when exhausted."""
        while True:
            if self.c > 0 and self.w[self.c - 1] in group:
                return True
            if self.c <= 0:
                return False
            self.c -= 1

    def slice_del(self) -> None:
        self.w = self.w[:self.c] + self.w[self.ket:]
        self.ket = self.c

    def set_ket(self) -> None:
        self.ket = self.c


def _harmony(t: _T) -> bool:
    """r_check_vowel_harmony: last vowel's harmony class must occur again
    somewhere before it. Pure test (cursor restored)."""
    v1 = t.save()
    if not t.goto_b(VOWEL):
        t.restore(v1)
        return False
    last = t.w[t.c - 1]
    t.c -= 1  # eq_s_b(last vowel)
    ok = t.goto_b(HARMONY[last])
    t.restore(v1)
    return ok


def _opt_cons(t: _T, ch: str) -> bool:
    """mark_suffix_with_optional_{y,n,s}_consonant: consume ch when it is
    preceded by a vowel; fail when present otherwise; when absent,
    require the char two back to be a vowel (no consumption)."""
    v1 = t.save()
    if t.eq_s_b(ch):
        v2 = t.save()
        if t.in_b(VOWEL):
            t.restore(v2)
            return True
        t.restore(v1)
        return False
    t.restore(v1)
    if t.c <= 0:
        return False
    t.c -= 1
    ok = t.c > 0 and t.w[t.c - 1] in VOWEL
    t.c += 1
    return ok


def _opt_U(t: _T) -> bool:
    """mark_suffix_with_optional_U_vowel: consume a U vowel preceded by a
    NON-vowel; fail when a U is preceded by a vowel; when absent, require
    the char two back to be a non-vowel."""
    v1 = t.save()
    if t.in_b(G_U):
        v2 = t.save()
        if t.out_b(VOWEL):
            t.restore(v2)
            return True
        t.restore(v1)
        return False
    t.restore(v1)
    if t.c <= 0:
        return False
    t.c -= 1
    ok = t.c > 0 and t.w[t.c - 1] not in VOWEL
    t.c += 1
    return ok


# ---- mark routines: match backward from cursor, True moves the cursor ----
def _m_poss(t):
    return t.among_b(A_POSS) and _opt_U(t)


def _m_sU(t):
    return _harmony(t) and t.in_b(G_U) and _opt_cons(t, "s")


def _m_lArI(t):
    return t.among_b(A_LARI)


def _m_yU(t):
    return _harmony(t) and t.in_b(G_U) and _opt_cons(t, "y")


def _m_nU(t):
    return _harmony(t) and t.among_b(A_NU)


def _m_nUn(t):
    return _harmony(t) and t.among_b(A_NUN) and _opt_cons(t, "n")


def _m_yA(t):
    return _harmony(t) and t.among_b(A_YA) and _opt_cons(t, "y")


def _m_nA(t):
    return _harmony(t) and t.among_b(A_NA)


def _m_DA(t):
    return _harmony(t) and t.among_b(A_DA)


def _m_ndA(t):
    return _harmony(t) and t.among_b(A_NDA)


def _m_DAn(t):
    return _harmony(t) and t.among_b(A_DAN)


def _m_ndAn(t):
    return _harmony(t) and t.among_b(A_NDAN)


def _m_ylA(t):
    return _harmony(t) and t.among_b(A_YLA) and _opt_cons(t, "y")


def _m_ki(t):
    return t.eq_s_b("ki")


def _m_ncA(t):
    return _harmony(t) and t.among_b(A_NCA) and _opt_cons(t, "n")


def _m_yUm(t):
    return _harmony(t) and t.among_b(A_YUM) and _opt_cons(t, "y")


def _m_sUn(t):
    return _harmony(t) and t.among_b(A_SUN)


def _m_yUz(t):
    return _harmony(t) and t.among_b(A_YUZ) and _opt_cons(t, "y")


def _m_sUnUz(t):
    return t.among_b(A_SUNUZ)


def _m_lAr(t):
    return _harmony(t) and t.among_b(A_LAR)


def _m_nUz(t):
    return _harmony(t) and t.among_b(A_NUZ)


def _m_DUr(t):
    return _harmony(t) and t.among_b(A_DUR)


def _m_cAsInA(t):
    return t.among_b(A_CASINA)


def _m_yDU(t):
    return _harmony(t) and t.among_b(A_YDU) and _opt_cons(t, "y")


def _m_ysA(t):
    return t.among_b(A_YSA) and _opt_cons(t, "y")


def _m_ymUs(t):
    return _harmony(t) and t.among_b(A_YMUS) and _opt_cons(t, "y")


def _m_yken(t):
    return t.eq_s_b("ken") and _opt_cons(t, "y")


def _first(t: _T, *marks) -> bool:
    """or-chain of marks with cursor restore between alternatives."""
    v = t.save()
    for m in marks:
        if m(t):
            return True
        t.restore(v)
    return False


def _stem_nominal_verb_suffixes(t: _T) -> tuple[bool, bool]:
    """Returns (matched, continue_stemming_noun_suffixes)."""
    t.set_ket()
    v1 = t.save()
    # alt 1: ymUs_ | yDU | ysA | yken
    if _first(t, _m_ymUs, _m_yDU, _m_ysA, _m_yken):
        t.slice_del()
        return True, True
    t.restore(v1)
    # alt 2: cAsInA [sUnUz|lAr|yUm|sUn|yUz] ymUs_
    if _m_cAsInA(t):
        _first(t, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        if _m_ymUs(t):
            t.slice_del()
            return True, True
    t.restore(v1)
    # alt 3: lAr ; delete ; try [DUr|yDU|ysA|ymUs_] ; flag = False
    if _m_lAr(t):
        t.slice_del()
        v4 = t.save()
        t.set_ket()
        if _first(t, _m_DUr, _m_yDU, _m_ysA, _m_ymUs):
            t.slice_del()
        else:
            t.restore(v4)
            t.slice_del()  # empty (ket == cursor)
        return True, False
    t.restore(v1)
    # alt 4: nUz (yDU | ysA)
    if _m_nUz(t) and _first(t, _m_yDU, _m_ysA):
        t.slice_del()
        return True, True
    t.restore(v1)
    # alt 5: [sUnUz|yUz|sUn|yUm] ; delete ; try ymUs_
    if _first(t, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
        t.slice_del()
        v8 = t.save()
        t.set_ket()
        if not _m_ymUs(t):
            t.restore(v8)
        t.slice_del()
        return True, True
    t.restore(v1)
    # alt 6: DUr ; delete ; try ([sUnUz|lAr|yUm|sUn|yUz|ε] ymUs_)
    if _m_DUr(t):
        t.slice_del()
        v9 = t.save()
        t.set_ket()
        _first(t, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)  # optional
        if not _m_ymUs(t):
            t.restore(v9)
        t.slice_del()
        return True, True
    return False, True


def _ki_chain(t: _T) -> bool:
    """r_stem_suffix_chain_before_ki (recursive). Deletions persist;
    failed sub-recursions only restore the cursor."""
    t.set_ket()
    if not _m_ki(t):
        return False
    v1 = t.save()
    # branch A: DA
    if _m_DA(t):
        t.slice_del()
        v2 = t.save()
        t.set_ket()
        if _m_lAr(t):
            t.slice_del()
            v4 = t.save()
            if not _ki_chain(t):
                t.restore(v4)
        elif not _m_poss(t):
            t.restore(v2)
        else:
            t.slice_del()
            v5 = t.save()
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                if not _ki_chain(t):
                    t.restore(v5)
            else:
                t.restore(v5)
        return True
    t.restore(v1)
    # branch B: nUn
    if _m_nUn(t):
        t.slice_del()
        v6 = t.save()
        t.set_ket()
        if _m_lArI(t):
            t.slice_del()
        else:
            t.restore(v6)
            t.set_ket()
            if _first(t, _m_poss, _m_sU):
                t.slice_del()
                v9 = t.save()
                t.set_ket()
                if _m_lAr(t):
                    t.slice_del()
                    if not _ki_chain(t):
                        t.restore(v9)
                else:
                    t.restore(v9)
            else:
                t.restore(v6)
                if not _ki_chain(t):
                    t.restore(v6)
        return True
    t.restore(v1)
    # branch C: ndA (no immediate delete; sub-branches slice to outer ket)
    if _m_ndA(t):
        v10 = t.save()
        if _m_lArI(t):
            t.slice_del()
            return True
        t.restore(v10)
        if _m_sU(t):
            t.slice_del()
            v11 = t.save()
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                if not _ki_chain(t):
                    t.restore(v11)
            else:
                t.restore(v11)
            return True
        t.restore(v10)
        if _ki_chain(t):
            return True
    return False


def _stem_noun_suffixes(t: _T) -> bool:
    v1 = t.save()
    # NS1: lAr ; delete ; try ki
    t.set_ket()
    if _m_lAr(t):
        t.slice_del()
        v2 = t.save()
        if not _ki_chain(t):
            t.restore(v2)
        return True
    t.restore(v1)
    # NS2: ncA ; delete ; try ( lArI | [poss|sU] (lAr ki?) | lAr ki-req )
    t.set_ket()
    if _m_ncA(t):
        t.slice_del()
        v3 = t.save()
        t.set_ket()
        if _m_lArI(t):
            t.slice_del()
        else:
            t.restore(v3)
            t.set_ket()
            if _first(t, _m_poss, _m_sU):
                t.slice_del()
                v6 = t.save()
                t.set_ket()
                if _m_lAr(t):
                    t.slice_del()
                    if not _ki_chain(t):
                        t.restore(v6)
                else:
                    t.restore(v6)
            else:
                t.restore(v3)
                t.set_ket()
                if _m_lAr(t):
                    t.slice_del()
                    if not _ki_chain(t):
                        t.restore(v3)
                else:
                    t.restore(v3)
        return True
    t.restore(v1)
    # NS3: (ndA|nA) ( lArI del | sU del (lAr ki?) | ki )
    t.set_ket()
    if _first(t, _m_ndA, _m_nA):
        v8 = t.save()
        if _m_lArI(t):
            t.slice_del()
            return True
        t.restore(v8)
        if _m_sU(t):
            t.slice_del()
            v9 = t.save()
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                if not _ki_chain(t):
                    t.restore(v9)
            else:
                t.restore(v9)
            return True
        t.restore(v8)
        if _ki_chain(t):
            return True
    t.restore(v1)
    # NS4: (ndAn|nU) ( sU del (lAr ki?) | lArI mark-only )
    t.set_ket()
    if _first(t, _m_ndAn, _m_nU):
        v11 = t.save()
        if _m_sU(t):
            t.slice_del()
            v12 = t.save()
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                if not _ki_chain(t):
                    t.restore(v12)
            else:
                t.restore(v12)
            return True
        t.restore(v11)
        if _m_lArI(t):
            return True  # marked, NOT deleted (kt lab18: no slice)
    t.restore(v1)
    # NS5: DAn ; delete ; try ( poss del (lAr ki?) | lAr del ki? | ki )
    t.set_ket()
    if _m_DAn(t):
        t.slice_del()
        v13 = t.save()
        t.set_ket()
        if _m_poss(t):
            t.slice_del()
            v15 = t.save()
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                if not _ki_chain(t):
                    t.restore(v15)
            else:
                t.restore(v15)
        else:
            t.restore(v13)
            t.set_ket()
            if _m_lAr(t):
                t.slice_del()
                v16 = t.save()
                if not _ki_chain(t):
                    t.restore(v16)
            else:
                t.restore(v13)
                if not _ki_chain(t):
                    t.restore(v13)
        return True
    t.restore(v1)
    # NS6: (nUn|ylA) ; delete ; try ( lAr ki-req | [poss|sU] (lAr ki?) | ki )
    t.set_ket()
    if _first(t, _m_nUn, _m_ylA):
        t.slice_del()
        v18 = t.save()
        done = False
        t.set_ket()
        if _m_lAr(t):
            t.slice_del()
            if _ki_chain(t):
                done = True
            # kt lab36: failed ki → restore v_19 and try next alternative
            # (the lAr deletion persists)
            if not done:
                t.restore(v18)
        if not done:
            t.set_ket()
            if _first(t, _m_poss, _m_sU):
                t.slice_del()
                v21 = t.save()
                t.set_ket()
                if _m_lAr(t):
                    t.slice_del()
                    if not _ki_chain(t):
                        t.restore(v21)
                else:
                    t.restore(v21)
            else:
                t.restore(v18)
                if not _ki_chain(t):
                    t.restore(v18)
        return True
    t.restore(v1)
    # NS7: lArI ; delete
    t.set_ket()
    if _m_lArI(t):
        t.slice_del()
        return True
    t.restore(v1)
    # NS8: ki chain directly
    if _ki_chain(t):
        return True
    t.restore(v1)
    # NS9: (DA|yU|yA) ; delete ; try ( [poss [lAr]] | lAr ; delete ; ki-req )
    t.set_ket()
    if _first(t, _m_DA, _m_yU, _m_yA):
        t.slice_del()
        v23 = t.save()
        t.set_ket()
        matched = False
        if _m_poss(t):
            t.slice_del()
            v25 = t.save()
            t.set_ket()
            if not _m_lAr(t):
                t.restore(v25)
            matched = True
        else:
            t.restore(v23)
            t.set_ket()
            matched = _m_lAr(t)
        if matched:
            t.slice_del()
            t.set_ket()
            if not _ki_chain(t):
                t.restore(v23)
        else:
            t.restore(v23)
        return True
    t.restore(v1)
    # NS10: (poss|sU) ; delete ; try ( lAr ; delete ; ki-req )
    t.set_ket()
    if _first(t, _m_poss, _m_sU):
        t.slice_del()
        v27 = t.save()
        t.set_ket()
        if _m_lAr(t):
            t.slice_del()
            if not _ki_chain(t):
                t.restore(v27)
        else:
            t.restore(v27)
        return True
    return False


def _post_process_last_consonants(t: _T) -> None:
    t.set_ket()
    repl = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if t.c > 0 and t.w[t.c - 1] in repl:
        ch = t.w[t.c - 1]
        t.w = t.w[:t.c - 1] + repl[ch] + t.w[t.c:]


def _append_U(t: _T) -> None:
    if t.c == 0 or t.w[t.c - 1] not in "dg":
        return
    v = t.save()
    if not t.goto_b(VOWEL):
        t.restore(v)
        return
    last = t.w[t.c - 1]
    t.restore(v)
    app = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
           "o": "u", "u": "u", "ö": "ü", "ü": "ü"}.get(last)
    if app:
        t.w = t.w + app
        t.c = len(t.w)


def turkish_stem(word: str) -> str:
    """SnowballFilter(TurkishStemmer) semantics: returns the stem, or the
    ORIGINAL word whenever the kt stem() would return false."""
    if sum(1 for ch in word if ch in VOWEL) < 2:
        return word
    t = _T(word)
    _, cont = _stem_nominal_verb_suffixes(t)
    if not cont:
        return word
    t.c = len(t.w)
    _stem_noun_suffixes(t)
    # postlude (backward from the full current word)
    t.c = len(t.w)
    if t.w in ("ad", "soyad"):  # r_is_reserved_word → stem() false
        return word
    _append_U(t)
    t.c = len(t.w)
    _post_process_last_consonants(t)
    return t.w


def turkish_lower(tok: str) -> str:
    """TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.kt): I → ı unless
    followed by COMBINING DOT ABOVE (→ i, dot removed); a combining dot
    above following an I-context is removed; everything else simple
    lowercase. İ (U+0130) lowercases to i + combining dot in the simple
    mapping, which this filter then strips back to plain i."""
    out = []
    i_or_after = False
    import unicodedata
    for ch in tok:
        if ch == "I":
            i_or_after = True
            # lookahead: combining dot above, possibly behind other marks
            # (handled by emitting ı now; a later ̇ flips it to i)
            out.append("ı")
            continue
        if i_or_after and unicodedata.category(ch) == "Mn":
            if ch == "̇":
                # the dot decides the pending I (other marks may sit
                # between, kt isBeforeDot lookahead): flip it, drop dot
                j = len(out) - 1
                while j >= 0 and unicodedata.category(out[j]) == "Mn":
                    j -= 1
                if j >= 0 and out[j] == "ı":
                    out[j] = "i"
                continue  # dot removed
            out.append(ch)
            continue
        i_or_after = False
        low = ch.lower()
        if low == "i̇":  # İ simple-lowercases to i + dot above
            low = "i"
            i_or_after = False
        out.append(low)
    return "".join(out)


def apostrophe(tok: str) -> str:
    """ApostropheFilter: truncate at the first ' or ’."""
    for i, ch in enumerate(tok):
        if ch in "'’":
            return tok[:i]
    return tok


class TurkishAnalyzer:
    """Raw-case tokens → apostrophe truncate → Turkish lowercase → stop →
    snowball Turkish stem (TurkishAnalyzer.kt:322-331)."""

    name = "turkish"
    stop_words = TURKISH_STOP_WORDS

    def __init__(self):
        self.stop_set = frozenset(self.stop_words)
        self.stop = sorted(self.stop_set)

    def _pre(self, tok: str) -> str:
        return turkish_lower(apostrophe(tok))

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize_flat
        _, flat = tokenize_flat([text], lower=False)
        out = []
        for raw in flat.to_pylist():
            tok = self._pre(raw)
            if tok and tok not in self.stop_set:
                out.append(turkish_stem(tok))
        return out

    def analyze_flat(self, texts):
        import pyarrow.compute as pc

        from .standard import tokenize_flat
        doc_lengths, flat = tokenize_flat(texts, lower=False)
        doc_of = np.repeat(np.arange(len(doc_lengths), dtype=np.int64),
                           doc_lengths)
        starts = np.append(0, np.cumsum(doc_lengths))[:-1]
        positions = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, doc_lengths)
        if len(flat) == 0:
            return doc_lengths, flat, doc_of, positions
        # apostrophe + Turkish lowercase per unique raw token
        dict_arr = flat.dictionary_encode()
        pre = pa.array([self._pre(s) for s in
                        dict_arr.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict_arr.indices, pre) \
            .cast(pa.string())
        # stop + empty drop
        keep = pc.and_(
            pc.invert(pc.is_in(flat, value_set=pa.array(self.stop,
                                                        pa.string()))),
            pc.greater(pc.utf8_length(flat), 0))
        mask = keep.to_numpy(zero_copy_only=False)
        flat, doc_of, positions = flat.filter(keep), doc_of[mask], \
            positions[mask]
        norm_lengths = np.bincount(doc_of, minlength=len(doc_lengths)) \
            .astype(np.int64)
        # stem per unique
        dict2 = flat.dictionary_encode()
        stemmed = pa.array([turkish_stem(s) for s in
                            dict2.dictionary.to_pylist()], pa.string())
        flat = pa.DictionaryArray.from_arrays(dict2.indices, stemmed) \
            .cast(pa.string())
        return norm_lengths, flat, doc_of, positions
