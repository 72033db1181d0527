"""Indonesian analysis chain (Tala stemmer).

Reference chain (``/root/reference/analysis/common/.../id/IndonesianAnalyzer.kt``):
StandardTokenizer → LowerCase → StopFilter → IndonesianStemFilter
(derivational stemming on by default).

The stemmer (``id/IndonesianStemmer.kt``; Tala, "A Study of Stemming
Effects on Information Retrieval in Bahasa Indonesia") is stateful:

1. inflectional particle (kah/lah/pun) and possessive pronoun
   (ku/mu/nya) removal, each gated on >2 remaining syllables (vowel
   count, decremented per removal);
2. derivational: first-order prefix (meng/meny→s/men/mem/me,
   peng/peny→s/pen→t/pen/pem, di, ter, ke — recording WHICH family was
   removed), then — only if that changed the word — suffix
   (kan/an/i, each blocked by specific removed-prefix flags) and, only
   if the suffix changed it, second-order prefix (ber/belajar/beCer,
   per/pelajar/pe); if no first-order prefix was removed the order is
   second-order prefix first, then suffix.

The oracle mirror (``oracle.bm25_indonesian_topk``) expresses the same
state machine as staged CTE columns (branch-code CASEs carrying the
flag set and syllable count), GENERATED from the same rules.
Conformance vectors from TestIndonesianStemmer.kt (both modes) live in
tests/test_indonesian_analyzer.py.
"""

from __future__ import annotations

from .romance import _RomanceAnalyzer

INDONESIAN_STOP_WORDS = frozenset("""
ada adanya adalah adapun agak agaknya agar akan akankah akhirnya aku
akulah amat amatlah anda andalah antar diantaranya antara antaranya
diantara apa apaan mengapa apabila apakah apalagi apatah atau ataukah
ataupun bagai bagaikan sebagai sebagainya bagaimana bagaimanapun
sebagaimana bagaimanakah bagi bahkan bahwa bahwasanya sebaliknya
banyak sebanyak beberapa seberapa begini beginian beginikah beginilah
sebegini begitu begitukah begitulah begitupun sebegitu belum belumlah
sebelum sebelumnya sebenarnya berapa berapakah berapalah berapapun
betulkah sebetulnya biasa biasanya bila bilakah bisa bisakah sebisanya
boleh bolehkah bolehlah buat bukan bukankah bukanlah bukannya cuma
percuma dahulu dalam dan dapat dari daripada dekat demi demikian
demikianlah sedemikian dengan depan di dia dialah dini diri dirinya
terdiri dong dulu enggak enggaknya entah entahlah terhadap terhadapnya
hal hampir hanya hanyalah harus haruslah harusnya seharusnya hendak
hendaklah hendaknya hingga sehingga ia ialah ibarat ingin inginkah
inginkan ini inikah inilah itu itukah itulah jangan jangankan
janganlah jika jikalau juga justru kala kalau kalaulah kalaupun kalian
kami kamilah kamu kamulah kan kapan kapankah kapanpun dikarenakan
karena karenanya ke kecil kemudian kenapa kepada kepadanya ketika
seketika khususnya kini kinilah kiranya sekiranya kita kitalah kok
lagi lagian selagi lah lain lainnya melainkan selaku lalu melalui
terlalu lama lamanya selama selamanya lebih terlebih bermacam macam
semacam maka makanya makin malah malahan mampu mampukah mana manakala
manalagi masih masihkah semasih masing mau maupun semaunya memang
mereka merekalah meski meskipun semula mungkin mungkinkah nah namun
nanti nantinya nyaris oleh olehnya seorang seseorang pada padanya
padahal paling sepanjang pantas sepantasnya sepantasnyalah para pasti
pastilah per pernah pula pun merupakan rupanya serupa saat saatnya
sesaat saja sajalah saling bersama sama sesama sambil sampai sana
sangat sangatlah saya sayalah se sebab sebabnya sebuah tersebut
tersebutlah sedang sedangkan sedikit sedikitnya segala segalanya
segera sesegera sejak sejenak sekali sekalian sekalipun sesekali
sekaligus sekarang sekitar sekitarnya sela selain selalu seluruh
seluruhnya semakin sementara sempat semua semuanya sendiri sendirinya
seolah seperti sepertinya sering seringnya serta siapa siapakah
siapapun disini disinilah sini sinilah sesuatu sesuatunya suatu
sesudah sesudahnya sudah sudahkah sudahlah supaya tadi tadinya tak
tanpa setelah telah tentang tentu tentulah tentunya tertentu
seterusnya tapi tetapi setiap tiap setidaknya tidak tidakkah tidaklah
toh waduh wah wahai sewaktu walau walaupun wong yaitu yakni yang
""".split())

ID_VOWELS = frozenset("aeiou")

# removed-prefix flags
KE, PENG, DI, MENG, TER, BER, PE = 1, 2, 4, 8, 16, 32, 64


def _fo_prefix(w: str, nsyl: int, flags: int):
    """removeFirstOrderPrefix — first match in table order."""
    if w.startswith("meng"):
        return w[4:], nsyl - 1, flags | MENG
    if w.startswith("meny") and len(w) > 4 and w[4] in ID_VOWELS:
        return "s" + w[4:], nsyl - 1, flags | MENG
    if w.startswith("men"):
        return w[3:], nsyl - 1, flags | MENG
    if w.startswith("mem"):
        return w[3:], nsyl - 1, flags | MENG
    if w.startswith("me"):
        return w[2:], nsyl - 1, flags | MENG
    if w.startswith("peng"):
        return w[4:], nsyl - 1, flags | PENG
    if w.startswith("peny") and len(w) > 4 and w[4] in ID_VOWELS:
        return "s" + w[4:], nsyl - 1, flags | PENG
    if w.startswith("peny"):
        return w[4:], nsyl - 1, flags | PENG
    if w.startswith("pen") and len(w) > 3 and w[3] in ID_VOWELS:
        return "t" + w[3:], nsyl - 1, flags | PENG
    if w.startswith("pen"):
        return w[3:], nsyl - 1, flags | PENG
    if w.startswith("pem"):
        return w[3:], nsyl - 1, flags | PENG
    if w.startswith("di"):
        return w[2:], nsyl - 1, flags | DI
    if w.startswith("ter"):
        return w[3:], nsyl - 1, flags | TER
    if w.startswith("ke"):
        return w[2:], nsyl - 1, flags | KE
    return w, nsyl, flags


def _so_prefix(w: str, nsyl: int, flags: int):
    """removeSecondOrderPrefix."""
    if w.startswith("ber"):
        return w[3:], nsyl - 1, flags | BER
    if w == "belajar":
        return w[3:], nsyl - 1, flags | BER
    if (w.startswith("be") and len(w) > 4 and w[2] not in ID_VOWELS
            and w[3] == "e" and w[4] == "r"):
        return w[2:], nsyl - 1, flags | BER
    if w.startswith("per"):
        return w[3:], nsyl - 1, flags
    if w == "pelajar":
        return w[3:], nsyl - 1, flags
    if w.startswith("pe"):
        return w[2:], nsyl - 1, flags | PE
    return w, nsyl, flags


def _suffix(w: str, nsyl: int, flags: int):
    """removeSuffix — each blocked by specific prefix-removal flags."""
    if w.endswith("kan") and not flags & (KE | PENG | PE):
        return w[:-3], nsyl - 1
    if w.endswith("an") and not flags & (DI | MENG | TER):
        return w[:-2], nsyl - 1
    if (w.endswith("i") and not w.endswith("si")
            and not flags & (BER | KE | PENG)):
        return w[:-1], nsyl - 1
    return w, nsyl


def indonesian_stem(w: str, derivational: bool = True) -> str:
    nsyl = sum(1 for c in w if c in ID_VOWELS)
    flags = 0
    if nsyl > 2 and w.endswith(("kah", "lah", "pun")):
        nsyl -= 1
        w = w[:-3]
    if nsyl > 2:
        if w.endswith(("ku", "mu")):
            nsyl -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            nsyl -= 1
            w = w[:-3]
    if not derivational:
        return w
    old = w
    if nsyl > 2:
        w, nsyl, flags = _fo_prefix(w, nsyl, flags)
    if w != old:
        old = w
        if nsyl > 2:
            w, nsyl = _suffix(w, nsyl, flags)
        if w != old:
            if nsyl > 2:
                w, nsyl, flags = _so_prefix(w, nsyl, flags)
    else:
        if nsyl > 2:
            w, nsyl, flags = _so_prefix(w, nsyl, flags)
        if nsyl > 2:
            w, nsyl = _suffix(w, nsyl, flags)
    return w


class IndonesianAnalyzer(_RomanceAnalyzer):
    name = "indonesian"
    stop_words = INDONESIAN_STOP_WORDS

    def _stem(self, tok: str) -> str:
        return indonesian_stem(tok)
