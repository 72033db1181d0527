"""Javanese / Sundanese / Malay analysis chains.

Reference chains (``/root/reference/analysis/extra/.../{jv,su,ms}/``):
StandardTokenizer → LowerCase → DecimalDigit → <Lang>Normalization
(the shared Latin fold) → Stop → <Lang>StemFilter.

- Javanese: nasal prefixes FIRST (ny→s…, ng-, n→t…, m→p…), then the
  regular prefix list, then the suffix list TWICE;
- Sundanese: regular prefixes first, then the nasal rewrites, then
  one suffix pass;
- Malay (``ms/MalayStemmer.kt``): the Tala-style syllable-counted
  pipeline, like the repo's IndonesianAnalyzer but with the Malay
  branch set — men/mem before a vowel rewrite to t…/p…, peny without
  a following vowel strips whole, and the same flag-blocked suffixes
  (kan unless ke/peng/pe was removed, an unless di/meng/ter,
  i unless …si/ber/ke/peng).

SQL mirrors via ``oracle.bm25_extra_topk`` (jv/su) and
``oracle.bm25_malay_topk``; vectors from the reference's
Test*Analyzer.kt suites live in tests/test_sea_analyzers.py.
"""

from __future__ import annotations

from .african import _LATIN_CORE, _ExtraAnalyzer

JAVANESE_STOP_WORDS = frozenset("""
ana aku kula sampeyan dheweke iki iku kuwi yaiku lan utawa ing karo
saka kanggo menyang nanging amarga yen nalika dadi bakal arep ora
dudu durung bisa saget kudu mesti mung banget luwih akeh kabeh kabèh
saben saiki biyen banjur nganti teka kaya kepiye apa sapa napa pira
pinten endi kene kono kene ngarep ngisor cedhak adoh anyar apik
bener cukup pungkasan wiwitane mula mangkono tuladhane babagan
antarane bagean prakara cara dina wulan taun wektu ujar ngomong
takon menehi digunakake rampung miwiti ditambahake disebut
disebutake dituduhake dibutuhake
""".split())

SUNDANESE_STOP_WORDS = frozenset("""
abdi acan aing anu antara aranjeunna atawa aya ayana ayeuna baheula
bakal bari cekap cisa dina di dua duanana éta geus hadé handap
hartina hartosna hayang hayu henteu hiji hoyong hungkul ieu iraha
jadi janten jeung jumlah ka kadua kami kana kaayaan kahayang kali
kieu kinilah kitu komo ku kumaha kukituna kuduna kedah kudu kuring
lamun leutik leres loba mampuh margi anjeunna manehna maranéhna
masalah masing-masing mastikeun métode metode mimiti mimitina na
naha naon ngajadikeun ngadamel ngalakukeun ngomong ngarasa ngeunaan
ngingetkeun ngingetan ngomong ngajelaskeun ngajawabna ngan ogé oké
opat paling pasihan penting pisan pikeun punten rada rasa rék réngsé
sabab sababaraha sakali sakumaha salaku sami sanajan sanes sangkan
sarta saterusna sia siga sigana teh teu teras tibatan tina tujuanna
tuh tungtung tungtungna upami urang wangsit waktosna anjeunna
""".split())

MALAY_STOP_WORDS = frozenset("""
abdul abdullah acara ada adalah ahmad air akan akhbar akhir aktiviti
alam amat amerika anak anggota antara antarabangsa apa apabila april
as asas asean asia asing atas atau australia awal awam bagaimanapun
bagi bahagian bahan baharu bahawa baik bandar bank banyak barangan
baru baru-baru bawah beberapa bekas beliau belum berada berakhir
berbanding berdasarkan berharap berikutan berjaya berjumlah
berkaitan berkata berkenaan berlaku bermula bernama bernilai bersama
berubah besar bhd bidang bilion bn boleh bukan bulan bursa cadangan
china dagangan dalam dan dana dapat dari daripada dasar datang datuk
demikian dengan depan derivatives dewan di diadakan dibuka
dicatatkan dijangka diniagakan dis disember ditutup dolar dr dua
dunia ekonomi eksekutif eksport empat enam faedah feb global hadapan
hanya harga hari hasil hingga hubungan ia iaitu ialah indeks india
indonesia industri ini islam isnin isu itu jabatan jalan jan jawatan
jawatankuasa jepun jika jualan juga julai jumaat jumlah jun juta
kadar kalangan kali kami kata katanya kaunter kawasan ke keadaan
kecil kedua kedua-dua kedudukan kekal kementerian kemudahan kenaikan
kenyataan kepada kepentingan keputusan kerajaan kerana kereta kerja
kerjasama kes keselamatan keseluruhan kesihatan ketika ketua
keuntungan kewangan khamis kini kira-kira kita klci klibor komposit
kontrak kos kuala kuasa kukuh kumpulan lagi lain langkah laporan
lebih lepas lima lot luar lumpur mac mahkamah mahu majlis makanan
maklumat malam malaysia mana manakala masa masalah masih masing-
masing masyarakat mata media mei melalui melihat memandangkan
memastikan membantu membawa memberi memberikan membolehkan membuat
mempunyai menambah menarik menawarkan mencapai mencatatkan mendapat
mendapatkan menerima menerusi mengadakan mengambil mengenai
menggalakkan menggunakan mengikut mengumumkan mengurangkan meningkat
meningkatkan menjadi menjelang menokok menteri menunjukkan menurut
menyaksikan menyediakan mereka merosot merupakan mesyuarat minat
minggu minyak modal mohd mudah mungkin naik najib nasional negara
negara-negara negeri niaga nilai nov ogos okt oleh operasi orang
pada pagi paling pameran papan para paras parlimen parti pasaran
pasukan pegawai pejabat pekerja pelabur pelaburan pelancongan
pelanggan pelbagai peluang pembangunan pemberita pembinaan pemimpin
pendapatan pendidikan penduduk penerbangan pengarah pengeluaran
pengerusi pengguna pengurusan peniaga peningkatan penting peratus
perdagangan perdana peringkat perjanjian perkara perkhidmatan
perladangan perlu permintaan perniagaan persekutuan persidangan
pertama pertubuhan pertumbuhan perusahaan peserta petang pihak
pilihan pinjaman polis politik presiden prestasi produk program
projek proses proton pukul pula pusat rabu rakan rakyat ramai rantau
raya rendah ringgit rumah sabah sahaja saham sama sarawak satu sawit
saya sdn sebagai sebahagian sebanyak sebarang sebelum sebelumnya
sebuah secara sedang segi sehingga sejak sekarang sektor sekuriti
selain selama selasa selatan selepas seluruh semakin semalam semasa
sementara semua semula sen sendiri seorang sepanjang seperti sept
september serantau seri serta sesi setiap setiausaha sidang
singapura sini sistem sokongan sri sudah sukan suku sumber supaya
susut syarikat syed tahap tahun tan tanah tanpa tawaran teknologi
telah tempat tempatan tempoh tenaga tengah tentang terbaik terbang
terbesar terbuka terdapat terhadap termasuk tersebut terus tetapi
thailand tiada tidak tiga timbalan timur tindakan tinggi tun tunai
turun turut umno unit untuk untung urus usaha utama walaupun wang
wanita wilayah yang
""".split())

_VOWELS = frozenset("aeiou")

JV_PREFIXES = ["dipun", "dak", "tak", "kok", "di", "ke", "ka", "sa",
               "se", "pa", "pi"]
JV_SUFFIXES = ["aken", "ake", "ane", "ipun", "ing", "an", "na", "ne",
               "i"]
SU_PREFIXES = ["pang", "pam", "pan", "nga", "di", "ka", "pa", "pi",
               "sa"]
SU_SUFFIXES = ["keun", "eun", "an", "na", "e"]


def _nasal(w: str) -> str:
    """the jv/su shared nasal-prefix rewrite"""
    if len(w) >= 5 and w.startswith("ny"):
        return "s" + w[2:]
    if len(w) >= 5 and w.startswith("ng"):
        return w[2:]
    if len(w) > 4 and w.startswith("n"):
        return "t" + w[1:]
    if len(w) > 4 and w.startswith("m"):
        return "p" + w[1:]
    return w


def _strip_pfx(w: str, prefixes) -> str:
    for p in prefixes:
        if len(w) > len(p) + 3 and w.startswith(p):
            return w[len(p):]
    return w


def _strip_sfx(w: str, suffixes) -> str:
    for s in suffixes:
        if len(w) >= len(s) + 3 and w.endswith(s):
            return w[:len(w) - len(s)]
    return w


def javanese_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    n = _nasal(w)
    w = n if n != w else _strip_pfx(w, JV_PREFIXES)
    w = _strip_sfx(w, JV_SUFFIXES)
    return _strip_sfx(w, JV_SUFFIXES)


def sundanese_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    p = _strip_pfx(w, SU_PREFIXES)
    w = p if p != w else _nasal(w)
    return _strip_sfx(w, SU_SUFFIXES)


# Malay flag bits (MalayStemmer.kt)
_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = 1, 2, 4, 8, 16, 32, 64


def _ms_fo_prefix(w: str, ns: int, flags: int):
    if w.startswith("meng"):
        return w[4:], ns - 1, flags | _MENG
    if w.startswith("meny") and len(w) > 4 and w[4] in _VOWELS:
        return "s" + w[4:], ns - 1, flags | _MENG
    if w.startswith("men") and len(w) > 3 and w[3] in _VOWELS:
        return "t" + w[3:], ns - 1, flags | _MENG
    if w.startswith("men"):
        return w[3:], ns - 1, flags | _MENG
    if w.startswith("mem") and len(w) > 3 and w[3] in _VOWELS:
        return "p" + w[3:], ns - 1, flags | _MENG
    if w.startswith("mem"):
        return w[3:], ns - 1, flags | _MENG
    if w.startswith("me"):
        return w[2:], ns - 1, flags | _MENG
    if w.startswith("peng"):
        return w[4:], ns - 1, flags | _PENG
    if w.startswith("peny") and len(w) > 4 and w[4] in _VOWELS:
        return "s" + w[4:], ns - 1, flags | _PENG
    if w.startswith("peny"):
        return w[4:], ns - 1, flags | _PENG
    if w.startswith("pen") and len(w) > 3 and w[3] in _VOWELS:
        return "t" + w[3:], ns - 1, flags | _PENG
    if w.startswith("pen"):
        return w[3:], ns - 1, flags | _PENG
    if w.startswith("pem") and len(w) > 3 and w[3] in _VOWELS:
        return "p" + w[3:], ns - 1, flags | _PENG
    if w.startswith("pem"):
        return w[3:], ns - 1, flags | _PENG
    if w.startswith("di"):
        return w[2:], ns - 1, flags | _DI
    if w.startswith("ter"):
        return w[3:], ns - 1, flags | _TER
    if w.startswith("ke"):
        return w[2:], ns - 1, flags | _KE
    return w, ns, flags


def _ms_so_prefix(w: str, ns: int, flags: int):
    if w.startswith("ber"):
        return w[3:], ns - 1, flags | _BER
    if w == "belajar":
        return w[3:], ns - 1, flags | _BER
    if (len(w) > 4 and w.startswith("be") and w[2] not in _VOWELS
            and w[3] == "e" and w[4] == "r"):
        return w[2:], ns - 1, flags | _BER
    if w.startswith("per"):
        return w[3:], ns - 1, flags
    if w == "pelajar":
        return w[3:], ns - 1, flags
    if w.startswith("pe"):
        return w[2:], ns - 1, flags | _PE
    return w, ns, flags


def _ms_suffix(w: str, ns: int, flags: int):
    if w.endswith("kan") and not flags & (_KE | _PENG | _PE):
        return w[:-3], ns - 1
    if w.endswith("an") and not flags & (_DI | _MENG | _TER):
        return w[:-2], ns - 1
    if (w.endswith("i") and not w.endswith("si")
            and not flags & (_BER | _KE | _PENG)):
        return w[:-1], ns - 1
    return w, ns


def malay_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    ns = sum(1 for c in w if c in _VOWELS)
    flags = 0
    if ns > 2 and w.endswith(("kah", "lah", "pun")):
        ns -= 1
        w = w[:-3]
    if ns > 2:
        if w.endswith(("ku", "mu")):
            ns -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            ns -= 1
            w = w[:-3]
    if ns > 2:
        old = w
        w, ns, flags = _ms_fo_prefix(w, ns, flags)
        if w != old:
            old = w
            if ns > 2:
                w, ns = _ms_suffix(w, ns, flags)
            if w != old and ns > 2:
                w, ns, flags = _ms_so_prefix(w, ns, flags)
        else:
            if ns > 2:
                w, ns, flags = _ms_so_prefix(w, ns, flags)
            if ns > 2:
                w, ns = _ms_suffix(w, ns, flags)
    return w


class JavaneseAnalyzer(_ExtraAnalyzer):
    name = "javanese"
    stop_words = JAVANESE_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return javanese_stem(tok)


class SundaneseAnalyzer(_ExtraAnalyzer):
    name = "sundanese"
    stop_words = SUNDANESE_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return sundanese_stem(tok)


class MalayAnalyzer(_ExtraAnalyzer):
    name = "malay"
    stop_words = MALAY_STOP_WORDS
    norm_map = dict(_LATIN_CORE)

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return malay_stem(tok)
