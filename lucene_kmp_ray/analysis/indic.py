"""Hindi analysis chain (Indic script normalization + light stemmer).

Reference chain (``/root/reference/analysis/common/.../hi/HindiAnalyzer.kt``):
StandardTokenizer → LowerCase → DecimalDigit → IndicNormalization →
HindiNormalization → Stop → HindiStem.

- **IndicNormalizer** (``in/IndicNormalizer.kt``): composes two- and
  three-character sequences (letter + vowel-sign [+ sign/ZWJ]) into
  their canonical single codepoints across the nine Indic blocks,
  following Unicode 5.2 ch.6 plus the LDC graphical decompositions.
  The table below is the same (ch0, ch1, ch2, result, script-flags)
  data; -1 means a two-char rule and 0xFF means ZWJ as third char.
- **HindiNormalizer** (``hi/HindiNormalizer.kt``): dead-n (न + virama)
  → bindu, candrabindu → bindu, nukta deletions and nukta-composed
  consonant folds, ZWJ/ZWNJ/virama deletion, chandra/short vowel
  folds, long → short vowel folds.
- **HindiStemmer** (``hi/HindiStemmer.kt``, Ramanathan & Rao "A
  Lightweight Stemmer for Hindi"): longest-first suffix tiers (5..1
  chars) with a strict length guard per tier.

The oracle mirror (``oracle.hindi_preamble``) GENERATES the equivalent
SQL (replace-chain for the compose table in table order, dead-n
regexp, translate folds, CASE tiers) from the same data.  Conformance
vectors from TestHindi{Normalizer,Stemmer}.kt live in
tests/test_hindi_analyzer.py.
"""

from __future__ import annotations

from .arabic import fold_digits
from .romance import _RomanceAnalyzer

HINDI_STOP_WORDS = frozenset("""
अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन इनका इन्हीं इन्हें इन्हों
इस इसका इसकी इसके इसमें इसी इसे उन उनका उनकी उनके उनको उन्हीं उन्हें
उन्हों उस उसके उसी उसे एक एवं एस ऐसे और कई कर करता करते करना करने करें
कहते कहा का काफ़ी कि कितना किन्हें किन्हों किया किर किस किसी किसे की
कुछ कुल के को कोई कौन कौनसा गया घर जब जहाँ जा जितना जिन जिन्हें
जिन्हों जिस जिसे जीधर जैसा जैसे जो तक तब तरह तिन तिन्हें तिन्हों तिस
तिसे तो था थी थे दबारा दिया दुसरा दूसरे दो द्वारा न नहीं ना निहायत
नीचे ने पर पहले पूरा पे फिर बनी बही बहुत बाद बाला बिलकुल भी भीतर मगर
मानो मे में यदि यह यहाँ यही या यिह ये रखें रहा रहे ऱ्वासा लिए लिये
लेकिन व वर्ग वह वहाँ वहीं वाले वुह वे वग़ैरह संग सकता सकते सबसे सभी
साथ साबुत साभ सारा से सो ही हुआ हुई हुए है हैं हो होता होती होते होना
होने अपनि जेसे होति सभि तिंहों इंहों दवारा इसि किंहें थि उंहों ओर
जिंहें वहिं अभि बनि हि उंहिं उंहें हें वगेरह एसे रवासा कोन निचे काफि
उसि पुरा भितर हे बहि वहां कोइ यहां जिंहों तिंहें किसि कइ यहि इंहिं
जिधर इंहें अदि इतयादि हुइ कोनसा इसकि दुसरे जहां अप किंहों उनकि भि वरग
हुअ जेसा नहिं
""".split())

# script flags
_DEV, _BEN, _GUR, _GUJ, _ORI, _TAM, _TEL, _KAN, _MAL = \
    1, 2, 4, 8, 16, 32, 64, 128, 256

_BLOCKS = [
    (0x0900, 0x097F, _DEV), (0x0980, 0x09FF, _BEN),
    (0x0A00, 0x0A7F, _GUR), (0x0A80, 0x0AFF, _GUJ),
    (0x0B00, 0x0B7F, _ORI), (0x0B80, 0x0BFF, _TAM),
    (0x0C00, 0x0C7F, _TEL), (0x0C80, 0x0CFF, _KAN),
    (0x0D00, 0x0D7F, _MAL),
]

# IndicNormalizer.kt decompositions: (ch0, ch1, ch2, result, flags)
INDIC_DECOMP = [
    (0x05, 0x3E, 0x45, 0x11, _DEV | _GUJ),
    (0x05, 0x3E, 0x46, 0x12, _DEV),
    (0x05, 0x3E, 0x47, 0x13, _DEV | _GUJ),
    (0x05, 0x3E, 0x48, 0x14, _DEV | _GUJ),
    (0x05, 0x3E, -1, 0x06, _DEV | _BEN | _GUR | _GUJ | _ORI),
    (0x05, 0x45, -1, 0x72, _DEV),
    (0x05, 0x45, -1, 0x0D, _GUJ),
    (0x05, 0x46, -1, 0x04, _DEV),
    (0x05, 0x47, -1, 0x0F, _GUJ),
    (0x05, 0x48, -1, 0x10, _GUR | _GUJ),
    (0x05, 0x49, -1, 0x11, _DEV | _GUJ),
    (0x05, 0x4A, -1, 0x12, _DEV),
    (0x05, 0x4B, -1, 0x13, _DEV | _GUJ),
    (0x05, 0x4C, -1, 0x14, _DEV | _GUR | _GUJ),
    (0x06, 0x45, -1, 0x11, _DEV | _GUJ),
    (0x06, 0x46, -1, 0x12, _DEV),
    (0x06, 0x47, -1, 0x13, _DEV | _GUJ),
    (0x06, 0x48, -1, 0x14, _DEV | _GUJ),
    (0x07, 0x57, -1, 0x08, _MAL),
    (0x09, 0x41, -1, 0x0A, _DEV),
    (0x09, 0x57, -1, 0x0A, _TAM | _MAL),
    (0x0E, 0x46, -1, 0x10, _MAL),
    (0x0F, 0x45, -1, 0x0D, _DEV),
    (0x0F, 0x46, -1, 0x0E, _DEV),
    (0x0F, 0x47, -1, 0x10, _DEV),
    (0x0F, 0x57, -1, 0x10, _ORI),
    (0x12, 0x3E, -1, 0x13, _MAL),
    (0x12, 0x4C, -1, 0x14, _TEL | _KAN),
    (0x12, 0x55, -1, 0x13, _TEL),
    (0x12, 0x57, -1, 0x14, _TAM | _MAL),
    (0x13, 0x57, -1, 0x14, _ORI),
    (0x15, 0x3C, -1, 0x58, _DEV),
    (0x16, 0x3C, -1, 0x59, _DEV | _GUR),
    (0x17, 0x3C, -1, 0x5A, _DEV | _GUR),
    (0x1C, 0x3C, -1, 0x5B, _DEV | _GUR),
    (0x21, 0x3C, -1, 0x5C, _DEV | _BEN | _ORI),
    (0x22, 0x3C, -1, 0x5D, _DEV | _BEN | _ORI),
    (0x23, 0x4D, 0xFF, 0x7A, _MAL),
    (0x24, 0x4D, 0xFF, 0x4E, _BEN),
    (0x28, 0x3C, -1, 0x29, _DEV),
    (0x28, 0x4D, 0xFF, 0x7B, _MAL),
    (0x2B, 0x3C, -1, 0x5E, _DEV | _GUR),
    (0x2F, 0x3C, -1, 0x5F, _DEV | _BEN),
    (0x2C, 0x41, 0x41, 0x0B, _TEL),
    (0x30, 0x3C, -1, 0x31, _DEV),
    (0x30, 0x4D, 0xFF, 0x7C, _MAL),
    (0x32, 0x4D, 0xFF, 0x7D, _MAL),
    (0x33, 0x3C, -1, 0x34, _DEV),
    (0x33, 0x4D, 0xFF, 0x7E, _MAL),
    (0x35, 0x41, -1, 0x2E, _TEL),
    (0x3E, 0x45, -1, 0x49, _DEV | _GUJ),
    (0x3E, 0x46, -1, 0x4A, _DEV),
    (0x3E, 0x47, -1, 0x4B, _DEV | _GUJ),
    (0x3E, 0x48, -1, 0x4C, _DEV | _GUJ),
    (0x3F, 0x55, -1, 0x40, _KAN),
    (0x41, 0x41, -1, 0x42, _GUR),
    (0x46, 0x3E, -1, 0x4A, _TAM | _MAL),
    (0x46, 0x42, 0x55, 0x4B, _KAN),
    (0x46, 0x42, -1, 0x4A, _KAN),
    (0x46, 0x46, -1, 0x48, _MAL),
    (0x46, 0x55, -1, 0x47, _TEL | _KAN),
    (0x46, 0x56, -1, 0x48, _TEL | _KAN),
    (0x46, 0x57, -1, 0x4C, _TAM | _MAL),
    (0x47, 0x3E, -1, 0x4B, _BEN | _ORI | _TAM | _MAL),
    (0x47, 0x57, -1, 0x4C, _BEN | _ORI),
    (0x4A, 0x55, -1, 0x4B, _KAN),
    (0x72, 0x3F, -1, 0x07, _GUR),
    (0x72, 0x40, -1, 0x08, _GUR),
    (0x72, 0x47, -1, 0x0F, _GUR),
    (0x73, 0x41, -1, 0x09, _GUR),
    (0x73, 0x42, -1, 0x0A, _GUR),
    (0x73, 0x4B, -1, 0x13, _GUR),
]

_DECOMP_MASK = {}
for _b0, _e0, _f in _BLOCKS:
    _DECOMP_MASK[_f] = {d[0] for d in INDIC_DECOMP if d[4] & _f}


def _block_of(cp: int):
    for base, end, flag in _BLOCKS:
        if base <= cp <= end:
            return base, flag
    return None


def indic_normalize(s: str) -> str:
    buf = list(s)
    i = 0
    while i < len(buf):
        blk = _block_of(ord(buf[i]))
        if blk is not None:
            base, flag = blk
            ch = ord(buf[i]) - base
            if ch in _DECOMP_MASK[flag]:
                _compose(buf, i, ch, base, flag)
        i += 1
    return "".join(buf)


def _compose(buf, pos, ch0, base, flag):
    if pos + 1 >= len(buf):
        return
    b1 = _block_of(ord(buf[pos + 1]))
    if b1 is None or b1[0] != base:
        return
    ch1 = ord(buf[pos + 1]) - base
    ch2 = -1
    if pos + 2 < len(buf):
        if buf[pos + 2] == "‍":
            ch2 = 0xFF
        else:
            b2 = _block_of(ord(buf[pos + 2]))
            if b2 is not None and b2[0] == base:
                ch2 = ord(buf[pos + 2]) - base
    for d0, d1, d2, res, flags in INDIC_DECOMP:
        if d0 == ch0 and (flags & flag) and d1 == ch1 \
                and (d2 < 0 or d2 == ch2):
            buf[pos] = chr(base + res)
            del buf[pos + 1]
            if d2 >= 0:
                del buf[pos + 1]
            return


# HindiNormalizer.kt per-char folds (applied after the dead-n rule)
HI_NORM_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}
HI_NORM_DELETE = frozenset("़‍‌्")
_HI_TRANS = str.maketrans(
    HI_NORM_MAP | {c: None for c in HI_NORM_DELETE})


def hindi_normalize(s: str) -> str:
    # dead n (न + virama) → bindu, then the per-char folds/deletes
    s = s.replace("न्", "ं")
    return s.translate(_HI_TRANS)


# HindiStemmer.kt tiers: (min_len_exclusive, suffixes)
HI_STEM_TIERS = [
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा",
         "ाइयाँ", "ाइयों", "ाइयां")),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे",
         "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं",
         "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी",
         "ेगा", "ोगी", "ोगे", "ाने", "ाना",
         "ाते", "ाती", "ाता", "तीं", "ाओं",
         "ाएं", "ुओं", "ुएं", "ुआं")),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने",
         "नी", "ना", "ते", "ीं", "ती", "ता",
         "ाँ", "ां", "ों", "ें")),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
]


def hindi_stem(w: str) -> str:
    for min_len, suffixes in HI_STEM_TIERS:
        if len(w) > min_len and w.endswith(suffixes):
            return w[:-(len(suffixes[0]))]
    return w


def _hi_pre(tok: str) -> str:
    return hindi_normalize(indic_normalize(fold_digits(tok)))


class HindiAnalyzer(_RomanceAnalyzer):
    """LowerCase → DecimalDigit → indic norm → hindi norm → Stop →
    hindi stem."""
    name = "hindi"
    stop_words = HINDI_STOP_WORDS
    elide = staticmethod(_hi_pre)

    def _stem(self, tok: str) -> str:
        return hindi_stem(tok)


# =================================================================
# Bengali / Telugu (generated tables — extracted verbatim from the
# reference {bn,te} analyzers; see module docstring)
# =================================================================

BENGALI_STOP_WORDS = frozenset("""
অনেক অন্য অবশ্য আগে আছে আজ আবার আমরা আমাদের আর ই উত্তর উপর উপরে এ এই এক্ এখন এত এব এমন এমনি এর এস এসে ও ওই কমনে করা করে কাছে কাজ কাজে কারণ কি কিছু কে কেউ কেখা কেন কোটি কোনো কয়েক খুব গিয়ে গেল চার চালু চেষ্টা ছিল জানা জ্নজন টি তখন তবে তা তাই তো থাকা থেকে দিন দু দুই দেওয়া ধামার নতুন না নাগাদ নিয়ে নেওয়া নয় পর পরে পাচ পি পেয়্র্ প্রতি প্রথম প্রযন্ত প্রাথমিক প্রায় বক্তব্য বন বলা বলে বলেন বহু বা বি বিভিন্ন বেশ বেশি মতো মধ্যে মনে যখন যদি যা যাওয়া যে র রকম লক্ষ শুধু শুরু সঙ্গে সব সহ সাধারণ সামনে সি সে সেই হতে হাজার হয়
""".split())

TELUGU_STOP_WORDS = frozenset("""
అందరూ అందుబాటులో అడగండి అడగడం అడ్డంగా అనుగుణంగా అనుమతించు అనుమతిస్తుంది అయితే ఇప్పటికే ఉన్నారు ఎక్కడైనా ఎప్పుడు ఎవరైనా ఎవరో ఏ ఏదైనా ఏమైనప్పటికి ఒక ఒకరు కనిపిస్తాయి కాదు కూడా గా గురించి చుట్టూ చేయగలిగింది తగిన తర్వాత దాదాపు దూరంగా నిజంగా పై ప్రకారం ప్రక్కన మధ్య మరియు మరొక మళ్ళీ మాత్రమే మెచ్చుకో వద్ద వెంట వేరుగా వ్యతిరేకంగా సంబంధం
""".split())

# BengaliStemmer.kt tiers: (min_len_exclusive, suffixes) — cut = len(sfx)
BN_STEM_TIERS = [
    (9, ('িয়াছিলাম', 'িতেছিলাম', 'িতেছিলেন', 'ইতেছিলেন', 'িয়াছিলেন', 'ইয়াছিলেন')),
    (8, ('িতেছিলি', 'িতেছিলে', 'িয়াছিলা', 'িয়াছিলে', 'িতেছিলা', 'িয়াছিলি', 'য়েদেরকে')),
    (7, ('িতেছিস', 'িতেছেন', 'িয়াছিস', 'িয়াছেন', 'েছিলাম', 'েছিলেন', 'েদেরকে')),
    (6, ('িতেছি', 'িতেছা', 'িতেছে', 'ছিলাম', 'ছিলেন', 'িয়াছি', 'িয়াছা', 'িয়াছে', 'েছিলে', 'েছিলা', 'য়েদের', 'দেরকে')),
    (5, ('িলাম', 'িলেন', 'িতাম', 'িতেন', 'িবেন', 'ছিলি', 'ছিলে', 'ছিলা', 'তেছে', 'িতেছ', 'খানা', 'খানি', 'গুলো', 'গুলি', 'য়েরা', 'েদের')),
    (4, ('লাম', 'িলি', 'ইলি', 'িলে', 'ইলে', 'লেন', 'িলা', 'ইলা', 'তাম', 'িতি', 'ইতি', 'িতে', 'ইতে', 'তেন', 'িতা', 'িবা', 'ইবা', 'িবি', 'ইবি', 'বেন', 'িবে', 'ইবে', 'ছেন', 'য়োন', 'য়ের', 'েরা', 'দের')),
    (3, ('িস', 'েন', 'লি', 'লে', 'লা', 'তি', 'তে', 'তা', 'বি', 'বে', 'বা', 'ছি', 'ছা', 'ছে', 'ুন', 'ুক', 'টা', 'টি', 'নি', 'ের', 'তে', 'রা', 'কে')),
    (2, ('ি', 'ী', 'া', 'ো', 'ে', 'ব', 'ত')),
]

# TeluguStemmer.kt tiers
TE_STEM_TIERS = [
    (5, ('ళ్ళు', 'డ్లు')),
    (3, ('డు', 'ము', 'వు', 'లు', 'ని', 'ను', 'చే', 'కై', 'లో', 'డు', 'ది', 'కి', 'సు', 'వై', 'పై')),
    (2, ('ి', 'ీ', 'ు', 'ూ', 'ె', 'ే', 'ొ', 'ో', 'ా')),
]


def bengali_normalize(s: str) -> str:
    """``bn/BengaliNormalizer.kt`` — exact port of the in-place buffer
    scan (Double Metaphone encoding for Bangla paper): chandrabindu
    delete, long→short kars, Khio composition, nga→anusvara, ja/ba
    phala folds, visarga handling, sh/na/ra folds."""
    b = list(s)
    i = 0
    while i < len(b):
        c = b[i]
        if c == "ঁ":                       # chandrabindu: delete
            del b[i]
            i -= 1
        elif c == "ী":                      # dirgho-i → rossho-i
            b[i] = "ি"
        elif c == "ূ":                      # dirgho-u → rossho-u
            b[i] = "ু"
        elif c == "ক":                      # khio
            if i + 2 < len(b) and b[i + 1] == "্" \
                    and b[i + 2] == "ি":
                if i == 0:
                    b[i] = "খ"
                    del b[i + 2]
                    del b[i + 1]
                else:
                    b[i + 1] = "খ"
                    del b[i + 2]
        elif c == "ঙ":                      # nga → anusvara
            b[i] = "ং"
        elif c == "য":                      # ja phala
            if i - 2 == 0 and b[i - 1] == "্":
                b[i - 1] = "ে"
                if i + 1 < len(b) and b[i + 1] == "া":
                    del b[i + 1]
                del b[i]
                i -= 1
            elif i - 1 >= 0 and b[i - 1] == "্":
                del b[i]
                del b[i - 1]
                i -= 2
        elif c == "ব":                      # ba phala
            if (i >= 1 and b[i - 1] != "্") or i == 0:
                pass
            elif i - 2 == 0:
                del b[i]
                del b[i - 1]
                i -= 2
            elif i - 5 >= 0 and b[i - 3] == "্":
                del b[i]
                del b[i - 1]
                i -= 2
            elif i - 2 >= 0:
                b[i - 1] = b[i - 2]
                del b[i]
                i -= 1
        elif c == "ঃ":                      # visarga
            if i == len(b) - 1:
                if len(b) <= 3:
                    b[i] = "হ"
                else:
                    del b[i]
                    i -= 1
            else:
                b[i] = b[i + 1]
        elif c in ("শ", "ষ"):          # sh → dental s
            b[i] = "স"
        elif c == "ণ":                      # murdhanya na → na
            b[i] = "ন"
        elif c in ("ড়", "ঢ়"):          # rra → ra
            b[i] = "র"
        elif c == "ৎ":                      # khanda-ta → ta
            b[i] = "ত"
        i += 1
    return "".join(b)


def telugu_normalize(s: str) -> str:
    """``te/TeluguNormalizer.kt`` — exact port: candrabindu forms →
    anusvara, visarga/ZWJ/ZWNJ delete, long→short vowels and matras,
    two-char vowel compositions."""
    b = list(s)
    i = 0
    while i < len(b):
        c = b[i]
        if c in ("ఀ", "ఁ"):
            b[i] = "ం"
        elif c == "ః" or c in ("‍", "‌"):
            del b[i]
            i -= 1
        elif c == "ఔ":
            b[i] = "ఓ"
        elif c == "ఐ":
            b[i] = "ఏ"
        elif c == "ఆ":
            b[i] = "అ"
        elif c == "ఈ":
            b[i] = "ఇ"
        elif c == "ఊ":
            b[i] = "ఉ"
        elif c == "ీ":
            b[i] = "ి"
        elif c == "ూ":
            b[i] = "ు"
        elif c == "ే":
            b[i] = "ె"
        elif c == "ో":
            b[i] = "ొ"
        elif c == "ె":
            if i + 1 < len(b) and b[i + 1] == "ౖ":
                b[i] = "ై"
                del b[i + 1]
        elif c == "ఒ":
            if i + 1 < len(b) and b[i + 1] == "ౕ":
                b[i] = "ఓ"
                del b[i + 1]
            elif i + 1 < len(b) and b[i + 1] == "ౌ":
                b[i] = "ఔ"
                del b[i + 1]
        i += 1
    return "".join(b)


def _tier_stem(w: str, tiers) -> str:
    for min_len, suffixes in tiers:
        if len(w) > min_len and w.endswith(suffixes):
            return w[:-(len(suffixes[0]))]
    return w


def bengali_stem(w: str) -> str:
    return _tier_stem(w, BN_STEM_TIERS)


def telugu_stem(w: str) -> str:
    return _tier_stem(w, TE_STEM_TIERS)


def _bn_pre(tok: str) -> str:
    return bengali_normalize(indic_normalize(fold_digits(tok)))


def _te_pre(tok: str) -> str:
    return telugu_normalize(indic_normalize(fold_digits(tok)))


class BengaliAnalyzer(_RomanceAnalyzer):
    """LowerCase → DecimalDigit → indic norm → bengali norm → Stop →
    bengali stem (``bn/BengaliAnalyzer.kt``)."""
    name = "bengali"
    stop_words = BENGALI_STOP_WORDS
    elide = staticmethod(_bn_pre)

    def _stem(self, tok: str) -> str:
        return bengali_stem(tok)


class TeluguAnalyzer(_RomanceAnalyzer):
    """DecimalDigit → indic norm → telugu norm → Stop → telugu stem
    (``te/TeluguAnalyzer.kt``; no lowercase in the reference chain —
    Telugu has no case, and the standard tokenizer's lowercasing is a
    no-op on Telugu text)."""
    name = "telugu"
    stop_words = TELUGU_STOP_WORDS
    elide = staticmethod(_te_pre)

    def _stem(self, tok: str) -> str:
        return telugu_stem(tok)
