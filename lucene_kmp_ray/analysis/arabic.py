"""Arabic / Persian analysis chains.

Reference chains (``/root/reference/analysis/common/.../{ar,fa}/``):

- **Arabic** (``ArabicAnalyzer.kt``): StandardTokenizer → LowerCase →
  DecimalDigit → Stop (list NOT normalized) → ArabicNormalization →
  ArabicStem.  The normalizer (``ArabicNormalizer.kt``) folds the alef
  variants to bare alef, dotless yeh → yeh, teh marbuta → heh, and
  deletes tatweel + harakat; the stemmer (``ArabicStemmer.kt``) strips
  ONE leading article/conjunction prefix (first match in table order,
  with the و prefix requiring a 4-char word) then strips suffixes
  cumulatively in table order (each requiring ≥2 chars to remain).
- **Persian** (``PersianAnalyzer.kt``): StandardTokenizer → LowerCase →
  DecimalDigit → ArabicNormalization → PersianNormalization → Stop
  (the stop list is already in normalized form) → PersianStem.
  PersianNormalizer folds farsi yeh / yeh barree → arabic yeh, keheh →
  kaf, heh+yeh / heh goal → heh, and deletes hamza above; the stemmer
  (``PersianStemmer.kt``) strips suffixes cumulatively in table order
  (each requiring ≥2 chars to remain).

DecimalDigitFilter folds any Unicode Nd digit to its ASCII value.

The oracle mirrors (``oracle.arabic_preamble`` / ``persian_preamble``)
are GENERATED from the same tables (translate + CASE cascades), so Ray
and DuckDB agree by construction.  Conformance vectors from
Test{Arabic,Persian}{Normalization,Stem}Filter.kt live in
tests/test_arabic_persian.py.
"""

from __future__ import annotations

import unicodedata

from .romance import _RomanceAnalyzer

ARABIC_STOP_WORDS = frozenset("""
من ومن منها منه في وفي فيها فيه و ف ثم او أو ب بها به ا أ اى اي أي أى
لا ولا الا ألا إلا لكن ما وما كما فما عن مع اذا إذا ان أن إن انها أنها
إنها انه أنه إنه بان بأن فان فأن وان وأن وإن التى التي الذى الذي الذين
الى الي إلى إلي على عليها عليه اما أما إما ايضا أيضا كل وكل لم ولم لن
ولن هى هي هو وهى وهي وهو فهى فهي فهو انت أنت لك لها له هذه هذا تلك ذلك
هناك كانت كان يكون تكون وكانت وكان غير بعض قد نحو بين بينما منذ ضمن
حيث الان الآن خلال بعد قبل حتى عند عندما لدى جميع
""".split())

PERSIAN_STOP_WORDS = frozenset("""
انان نداشته سراسر خياه ايشان وي تاكنون بيشتري دوم پس ناشي وگو يا
داشتند سپس هنگام هرگز پنج نشان امسال ديگر گروهي شدند چطور ده و دو
نخستين ولي چرا چه وسط ه كدام قابل يك رفت هفت همچنين در هزار بله بلي
شايد اما شناسي گرفته دهد داشته دانست داشتن خواهيم ميليارد وقتيكه امد
خواهد جز اورده شده بلكه خدمات شدن برخي نبود بسياري جلوگيري حق كردند
نوعي بعري نكرده نظير نبايد بوده بودن داد اورد هست جايي شود دنبال داده
بايد سابق هيچ همان انجا كمتر كجاست گردد كسي تر مردم تان دادن بودند سري
جدا ندارند مگر يكديگر دارد دهند بنابراين هنگامي سمت جا انچه خود دادند
زياد دارند اثر بدون بهترين بيشتر البته به براساس بيرون كرد بعضي گرفت
توي اي ميليون او جريان تول بر مانند برابر باشيم مدتي گويند اكنون تا
تنها جديد چند بي نشده كردن كردم گويد كرده كنيم نمي نزد روي قصد فقط
بالاي ديگران اين ديروز توسط سوم ايم دانند سوي استفاده شما كنار داريم
ساخته طور امده رفته نخست بيست نزديك طي كنيد از انها تمامي داشت يكي
طريق اش چيست روب نمايد گفت چندين چيزي تواند ام ايا با ان ايد ترين
اينكه ديگري راه هايي بروز همچنان پاعين كس حدود مختلف مقابل چيز گيرد
ندارد ضد همچون سازي شان مورد باره مرسي خويش برخوردار چون خارج شش هنوز
تحت ضمن هستيم گفته فكر بسيار پيش براي روزهاي انكه نخواهد بالا كل وقتي
كي چنين كه گيري نيست است كجا كند نيز يابد بندي حتي توانند عقب خواست
كنند بين تمام همه ما باشند مثل شد اري باشد اره طبق بعد اگر صورت غير
جاي بيش ريزي اند زيرا چگونه بار لطفا مي درباره من ديده همين گذاري
برداري علت گذاشته هم فوق نه ها شوند اباد همواره هر اول خواهند چهار نام
امروز مان هاي قبل كنم سعي تازه را هستند زير جلوي عنوان بود
""".split())

# ArabicNormalizer.kt tables
AR_NORM_DELETE = "ـًٌٍَُِّْ"
AR_NORM_MAP = {
    "آ": "ا", "أ": "ا", "إ": "ا",  # → alef
    "ى": "ي",                                          # → yeh
    "ة": "ه",                                          # → heh
}

# ArabicStemmer.kt tables (order matters; first prefix match wins,
# suffixes strip cumulatively)
AR_PREFIXES = ("ال", "وال",
               "بال", "كال",
               "فال", "لل", "و")
AR_SUFFIXES = ("ها", "ان", "ات",
               "ون", "ين", "يه",
               "ية", "ه", "ة", "ي")

# PersianStemmer.kt table (cumulative strip in order, ≥2 chars remain)
FA_SUFFIXES = ("ات", "ان", "ترين",
               "تر", "يي", "ي",
               "ها", "‌")

# PersianNormalizer.kt tables
FA_NORM_DELETE = "ٔ"
FA_NORM_MAP = {
    "ی": "ي", "ے": "ي",  # farsi yeh / yeh barree
    "ک": "ك",                       # keheh → kaf
    "ۀ": "ه", "ہ": "ه",   # heh+yeh / heh goal → heh
}

_AR_TRANS = str.maketrans(
    AR_NORM_MAP | {c: None for c in AR_NORM_DELETE})
_FA_TRANS = str.maketrans(
    FA_NORM_MAP | {c: None for c in FA_NORM_DELETE})


def fold_digits(s: str) -> str:
    """DecimalDigitFilter: any Unicode Nd digit → ASCII '0'-'9'."""
    if all(c < "٠" for c in s):   # fast path: no non-ASCII digits
        return s
    return "".join(
        chr(48 + unicodedata.decimal(c))
        if unicodedata.category(c) == "Nd" else c
        for c in s)


def arabic_normalize(s: str) -> str:
    return s.translate(_AR_TRANS)


def persian_normalize(s: str) -> str:
    return s.translate(_FA_TRANS)


def arabic_stem(s: str) -> str:
    for p in AR_PREFIXES:
        if len(p) == 1:
            if len(s) < 4:
                continue
        elif len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for sfx in AR_SUFFIXES:
        if len(s) >= len(sfx) + 2 and s.endswith(sfx):
            s = s[:len(s) - len(sfx)]
    return s


class ArabicAnalyzer(_RomanceAnalyzer):
    """LowerCase → DecimalDigit → Stop(raw) → normalize → stem."""
    name = "arabic"
    stop_words = ARABIC_STOP_WORDS
    elide = staticmethod(fold_digits)

    def _stem(self, tok: str) -> str:
        return arabic_stem(arabic_normalize(tok))


def persian_stem(s: str) -> str:
    for sfx in FA_SUFFIXES:
        if len(s) >= len(sfx) + 2 and s.endswith(sfx):
            s = s[:len(s) - len(sfx)]
    return s


def _fa_pre(tok: str) -> str:
    return persian_normalize(arabic_normalize(fold_digits(tok)))


class PersianAnalyzer(_RomanceAnalyzer):
    """LowerCase → DecimalDigit → arabic norm → persian norm →
    Stop(normalized list) → persian stem."""
    name = "persian"
    stop_words = PERSIAN_STOP_WORDS
    elide = staticmethod(_fa_pre)

    def _stem(self, tok: str) -> str:
        return persian_stem(tok)
