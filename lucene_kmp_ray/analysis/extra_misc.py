"""Belarusian / Haitian Creole / Uzbek / Urdu analysis chains.

Reference chains (``/root/reference/analysis/extra/.../{be,ht,uz,ur}/``):
StandardTokenizer → LowerCase → DecimalDigit → <Lang>Normalization →
Stop → <Lang>StemFilter.

- Belarusian: combining-mark compose (у+̆ → ў, е+̈ → ё), и → і,
  quote/dash folds; one Cyrillic suffix strip (stem ≥ 4, word > 4);
- Haitian Creole: Latin fold, then pronoun CLITIC strip inside the
  normalizer (m'/w'/l'/n'/y'/k' prefixes, 'm/'w/'l/'n/'y suffixes);
  stemmer strips -man (word > 4 and > 6 for the strip guard);
- Uzbek: Latin fold incl. the ʻokina apostrophe variants; up to THREE
  repeated suffix strips (stem ≥ 2);
- Urdu: Arabic presentation-form unification + diacritic removal +
  alif/hamza composition (char map from ``ur/UrduNormalizer.kt``);
  stemmer strips a prefix, applies the alif/mim infix-removal rules,
  strips a suffix (word > len+2 guards).

SQL mirrors via the per-language generators in oracle.py; vectors from
the reference's Test*Analyzer.kt suites live in
tests/test_misc_extra_analyzers.py.
"""

from __future__ import annotations

from .african import _LATIN_CORE, _ExtraAnalyzer
from .arabic import fold_digits

BELARUSIAN_STOP_WORDS = frozenset("""
а аб або але без бо больш было быў была былі быць ва вам вас вось вы
гэта гэты гэтым да для дзе ён ёсць ж за з і калі каля майго мы на
над нас не ні о па пад пасля перад пра пры сабе сябе таго так
таксама там тая толькі той тое тут ты у ў усе усё хто ці што як я
яго яе які яна яны
""".split())

HAITIAN_STOP_WORDS = frozenset("""
a ak al an ankò anko ap avèk avek e epi eske gen ki kijan koman
kòman la lan li l le m map m'ap men mwen n nan ni nou ou p pa pou
pral sa se si sou ta tap te va w wi y ye yo yon youn
""".split())

UZBEK_STOP_WORDS = frozenset("""
va ham yoki ammo lekin bilan uchun bu shu o'sha mana ana men sen u
biz siz ular kim nima qachon qayerda qanday har bir hech barcha bor
yo'q emas edi ekan bo'lgan bo'lib bo'ladi deb degan agar chunki
shuning uchun
""".split())

URDU_STOP_WORDS = frozenset("""
آئی آئے آج آخر آخرکبر آدهی آًب آٹھ آیب اة اخبزت اختتبم ادھر ارد
اردگرد ارکبى اش اضتعوبل اضتعوبلات اضطرذ اضکب اضکی اضکے اطراف اغیب
افراد الگ اور اوًچب اوًچبئی اوًچی اوًچے اى اً اًذر اًہیں اٹھبًب اپٌب
اپٌے اچھب اچھی اچھے اکثر اکٹھب اکٹھی اکٹھے اکیلا اکیلی اکیلے اگرچہ
اہن ایطے ایک ب ت تبزٍ تت تر ترتیت تریي تعذاد تن تو توبم توہی توہیں
تٌہب تک تھب تھوڑا تھوڑی تھوڑے تھی تھے تیي ثب ثبئیں ثبترتیت ثبری ثبرے
ثبعث ثبلا ثبلترتیت ثبہر ثدبئے ثرآں ثراں ثرش ثعذ ثغیر ثلٌذ ثلٌذوثبلا
ثلکہ ثي ثٌب ثٌبرہب ثٌبرہی ثٌبرہے ثٌبًب ثٌذ ثٌذکرو ثٌذکرًب ثٌذی ثڑا
ثڑوں ثڑی ثڑے ثھر ثھرا ثھراہوا ثھرپور ثھی ثہت ثہتر ثہتری ثہتریي ثیچ ج
خب خبرہب خبرہی خبرہے خبهوظ خبًب خبًتب خبًتی خبًتے خبًٌب خت ختن خجکہ
خص خططرذ خلذی خو خواى خوًہی خوکہ خٌبة خگہ خگہوں خگہیں خیطب خیطبکہ در
درخبت درخہ درخے درزقیقت درضت دش دفعہ دلچطپ دلچطپی دلچطپیبں دو دور
دوراى دوضرا دوضروں دوضری دوضرے دوًوں دکھبئیں دکھبتب دکھبتی دکھبتے
دکھبو دکھبًب دکھبیب دی دیب دیتب دیتی دیتے دیر دیٌب دیکھو دیکھٌب
دیکھی دیکھیں دے ر راضتوں راضتہ راضتے رریعہ رریعے رکي رکھ رکھب رکھتب
رکھتبہوں رکھتی رکھتے رکھی رکھے رہب رہی رہے ز زبصل زبضر زبل زبلات
زبلیہ زصوں زصہ زصے زقبئق زقیتیں زقیقت زکن زکویہ زیبدٍ صبف صسیر صفر
صورت صورتسبل صورتوں صورتیں ض ضبت ضبتھ ضبدٍ ضبرا ضبرے ضبل ضبلوں ضت
ضرور ضرورت ضروری ضلطلہ ضوچ ضوچب ضوچتب ضوچتی ضوچتے ضوچو ضوچٌب ضوچی
ضوچیں ضکب ضکتب ضکتی ضکتے ضکٌب ضکی ضکے ضیذھب ضیذھی ضیذھے ضیکٌڈ ضے طرف
طریق طریقوں طریقہ طریقے طور طورپر ظبہر ع عذد عظین علاقوں علاقہ علاقے
علاوٍ عووهی غبیذ غخص غذ غروع غروعبت غے فرد فی ق قجل قجیلہ قطن لئے لا
لازهی لو لوجب لوجی لوجے لوسبت لوسہ لوگ لوگوں لڑکپي لگتب لگتی لگتے
لگٌب لگی لگیں لگے لی لیب لیٌب لیں لے ه هتعلق هختلف هسترم هسترهہ
هسطوش هسیذ هطئلہ هطئلے هطبئل هطتعول هطلق هعلوم هػتول هلا هوکي هوکٌبت
هوکٌہ هٌبضت هڑا هڑًب هڑے هکول هگر هہرثبى هیرا هیری هیرے هیں و وار
والے وٍ ًئی ًئے ًب ًبپطٌذ ًبگسیر ًطجت ًقطہ ًو ًوخواى ًکبلٌب ًکتہ ًہ
ًہیں ًیب ًے ٓ آش ٹھیک پبئے پبش پبًب پبًچ پر پراًب پطٌذ پل پورا پوچھب
پوچھتب پوچھتی پوچھتے پوچھو پوچھوں پوچھٌب پوچھیں پچھلا پھر پہلا پہلی
پہلےضی پہلےضے پہلےضےہی پیع چبر چبہب چبہٌب چبہے چلا چلو چلیں چلے چکب
چکی چکیں چکے چھوٹب چھوٹوں چھوٹی چھوٹے چھہ چیسیں ڈھوًڈا ڈھوًڈلیب
ڈھوًڈو ڈھوًڈًب ڈھوًڈی ڈھوًڈیں ک کئی کئے کب کبفی کبم کت کجھی کرا کرتب
کرتبہوں کرتی کرتے کرتےہو کررہب کررہی کررہے کرو کرًب کریں کرے کطی کل
کن کوئی کوتر کورا کوروں کورٍ کورے کوطي کوى کوًطب کوًطی کوًطے کھولا
کھولو کھولٌب کھولی کھولیں کھولے کہ کہب کہتب کہتی کہتے کہو کہوں کہٌب
کہی کہیں کہے کی کیب کیطب کیطرف کیطے کیلئے کیوًکہ کیوں کیے کے کےثعذ
کےرریعے گئی گئے گب گرد گروٍ گروپ گروہوں گٌتی گی گیب گے ہر ہن ہو ہوئی
ہوئے ہوا ہوبرا ہوبری ہوبرے ہوتب ہوتی ہوتے ہورہب ہورہی ہورہے ہوضکتب
ہوضکتی ہوضکتے ہوًب ہوًی ہوًے ہوچکب ہوچکی ہوچکے ہوگئی ہوگئے ہوگیب ہوں
ہی ہیں ہے ی یقیٌی یہ یہبں
""".split())

BE_SUFFIXES = ['ымі', 'імі', 'ага', 'яга', 'ога', 'ему', 'аму', 'ому', 'амі', 'ямі', 'аго', 'яму', 'ых', 'іх', 'ай', 'ой', 'ую', 'юю', 'ая', 'яя', 'ае', 'ое', 'ыя', 'ія', 'ах', 'ях', 'ам', 'ям', 'аў', 'оў', 'еў', 'ей', 'цца', 'ць', 'ці', 'ла', 'лі', 'ло', 'ся', 'а', 'у', 'ю', 'ы', 'і', 'е', 'я']

HT_PREFIX_CLITICS = ["m'", "w'", "l'", "n'", "y'", "k'"]
HT_SUFFIX_CLITICS = ["'m", "'w", "'l", "'n", "'y"]

UZ_SUFFIXES = ['larimizdan', 'laringizdan', 'larimizga', 'laringizga', 'larining', 'laridan', 'larida', 'larni', 'larga', 'larka', 'larqa', 'lar', 'imizdan', 'ingizdan', 'imizga', 'ingizga', 'imizni', 'ingizni', 'imizda', 'ingizda', 'imiz', 'ingiz', 'ining', 'sining', 'ning', 'idan', 'sidan', 'dan', 'tan', 'ida', 'sida', 'da', 'ta', 'ini', 'sini', 'ni', 'iga', 'siga', 'ga', 'ka', 'qa', 'im', 'ing', 'si', 'i', 'lik', 'chi']

UR_PREFIXES = ['ال', 'تش', 'دس', 'تذ', 'نا', 'اص', 'تا', 'عش']
UR_SUFFIXES = ['ویں', 'ئیں', 'یاں', 'اتے', 'اتی', 'ہىے', 'وے', 'وں']
UR_RULE2 = frozenset(['ا', 'ت', 'ط', 'ی', 'ں', 'ئ', 'ؤ', 'ء'])
UR_RULE3 = frozenset(['ا', 'ی', 'ں', 'ئ', 'ؤ', 'ء', 'و'])

# UrduNormalizer: presentation form → canonical (multi-char targets
# allowed, tatweel deletes); diacritics stripped from every output
UR_CHAR_MAP = {'ﺁ': 'آ', 'ﺂ': 'آ', 'ﺃ': 'أ', 'ﺍ': 'ا', 'ﺎ': 'ا', 'ﺏ': 'ب', 'ﺐ': 'ب', 'ﺑ': 'ب', 'ﺒ': 'ب', 'ﭖ': 'پ', 'ﭘ': 'پ', 'ﭙ': 'پ', 'ﺕ': 'ت', 'ﺖ': 'ت', 'ﺗ': 'ت', 'ﺘ': 'ت', 'ﭦ': 'ٹ', 'ﭧ': 'ٹ', 'ﭨ': 'ٹ', 'ﭩ': 'ٹ', 'ﺛ': 'ث', 'ﺜ': 'ث', 'ﺚ': 'ث', 'ﺝ': 'ج', 'ﺞ': 'ج', 'ﺟ': 'ج', 'ﺠ': 'ج', 'ﺡ': 'ح', 'ﺣ': 'ح', 'ﺤ': 'ح', 'ﺢ': 'ح', 'ﺧ': 'خ', 'ﺨ': 'خ', 'ﺦ': 'خ', 'ﺩ': 'د', 'ﺪ': 'د', 'ﺬ': 'ذ', 'ﺫ': 'ذ', 'ﺭ': 'ر', 'ﺮ': 'ر', 'ﺯ': 'ز', 'ﺰ': 'ز', 'ﺱ': 'س', 'ﺲ': 'س', 'ﺳ': 'س', 'ﺴ': 'س', 'ﺵ': 'ش', 'ﺶ': 'ش', 'ﺷ': 'ش', 'ﺸ': 'ش', 'ﺹ': 'ص', 'ﺺ': 'ص', 'ﺻ': 'ص', 'ﺼ': 'ص', 'ﺽ': 'ض', 'ﺾ': 'ض', 'ﺿ': 'ض', 'ﻀ': 'ض', 'ﻃ': 'ط', 'ﻄ': 'ط', 'ﻅ': 'ظ', 'ﻇ': 'ظ', 'ﻈ': 'ظ', 'ﻉ': 'ع', 'ﻊ': 'ع', 'ﻋ': 'ع', 'ﻌ': 'ع', 'ﻍ': 'غ', 'ﻏ': 'غ', 'ﻐ': 'غ', 'ﻑ': 'ف', 'ﻒ': 'ف', 'ﻓ': 'ف', 'ﻔ': 'ف', 'ﻕ': 'ق', 'ﻖ': 'ق', 'ﻗ': 'ق', 'ﻘ': 'ق', 'ﻝ': 'ل', 'ﻞ': 'ل', 'ﻟ': 'ل', 'ﻠ': 'ل', 'ﻡ': 'م', 'ﻢ': 'م', 'ﻣ': 'م', 'ﻤ': 'م', 'ﻥ': 'ن', 'ﻦ': 'ن', 'ﻧ': 'ن', 'ﻨ': 'ن', 'ﭺ': 'چ', 'ﭻ': 'چ', 'ﭼ': 'چ', 'ﭽ': 'چ', 'ﮈ': 'ڈ', 'ﮉ': 'ڈ', 'ﮍ': 'ڑ', 'ﮌ': 'ڑ', 'ﮋ': 'ژ', 'ﮎ': 'ک', 'ﮏ': 'ک', 'ﮐ': 'ک', 'ﮑ': 'ک', 'ﻛ': 'ک', 'ك': 'ک', 'ﮒ': 'گ', 'ﮓ': 'گ', 'ﮔ': 'گ', 'ﮕ': 'گ', 'ﮞ': 'ں', 'ﮟ': 'ں', 'ﻮ': 'و', 'ﻭ': 'و', 'ﺅ': 'ؤ', 'ﮪ': 'ھ', 'ﮬ': 'ھ', 'ﮭ': 'ھ', 'ﻬ': 'ھ', 'ﻫ': 'ھ', 'ﮫ': 'ھ', 'ﻩ': 'ہ', 'ﮦ': 'ہ', 'ﻪ': 'ہ', 'ﮧ': 'ہ', 'ﮩ': 'ہ', 'ﮨ': 'ہ', 'ه': 'ہ', 'ة': 'ۃ', 'ﺀ': 'ء', 'ﯼ': 'ی', 'ى': 'ی', 'ﯽ': 'ی', 'ﻰ': 'ی', 'ﻱ': 'ی', 'ﻲ': 'ی', 'ﯾ': 'ی', 'ﯿ': 'ی', 'ي': 'ی', 'ﺋ': 'ئ', 'ﺌ': 'ئ', 'ﮮ': 'ے', 'ﮯ': 'ے', 'ﻳ': 'ے', 'ﻴ': 'ے', '٠': '۰', '١': '۱', '٢': '۲', '٣': '۳', '٤': '۴', '٥': '۵', '٦': '۶', '٧': '۷', '٨': '۸', '٩': '۹', 'ﻻ': 'لا', 'ﻼ': 'لا', 'ـ': ''}
UR_DIACRITICS = frozenset('ًٌٍؘَؙُؚِّْٰٕٖٜٟۣؐؑؒؓؔؕؖؗٓٔٗ٘ٙٚٛٝٞۖۗۘۙۚۛۜ۟۠ۡۢۤۥۦ۪ۭۧۨ۫۬')
UR_COMBOS = {'آ': 'آ', 'أ': 'أ', 'ۓ': 'ۓ'}

_HT_TRANS = str.maketrans(dict(_LATIN_CORE))
_UZ_MAP = dict(_LATIN_CORE) | {
    "ʻ": "'", "ʽ": "'",
    "ś": "s", "ŝ": "s", "ş": "s", "š": "s",
}


def belarusian_normalize(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        nx = s[i + 1] if i + 1 < n else ""
        if c == "у" and nx == "\u0306":
            out.append("ў")
            i += 2
            continue
        if c == "е" and nx == "\u0308":
            out.append("ё")
            i += 2
            continue
        if c == "и":
            c = "і"
        elif c in "’‘‛ʹʼ`´":
            c = "'"
        elif c in "‐‑‒–—―":
            c = "-"
        out.append(c)
        i += 1
    return "".join(out)


def belarusian_stem(w: str) -> str:
    if len(w) <= 4:
        return w
    for sfx in BE_SUFFIXES:
        if len(w) >= len(sfx) + 4 and w.endswith(sfx):
            return w[:len(w) - len(sfx)]
    return w


def haitian_normalize(tok: str) -> str:
    t = tok.translate(_HT_TRANS)
    for p in HT_PREFIX_CLITICS:
        if len(t) > len(p) + 1 and t.startswith(p):
            return t[len(p):]
    for sfx in HT_SUFFIX_CLITICS:
        if len(t) > len(sfx) + 1 and t.endswith(sfx):
            return t[:len(t) - len(sfx)]
    return t


def haitian_stem(w: str) -> str:
    if len(w) <= 4:
        return w
    if len(w) > 6 and w.endswith("man"):
        return w[:-3]
    return w


def uzbek_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    for _ in range(3):
        for sfx in UZ_SUFFIXES:
            if len(w) >= len(sfx) + 2 and w.endswith(sfx):
                w = w[:len(w) - len(sfx)]
                break
        else:
            break
    return w


def urdu_normalize(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        pair = s[i:i + 2]
        if pair in UR_COMBOS:
            out.extend(c for c in UR_COMBOS[pair]
                       if c not in UR_DIACRITICS)
            i += 2
            continue
        c = s[i]
        repl = UR_CHAR_MAP.get(c)
        if repl is not None:
            out.extend(ch for ch in repl if ch not in UR_DIACRITICS)
        elif c not in UR_DIACRITICS:
            out.append(c)
        i += 1
    return "".join(out)


def urdu_stem(w: str) -> str:
    if len(w) <= 3:
        return w
    for p in UR_PREFIXES:
        if len(w) > len(p) + 2 and w.startswith(p):
            w = w[len(p):]
            break
    if w:
        if w[0] == "ا":
            if len(w) == 5 and w[1] == "ت":
                w = "".join(c for c in w if c not in UR_RULE3)
            elif len(w) == 5:
                w = w.replace("ا", "")
            elif len(w) > 5:
                w = "".join(c for c in w if c not in UR_RULE2)
        elif len(w) == 5 and w[0] == "م" and w[-2] == "و":
            w = w.replace("م", "").replace("و", "")
    for sfx in UR_SUFFIXES:
        if len(w) > len(sfx) + 2 and w.endswith(sfx):
            return w[:len(w) - len(sfx)]
    return w


class BelarusianAnalyzer(_ExtraAnalyzer):
    name = "belarusian"
    stop_words = BELARUSIAN_STOP_WORDS
    norm_map = {}

    def __init__(self):
        super().__init__()
        self.elide = lambda tok: belarusian_normalize(fold_digits(tok))

    def _stem(self, tok: str) -> str:
        return belarusian_stem(tok)


class HaitianAnalyzer(_ExtraAnalyzer):
    name = "haitian"
    stop_words = HAITIAN_STOP_WORDS
    norm_map = {}

    def __init__(self):
        super().__init__()
        self.elide = lambda tok: haitian_normalize(fold_digits(tok))

    def _stem(self, tok: str) -> str:
        return haitian_stem(tok)


class UzbekAnalyzer(_ExtraAnalyzer):
    name = "uzbek"
    stop_words = UZBEK_STOP_WORDS
    norm_map = _UZ_MAP

    def __init__(self):
        super().__init__()
        self.elide = self._pre

    def _stem(self, tok: str) -> str:
        return uzbek_stem(tok)


class UrduAnalyzer(_ExtraAnalyzer):
    name = "urdu"
    stop_words = URDU_STOP_WORDS
    norm_map = {}

    def __init__(self):
        super().__init__()
        self.elide = lambda tok: urdu_normalize(fold_digits(tok))

    def _stem(self, tok: str) -> str:
        return urdu_stem(tok)
