"""Nepali analysis chain (snowball NepaliStemmer).

Reference chain (``/root/reference/analysis/common/.../ne/NepaliAnalyzer.kt``):
StandardTokenizer → LowerCase → DecimalDigit → IndicNormalization →
Stop → SnowballFilter(NepaliStemmer).

The stemmer (``tartarus/snowball/ext/NepaliStemmer.kt``, generated from
the published snowball Nepali script):

1. *category 1* — longest matching case marker: most delete outright;
   का/कि/की/कै/को delete only when NOT preceded by ए or े;
2. loop: *category 2* — a final ँ/ं deletes after यौ/छौ/नौ/थे, a final
   ै deletes after त्र (the deletion persists even when the loop then
   stops); *category 3* — longest matching verb/suffix from the big
   table; the loop continues only while category 3 keeps matching.

The oracle mirror (``oracle.bm25_nepali_topk``) runs the same loop as a
recursive CTE, GENERATED from the same tables.  Vectors from
TestNepaliAnalyzer.kt live in tests/test_nepali_analyzer.py.
"""

from __future__ import annotations

from .arabic import fold_digits
from .indic import indic_normalize
from .romance import _RomanceAnalyzer

NEPALI_STOP_WORDS = frozenset("""
अक्सर अगाडी अझै अनुसार अन्तर्गत अन्य अन्यत्र अन्यथा अब अरु अरुलाई अर्को अर्थात अर्थात् अलग आए आजको आत्म आदि आफू आफूलाई आफ्नै आफ्नो आयो उदाहरण उनको उनले उप उहालाई एउटै एक एकदम ओठ औं कतै कम कसरी कसै कसैले कहाँबाट कहिलेकाहीं का कि किन किनभने कुनै कुरा कृपया के केही को कोही क्रमशः गए गयौ गरि गरी गरेका गरेको गरेर गरौं गर्छ गर्छु गर्दै गर्न गर्नु गर्नुपर्छ गर्ने गैर चार चाले चाहनुहुन्छ चाहन्छु चाहिए छ छन् छु छू छैन छौं जताततै जब जबकि जसको जसबाट जसमा जसलाई जसले जस्तै जस्तो जस्तोसुकै जहाँ जान जाहिर जुन जे जो ठीक त तत्काल तथा तदनुसार तपाई तपाईको तर तल तापनी तिनिहरुलाई तिनी तिनीहरुको तिनीहरू तिमी तिर ती तीन तुरुन्तै तेस्कारण तेस्रो त्यहाँ त्यो त्सपछि त्सैले थिए थिएन थियो दिए दिनुभएको दिनुहुन्छ दुई देखि देखिन्छ देखियो देखे देखेको देखेर दोस्रो धेरै न नजिकै नत्र नयाँ नि निम्ति निम्न निम्नानुसार निर्दिष्ट नै नौ पक्का पक्कै पछि पछिल्लो पटक पनि पर्छ पर्थ्यो पर्याप्त पहिले पहिलो पहिल्यै पाँच पाँचौं पूर्व प्रति प्रतेक प्लस फेरी बने बरु बारे बाहिर बाहेक बिरुद्ध बिशेष बीच बीचमा भए भएको भन भने भन् भन्छन् भन्छु भन्दा भन्नुभयो भन्ने भर भित्र भित्री म मलाई मा मात्र माथि मुख्य मेरो यति यथोचित यदि यद्यपि यस यसको यसपछि यसबाहेक यसरी यसो यस्तो यहाँ यहाँसम्म या यी यो र रही रहेका रहेको राखे राख्छ राम्रो रूप लगभग लाई लागि ले वरीपरी वास्तवमा शायद संग संगै सक्छ सट्टा सधै सबै सबैलाई समय सम्भव सम्म सही साँच्चै सात साथ साथै सायद सारा से सो सोही स्पष्ट हरे हरेक हुन हुने हुन् हुन्छ हो
""".split())

# snowball a_0 (longest-first): (suffix, action) — action 2 = the
# ए/े-guarded deletion
NE_CAT1 = [('मार्फत', 1), ('द्वारा', 1), ('सँगै', 1), ('लाइ', 1), ('लाई', 1), ('सँग', 1), ('संग', 1), ('पछि', 1), ('रत', 1), ('का', 2), ('मा', 1), ('कि', 2), ('की', 2), ('ले', 1), ('कै', 2), ('मै', 1), ('को', 2)]

# snowball a_2: final ँ/ं after यौ/छौ/नौ/थे, final ै after त्र
NE_CAT2_NASALS = ("ँ", "ं")
NE_CAT2_NASAL_CTX = ("यौ", "छौ", "नौ", "थे")
NE_CAT2_AI = "ै"
NE_CAT2_AI_CTX = "त्र"

# snowball a_3 (longest-first)
NE_CAT3 = ['हुनेछ', 'हुन्छ', 'नेछन्', 'थिइस्', 'नेछस्', 'इन्छ', 'िन्छ', 'इएका', 'िएका', 'नेका', 'देखि', 'माथि', 'इएकी', 'िएकी', 'देखी', 'नेछु', 'नेकै', 'इएको', 'िएको', 'नेको', 'थियो', 'दियो', 'थ्यो', 'नेछौ', 'थियौ', 'छ्यौ', 'थ्यौ', 'इछन्', 'एछन्', 'िछन्', 'ेछन्', 'लान्', 'छिन्', 'थिन्', 'इछस्', 'एछस्', 'िछस्', 'ेछस्', 'थिस्', 'छेस्', 'होस्', 'थिए', 'नेछ', 'एका', 'ेका', 'इदा', 'िदा', 'एकी', 'ेकी', 'एछु', 'ेछु', 'हरु', 'हरू', 'एकै', 'ेकै', 'इदै', 'िदै', 'एको', 'ेको', 'इदो', 'िदो', 'इयो', 'भयो', 'ियो', 'इछौ', 'एछौ', 'िछौ', 'ेछौ', 'छन्', 'पर्', 'इस्', 'छस्', 'िस्', 'इछ', 'एछ', 'िछ', 'ेछ', 'दा', 'थी', 'दी', 'छु', 'नु', 'छे', 'थे', 'ने', 'दै', 'दो', 'यो', 'छौ', 'यौ', 'छ']


def _cat1(w: str) -> str:
    for sfx, act in NE_CAT1:
        if w.endswith(sfx):
            base = w[:len(w) - len(sfx)]
            if act == 1:
                return base
            if not (base.endswith("ए") or base.endswith("े")):
                return base
            return w
    return w


def _cat2(w: str) -> str:
    if w.endswith(NE_CAT2_NASALS):
        if w[:-1].endswith(NE_CAT2_NASAL_CTX):
            return w[:-1]
    elif w.endswith(NE_CAT2_AI):
        if w[:-1].endswith(NE_CAT2_AI_CTX):
            return w[:-1]
    return w


def nepali_stem(w: str) -> str:
    w = _cat1(w)
    while True:
        w = _cat2(w)
        for sfx in NE_CAT3:
            if w.endswith(sfx):
                w = w[:len(w) - len(sfx)]
                break
        else:
            return w


def _ne_pre(tok: str) -> str:
    return indic_normalize(fold_digits(tok))


class NepaliAnalyzer(_RomanceAnalyzer):
    name = "nepali"
    stop_words = NEPALI_STOP_WORDS
    elide = staticmethod(_ne_pre)

    def _stem(self, tok: str) -> str:
        return nepali_stem(tok)
