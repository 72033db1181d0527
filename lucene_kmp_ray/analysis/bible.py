"""Bible-text analyzer family — the reference's own custom ("ct")
analyzer compositions: each wraps a base language chain with a
sacred-name canonicalization step so every declension / compound /
orthographic variant of "Jesus" and "Christ" retrieves the same verses.

Reference sources (17 chains):

- ``analysis/common/.../{bn,de,en,es,hi,ne,pt,ru,sv,ta,te}/ct/Bible*Analyzer.kt``
- ``analysis/extra/.../{mr,tl,vi}/ct/Bible*Analyzer.kt``
- ``analysis/kuromoji/.../ja/ct/BibleJapaneseAnalyzer.kt``
- ``analysis/nori/.../ko/ct/BibleKoreanAnalyzer.kt``
- ``analysis/morfologik/.../uk/ct/BibleUkrainianAnalyzer.kt``

Three mechanism families appear (all token-local, so each chain is a
per-unique-token ``expand`` over the standard tokenizer — vectorized via
dictionary-encode exactly like SynonymAnalyzer in filters.py):

1. **Stacked canonical** (de, sv, ru, uk, bn, te, es, ta, tl): a matched
   variant emits the original, then the canonical form(s) at posInc 0
   (``captureState``/``restoreState`` in the reference). Some chains
   keyword-mark both (ru/uk/bn/te/ta — later stemmer skips them), some
   let the stemmer run over both (de/sv/es/tl).
2. **In-place replace** (en "wept"→"weep", mr prefix canonicalization,
   vi compound split): the token is rewritten before stemming.
3. **Char-filter rewrites** (ja term map + CJK width, mr term map,
   ne ZWJ/ZWNJ strip, uk apostrophe map): applied before tokenization.

Conformance vectors: every assertAnalyzesTo from the reference's
TestBible*Analyzer.kt files is asserted in tests/test_bible_analyzers.py,
including the posInc-0 stacking order.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .arabic import fold_digits
from .expand import ExpandAnalyzer
from .standard import ENGLISH_STOP_WORDS, tokenize


# ---------------------------------------------------------------------------
# shared machinery
# ---------------------------------------------------------------------------

def _per_doc_flat(analyzer, texts):
    """analyze_flat from per-doc ``__call__`` (JA/KO/VI/UK bases are
    per-doc already; Bible wrappers keep their shape)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    doc_lengths = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    doc_of_l: list[int] = []
    pos_l: list[int] = []
    for i, text in enumerate(texts):
        toks = analyzer(text or "")
        flat.extend(toks)
        doc_of_l.extend([i] * len(toks))
        pos_l.extend(range(len(toks)))
        doc_lengths[i] = len(toks)
    return (doc_lengths, pa.array(flat, pa.string()),
            np.array(doc_of_l, dtype=np.int64),
            np.array(pos_l, dtype=np.int64))


class _BibleStdAnalyzer(ExpandAnalyzer):
    """Standard-tokenizer Bible chain: optional char prefilter, then a
    token-local ``expand(tok)`` covering the whole post-tokenizer
    filter stack (stop / canon / keyword / stem) — see ExpandAnalyzer
    in expand.py for the vectorized machinery."""

    name = "bible"


# ---------------------------------------------------------------------------
# English — en/ct/BibleEnglishAnalyzer.kt: possessive → lower → stop →
# IrregularVerbFilter("wept"→"weep", emitOriginal=false) → Porter.
# ---------------------------------------------------------------------------

class BibleEnglishAnalyzer(_BibleStdAnalyzer):
    name = "bible_english"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .porter import porter_stem
        if tok.endswith("'s") or tok.endswith("’s"):
            tok = tok[:-2]
        if not tok or tok in ENGLISH_STOP_WORDS:
            return ()
        if tok == "wept":  # BibleEnglishIrregularVerbFilter (replace)
            tok = "weep"
        return (porter_stem(tok),)


# ---------------------------------------------------------------------------
# German — de/ct/BibleGermanAnalyzer.kt: lower → stop → canon(stack) →
# GermanNormalization → GermanLightStem (stemmer runs over BOTH).
# ---------------------------------------------------------------------------

_DE_CANON = {"jesu": "jesus", "jesum": "jesus", "jesus": "jesus",
             "christi": "christus", "christo": "christus",
             "christum": "christus", "christus": "christus"}


class BibleGermanAnalyzer(_BibleStdAnalyzer):
    name = "bible_german"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .german import (GERMAN_STOP_WORDS, german_light_stem,
                             german_normalize)
        if tok in GERMAN_STOP_WORDS:
            return ()
        canon = _DE_CANON.get(tok)
        outs = [tok] if canon is None or canon == tok else [tok, canon]
        return tuple(german_light_stem(german_normalize(t)) for t in outs)


# ---------------------------------------------------------------------------
# Spanish — es/ct/BibleSpanishAnalyzer.kt: lower → stop →
# Jesucristo split (stack "jesus","cristo") → SpanishLightStem.
# ---------------------------------------------------------------------------

class BibleSpanishAnalyzer(_BibleStdAnalyzer):
    name = "bible_spanish"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .romance import SPANISH_STOP_WORDS, spanish_light_stem
        if tok in SPANISH_STOP_WORDS:
            return ()
        outs = [tok, "jesus", "cristo"] if tok == "jesucristo" else [tok]
        return tuple(spanish_light_stem(t) for t in outs)


# ---------------------------------------------------------------------------
# Portuguese — pt/ct/BiblePortugueseAnalyzer.kt: lower → stop →
# SetKeywordMarker{jesus,cristo} → PortugueseLightStem.
# ---------------------------------------------------------------------------

class BiblePortugueseAnalyzer(_BibleStdAnalyzer):
    name = "bible_portuguese"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .romance import PORTUGUESE_STOP_WORDS, portuguese_light_stem
        if tok in PORTUGUESE_STOP_WORDS:
            return ()
        if tok in ("jesus", "cristo"):  # keyword-marked, stem skipped
            return (tok,)
        return (portuguese_light_stem(tok),)


# ---------------------------------------------------------------------------
# Swedish — sv/ct/BibleSwedishAnalyzer.kt: lower → stop → canon(stack,
# no keyword) → snowball Swedish (identity on all four name forms).
# ---------------------------------------------------------------------------

_SV_CANON = {"jesu": "jesus", "jesus": "jesus",
             "kristi": "kristus", "kristus": "kristus"}
SV_NT_SCOPE_FORMS = frozenset(_SV_CANON)


class BibleSwedishAnalyzer(_BibleStdAnalyzer):
    name = "bible_swedish"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .nordic import SWEDISH_STOP_WORDS, swedish_stem
        if tok in SWEDISH_STOP_WORDS:
            return ()
        canon = _SV_CANON.get(tok)
        outs = [tok] if canon is None or canon == tok else [tok, canon]
        return tuple(swedish_stem(t) for t in outs)


# ---------------------------------------------------------------------------
# Russian — ru/ct/BibleRussianAnalyzer.kt: lower → stop → name-form
# filter (stack canonical, keyword-mark BOTH) → snowball Russian
# (skipped for keyword-marked forms).
# ---------------------------------------------------------------------------

RU_CANON = {"иисус": "иисус", "иисуса": "иисус", "иисусу": "иисус",
            "иисусом": "иисус", "иисусе": "иисус",
            "христос": "христос", "христа": "христос",
            "христу": "христос", "христом": "христос",
            "христе": "христос", "христова": "христос",
            "христов": "христос", "христовы": "христос"}
_RU_JOSHUA = frozenset(
    ("навин", "навина", "навину", "навином", "навине"))


class BibleRussianAnalyzer(_BibleStdAnalyzer):
    name = "bible_russian"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .russian import RUSSIAN_STOP_WORDS, russian_stem
        if tok in RUSSIAN_STOP_WORDS:
            return ()
        canon = RU_CANON.get(tok)
        if canon is not None:  # keyword-marked: stemmer skipped
            return (tok,) if canon == tok else (tok, canon)
        return (russian_stem(tok),)


_LETTER_RUN = re.compile(r"[^\W\d_]+", re.UNICODE)


def _word_tokens(text: str) -> list[str]:
    return _LETTER_RUN.findall(text.lower())


def ru_requires_new_testament_scope(text: str) -> bool:
    """BibleRussianAnalyzer.requiresNewTestamentScope: a Jesus/Christ
    form present AND no Joshua ("Навин") context token."""
    toks = _word_tokens(text)
    if any(t in _RU_JOSHUA for t in toks):
        return False
    return any(t in RU_CANON for t in toks)


def sv_requires_new_testament_scope(text: str) -> bool:
    return any(t in SV_NT_SCOPE_FORMS for t in _word_tokens(text))


# ---------------------------------------------------------------------------
# Hindi — hi/ct/BibleHindiAnalyzer.kt: lower → decimal →
# SetKeywordMarker{यीशु, मसीह} (BEFORE the norm filters; Hindi norm and
# stem are keyword-gated, Indic norm is NOT) → IndicNorm → HindiNorm →
# stop → HindiStem.
# ---------------------------------------------------------------------------

_HI_NAME_FORMS = frozenset(("यीशु", "मसीह"))


class BibleHindiAnalyzer(_BibleStdAnalyzer):
    name = "bible_hindi"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .indic import (HINDI_STOP_WORDS, hindi_normalize, hindi_stem,
                            indic_normalize)
        t = fold_digits(tok)
        if t in _HI_NAME_FORMS:
            t = indic_normalize(t)  # not keyword-gated in the reference
            return () if t in HINDI_STOP_WORDS else (t,)
        t = hindi_normalize(indic_normalize(t))
        if t in HINDI_STOP_WORDS:
            return ()
        return (hindi_stem(t),)


# ---------------------------------------------------------------------------
# Bengali — bn/ct/BibleBengaliAnalyzer.kt: lower → decimal → IndicNorm →
# BengaliNorm → JesusChrist canon (stack, keyword BOTH) → stop →
# BengaliStem (keyword-gated).
# ---------------------------------------------------------------------------

_BN_CANON = {"যিসু": "যিসু", "যিসুর": "যিসু", "যিসুকে": "যিসু",
             "খ্রিস্ট": "খ্রিস্ট", "খ্রিস্টের": "খ্রিস্ট",
             "খ্রিস্টকে": "খ্রিস্ট"}


class BibleBengaliAnalyzer(_BibleStdAnalyzer):
    name = "bible_bengali"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .indic import BENGALI_STOP_WORDS, _bn_pre, bengali_stem
        t = _bn_pre(tok)
        canon = _BN_CANON.get(t)
        if canon is not None:  # keyword: stop still applies, stem skipped
            outs = (t,) if canon == t else (t, canon)
            return tuple(o for o in outs if o not in BENGALI_STOP_WORDS)
        if t in BENGALI_STOP_WORDS:
            return ()
        return (bengali_stem(t),)


# ---------------------------------------------------------------------------
# Telugu — te/ct/BibleTeluguAnalyzer.kt (NO lowercase in the chain):
# decimal → IndicNorm → TeluguNorm → canon (stack, keyword BOTH) →
# SetKeywordMarker → stop → TeluguStem (keyword-gated).
# ---------------------------------------------------------------------------

_TE_CANON = {"యెసు": "యెసు", "క్రిస్త": "క్రిస్త",
             "క్రిస్తులొ": "క్రిస్త", "క్రిస్తుతొను": "క్రిస్త"}


class BibleTeluguAnalyzer(_BibleStdAnalyzer):
    name = "bible_telugu"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .indic import TELUGU_STOP_WORDS, _te_pre, telugu_stem
        t = _te_pre(tok)
        canon = _TE_CANON.get(t)
        if canon is not None:
            outs = (t,) if canon == t else (t, canon)
            return tuple(o for o in outs if o not in TELUGU_STOP_WORDS)
        if t in TELUGU_STOP_WORDS:
            return ()
        return (telugu_stem(t),)


# ---------------------------------------------------------------------------
# Tamil — ta/ct/BibleTamilAnalyzer.kt: lower → decimal → IndicNorm →
# JesusChrist filter → SetKeywordMarker{compound} → stop → snowball
# Tamil (keyword-gated). Compound forms stack [original, compound,
# jesus, christ]; bare jesus/christ and near-truncations (missing ≤2
# trailing chars) are keyword-marked without stacking.
# ---------------------------------------------------------------------------

_TA_JESUS_CHRIST = "இயேசுகிறிஸ்து"
_TA_JESUS = "இயேசு"
_TA_CHRIST = "கிறிஸ்து"


class BibleTamilAnalyzer(_BibleStdAnalyzer):
    name = "bible_tamil"

    def expand(self, tok: str) -> tuple[str, ...]:
        from .indic import indic_normalize
        from .tamil import TAMIL_STOP_WORDS, tamil_stem
        t = indic_normalize(fold_digits(tok))
        if t in (_TA_JESUS, _TA_CHRIST):
            return () if t in TAMIL_STOP_WORDS else (t,)
        outs: tuple[str, ...] | None = None
        if t.startswith(_TA_JESUS_CHRIST):  # compound / inflected
            outs = ((t,) if t == _TA_JESUS_CHRIST
                    else (t, _TA_JESUS_CHRIST))
            outs = outs + (_TA_JESUS, _TA_CHRIST)
        elif (len(t) >= len(_TA_JESUS_CHRIST) - 2
                and _TA_JESUS_CHRIST.startswith(t)):
            outs = (t,)  # truncation: keyword-marked, no stack
        if outs is not None:
            return tuple(o for o in outs if o not in TAMIL_STOP_WORDS)
        if t in TAMIL_STOP_WORDS:
            return ()
        return (tamil_stem(t),)


# ---------------------------------------------------------------------------
# Nepali — ne/ct/BibleNepaliAnalyzer.kt: MappingCharFilter strips
# ZWJ/ZWNJ pre-tokenization, then the plain Nepali chain (lower →
# decimal → IndicNorm → stop → snowball Nepali).
# ---------------------------------------------------------------------------

class BibleNepaliAnalyzer(_BibleStdAnalyzer):
    name = "bible_nepali"
    _has_prefilter = True

    def prefilter(self, text: str) -> str:
        return text.replace("‌", "").replace("‍", "")

    def expand(self, tok: str) -> tuple[str, ...]:
        from .nepali import NEPALI_STOP_WORDS, _ne_pre, nepali_stem
        t = _ne_pre(tok)
        if t in NEPALI_STOP_WORDS:
            return ()
        return (nepali_stem(t),)


# ---------------------------------------------------------------------------
# Marathi — extra/.../mr/ct/BibleMarathiAnalyzer.kt: MappingCharFilter
# ("ख्रिस्त येशू"→"येशू ख्रिस्त", "ख्रिस्ताचा"→"ख्रिस्त"), then lower →
# decimal → IndicNorm → MarathiNorm → stop → prefix canonicalization
# (in-place replace) → MarathiStem.
# ---------------------------------------------------------------------------

_MR_MAP = re.compile("ख्रिस्त येशू|ख्रिस्ताचा")
_MR_REPL = {"ख्रिस्त येशू": "येशू ख्रिस्त", "ख्रिस्ताचा": "ख्रिस्त"}


def _mr_should_jesus(t: str) -> bool:
    return ((t.startswith("येशू") and not t.startswith("येशूवा"))
            or (t.startswith("येशु") and not t.startswith("येशुवा")))


def _mr_should_christ(t: str) -> bool:
    return ((t.startswith("ख्रिस्त")
             and not t.startswith("ख्रिस्तविरोध")
             and not t.startswith("ख्रिस्ती"))
            or (t.startswith("खरिसत")
                and not t.startswith("खरिसतविरोध")))


class BibleMarathiAnalyzer(_BibleStdAnalyzer):
    name = "bible_marathi"
    _has_prefilter = True

    def prefilter(self, text: str) -> str:
        return _MR_MAP.sub(lambda m: _MR_REPL[m.group(0)], text)

    def expand(self, tok: str) -> tuple[str, ...]:
        from .indic import indic_normalize
        from .indic_extra import (MARATHI_STOP_WORDS, marathi_normalize,
                                  marathi_stem)
        t = marathi_normalize(indic_normalize(fold_digits(tok)))
        if t in MARATHI_STOP_WORDS:
            return ()
        if _mr_should_jesus(t):
            t = "येशु"
        elif _mr_should_christ(t):
            t = "खरिसत"
        return (marathi_stem(t),)


# ---------------------------------------------------------------------------
# Tagalog — extra/.../tl/ct/BibleTagalogAnalyzer.kt: lower → decimal →
# TagalogNorm → stop → Jesucristo split (stack, no keyword) →
# TagalogStem (identity on all three forms).
# ---------------------------------------------------------------------------

class BibleTagalogAnalyzer(_BibleStdAnalyzer):
    name = "bible_tagalog"

    def __init__(self):
        from .philippine import TagalogAnalyzer
        self._base = TagalogAnalyzer()

    def expand(self, tok: str) -> tuple[str, ...]:
        from .philippine import tagalog_stem
        t = self._base._pre(tok)
        if t in self._base.stop_set:
            return ()
        outs = (t, "jesus", "cristo") if t == "jesucristo" else (t,)
        return tuple(tagalog_stem(o) for o in outs)


# ---------------------------------------------------------------------------
# Vietnamese — extra/.../vi/ct/BibleVietnameseAnalyzer.kt: the bigram
# tokenizer → stop → diacritic fold → JesusChrist filter (compound
# "jesus christ" REPLACED by "jesus" + "christ" at posInc 1; bigrams
# containing jesus/christ as a whole word stack the bare name at
# posInc 0) → stem (no-op). Per-doc because the compound split shifts
# following positions, exactly like the reference's posInc stream.
# ---------------------------------------------------------------------------

class BibleVietnameseAnalyzer:
    name = "bible_vietnamese"

    def __init__(self):
        from .vietnamese import VIETNAMESE_STOP_WORDS
        self.stop_set = frozenset(VIETNAMESE_STOP_WORDS)

    def _tokens_pos(self, text: str) -> list[tuple[str, int]]:
        from .vietnamese import vietnamese_normalize, vietnamese_tokenize
        out: list[tuple[str, int]] = []
        shift = 0
        for p, raw in enumerate(vietnamese_tokenize(text or "")):
            if raw in self.stop_set:
                continue
            tok = vietnamese_normalize(raw)
            if tok == "jesus christ":
                out.append(("jesus", p + shift))
                shift += 1
                out.append(("christ", p + shift))
                continue
            out.append((tok, p + shift))
            for target in ("jesus", "christ"):
                if tok != target and target in tok.split(" "):
                    out.append((target, p + shift))
        return out

    def __call__(self, text: str) -> list[str]:
        return [t for t, _ in self._tokens_pos(text)]

    def analyze_flat(self, texts):
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            tp = self._tokens_pos(text or "")
            flat.extend(t for t, _ in tp)
            pos_l.extend(p for _, p in tp)
            doc_of_l.extend([i] * len(tp))
            doc_lengths[i] = len(tp)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))


# ---------------------------------------------------------------------------
# Japanese — kuromoji/.../ja/ct/BibleJapaneseAnalyzer.kt: CJKWidth char
# filter + biblical-term MappingCharFilter before the standard kuromoji
# chain (baseform → POS stop → stop → katakana stem → lower). The five
# term rewrites are plain longest-match string substitutions whose
# outputs never re-match another pattern.
# ---------------------------------------------------------------------------

_JA_TERM_MAP = {
    "キリスト・イエス": "イエス・キリスト",
    "シモン・バルヨナ": "バルヨナ・シモン",
    "イスカリオテ・ユダ": "イスカリオテのユダ",
    "天の御国": "天の国",
    "聖なる所": "聖所",
}
_JA_TERM_RE = re.compile("|".join(map(re.escape, _JA_TERM_MAP)))


class BibleJapaneseAnalyzer:
    name = "bible_japanese"

    def __init__(self):
        from .japanese import JapaneseAnalyzer
        self._base = JapaneseAnalyzer()

    def _pre(self, text: str) -> str:
        from .cjk import cjk_width_fold
        folded = cjk_width_fold(text or "")
        return _JA_TERM_RE.sub(lambda m: _JA_TERM_MAP[m.group(0)], folded)

    def __call__(self, text: str) -> list[str]:
        return self._base(self._pre(text))

    def analyze_flat(self, texts):
        return _per_doc_flat(self, texts)


# ---------------------------------------------------------------------------
# Korean — nori/.../ko/ct/BibleKoreanAnalyzer.kt: KoreanTokenizer with a
# Bible user dictionary ("예수아", "그리스도") → POS stop → reading form
# → lower → stop {"의"}.
# ---------------------------------------------------------------------------

class BibleKoreanAnalyzer:
    name = "bible_korean"

    def __init__(self):
        from .korean import KO_STOP_TAGS, KoreanTokenizer
        self.tokenizer = KoreanTokenizer(
            mode="discard", user_dict="예수아\n그리스도")
        self.stop_tags = KO_STOP_TAGS
        self.stop_words = frozenset(("의",))

    def __call__(self, text: str) -> list[str]:
        out = []
        for tok in self.tokenizer.tokenize(text or ""):
            if tok.tag in self.stop_tags:  # KoreanPartOfSpeechStopFilter
                continue
            term = (tok.reading or tok.surface).lower()
            if term in self.stop_words:
                continue
            out.append(term)
        return out

    def analyze_flat(self, texts):
        return _per_doc_flat(self, texts)


# ---------------------------------------------------------------------------
# Ukrainian — morfologik/.../uk/ct/BibleUkrainianAnalyzer.kt: the base
# char normalization + stop, then the name-form filter (stack canonical,
# keyword BOTH so the morfologik lemmatizer is skipped), then the
# morfologik lemma fan-out for everything else.
# ---------------------------------------------------------------------------

UK_CANON = {"ісус": "ісус", "ісуса": "ісус", "ісусу": "ісус",
            "ісусом": "ісус", "ісусі": "ісус", "ісусов": "ісус",
            "ісусового": "ісус", "ісусовому": "ісус",
            "христос": "христос", "христа": "христос",
            "христу": "христос", "христом": "христос",
            "христі": "христос", "христов": "христос",
            "христового": "христос", "христовому": "христос"}
_UK_JOSHUA_PREFIX = "навин"


def uk_requires_new_testament_scope(text: str) -> bool:
    toks = _word_tokens(text)
    if any(t.startswith(_UK_JOSHUA_PREFIX) for t in toks):
        return False
    return any(t in UK_CANON for t in toks)


class BibleUkrainianAnalyzer:
    name = "bible_ukrainian"

    def __init__(self):
        from .ukrainian import UkrainianAnalyzer
        self._base = UkrainianAnalyzer()

    def __call__(self, text: str) -> list[str]:
        from .ukrainian import normalize
        out: list[str] = []
        for t in tokenize(normalize(text)):
            if t in self._base.stop_set:
                continue
            canon = UK_CANON.get(t)
            if canon is not None:  # keyword: morfologik skipped
                out.append(t)
                if canon != t:
                    out.append(canon)
            else:
                out.extend(self._base.lexicon.get(t, (t,)))
        return out

    def analyze_flat(self, texts):
        return _per_doc_flat(self, texts)


BIBLE_ANALYZERS = {
    "en": BibleEnglishAnalyzer,
    "de": BibleGermanAnalyzer,
    "es": BibleSpanishAnalyzer,
    "pt": BiblePortugueseAnalyzer,
    "sv": BibleSwedishAnalyzer,
    "ru": BibleRussianAnalyzer,
    "hi": BibleHindiAnalyzer,
    "bn": BibleBengaliAnalyzer,
    "te": BibleTeluguAnalyzer,
    "ta": BibleTamilAnalyzer,
    "ne": BibleNepaliAnalyzer,
    "mr": BibleMarathiAnalyzer,
    "tl": BibleTagalogAnalyzer,
    "vi": BibleVietnameseAnalyzer,
    "ja": BibleJapaneseAnalyzer,
    "ko": BibleKoreanAnalyzer,
    "uk": BibleUkrainianAnalyzer,
}
