"""Chinese analysis (smartcn HHMM semantics) on the real core dictionary.

Faithful port of the reference's SmartChineseAnalyzer:

- ``HHMMSegmenter`` / ``SegGraph`` / ``BiSegGraph``
  [ref: analysis/smartcn/.../hhmm/HHMMSegmenter.kt:18-140,
        hhmm/SegGraph.kt, hhmm/BiSegGraph.kt:23-140]:
  per sentence, build the token graph (dictionary hanzi words with an
  always-present single-char fallback, letter/digit runs as pseudo
  tokens 未##串/未##数, delimiters, surrogates, SENTENCE_BEGIN/END
  pseudo tokens), connect consecutive tokens with the smoothed bigram
  weight, and take the shortest path.
- ``WordSegmenter`` / ``SegTokenFilter``
  [ref: cn/smart/WordSegmenter.kt, hhmm/SegTokenFilter.kt]: pseudo
  tokens re-materialize their sentence text; fullwidth latin folds to
  halfwidth; latin lowercases; delimiters collapse to ','.
- ``SmartChineseAnalyzer`` [ref: cn/smart/SmartChineseAnalyzer.kt]:
  HMMChineseTokenizer -> PorterStemFilter -> StopFilter(punctuation
  list, which removes the ',' delimiter tokens).

The word dictionary (79,905 words with authentic ICTCLAS frequency
statistics) is decoded from the public ``coredict.mem`` the reference
distributes — see ``scripts/build_smartcn_assets.py``. The distribution
does NOT include ``bigramdict.mem``, so bigram frequencies are 0 and
the exact smoothing formula [ref: BiSegGraph.kt:36-63] degrades to its
unigram term — segmentation is driven by word frequencies alone.
Validated against the reference's own vectors
(TestSmartChineseAnalyzer.kt) in ``tests/test_chinese_analyzer.py``.

Sentence splitting approximates BreakIterator sentence rules with a
terminator-based rule (。．.!?！？; plus newlines); the HHMM pseudo
START/END tokens make segmentation insensitive to the exact boundary
placement for the covered vectors.
"""

from __future__ import annotations

import math
import os
import re
from functools import lru_cache

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# [ref: cn/smart/Utility.kt]
MAX_FREQUENCE = 2079997 + 80000
STRING_PSEUDO = "未##串"
NUMBER_PSEUDO = "未##数"
START_PSEUDO = "始##始"
END_PSEUDO = "末##末"
COMMON_DELIMITER = ","

# word types [ref: cn/smart/WordType.kt]
SENTENCE_BEGIN, SENTENCE_END, CHINESE_WORD, STRING, NUMBER, DELIMITER, \
    FULLWIDTH_STRING, FULLWIDTH_NUMBER = range(8)

# char types [ref: cn/smart/CharType.kt]
(DELIMITER_C, LETTER_C, DIGIT_C, HANZI_C, SPACE_LIKE_C, FULLWIDTH_LETTER_C,
 FULLWIDTH_DIGIT_C, OTHER_C, SURROGATE_C) = range(9)

# [ref: cn/smart/SmartChineseAnalyzer.kt DEFAULT_STOPWORD_DATA]
CN_STOP_WORDS = frozenset(list(
    ",.`-_=?'|\"(){}[]<>*#&^$@!~:;+/\\") + [
    "《", "》", "—", "－", "，", "。", "、", "：", "；", "！", "·", "？",
    "“", "”", "）", "（", "【", "】", "［", "］", "●", "　"])


def _char_type(ch: str) -> int:
    # [ref: cn/smart/Utility.kt getCharType — exact range checks]
    o = ord(ch)
    if 0xD800 <= o <= 0xDFFF:
        return SURROGATE_C
    if 0x4E00 <= o <= 0x9FA5:
        return HANZI_C
    if 0x41 <= o <= 0x5A or 0x61 <= o <= 0x7A:
        return LETTER_C
    if 0x30 <= o <= 0x39:
        return DIGIT_C
    if ch in " \t\r\n　":
        return SPACE_LIKE_C
    if 0x21 <= o <= 0xBB or 0x2010 <= o <= 0x2642 or 0x3001 <= o <= 0x301E:
        return DELIMITER_C
    if 0xFF21 <= o <= 0xFF3A or 0xFF41 <= o <= 0xFF5A:
        return FULLWIDTH_LETTER_C
    if 0xFF10 <= o <= 0xFF19:
        return FULLWIDTH_DIGIT_C
    if 0xFE30 <= o <= 0xFF63:
        return DELIMITER_C
    return OTHER_C


class _Dict:
    def __init__(self):
        d = np.load(os.path.join(_DATA_DIR, "smartcn_words.npz"),
                    allow_pickle=False)
        words = [str(w) for w in d["words"]]
        freqs = d["freqs"].tolist()
        self.freq = dict(zip(words, freqs))
        prefixes = set()
        for w in words:
            for i in range(1, len(w) + 1):
                prefixes.add(w[:i])
        self.prefix_or_word = prefixes

    def frequency(self, w: str) -> int:
        return self.freq.get(w, 0)


@lru_cache(maxsize=1)
def _dict() -> _Dict:
    return _Dict()


class SegToken:
    __slots__ = ("term", "start", "end", "word_type", "weight", "index")

    def __init__(self, term, start, end, word_type, weight):
        self.term = term
        self.start = start
        self.end = end
        self.word_type = word_type
        self.weight = weight
        self.index = -1

    def __repr__(self):  # pragma: no cover
        return f"SegToken({self.term!r},{self.start},{self.end})"


class HHMMSegmenter:
    """[ref: hhmm/HHMMSegmenter.kt] — graph build + shortest path."""

    def __init__(self):
        self.dict = _dict()

    def _create_seg_graph(self, sentence: str) -> dict[int, list[SegToken]]:
        n = len(sentence)
        ctypes = [_char_type(c) for c in sentence]
        by_start: dict[int, list[SegToken]] = {}

        def add(tok: SegToken) -> None:
            by_start.setdefault(tok.start, []).append(tok)

        i = 0
        while i < n:
            ct = ctypes[i]
            if ct == SPACE_LIKE_C:
                i += 1
            elif ct == SURROGATE_C:
                count = 2 if (i + 1 < n and "\ud800" <= sentence[i]
                              <= "\udbff") else 1
                add(SegToken(sentence[i:i + count], i, i + count,
                             CHINESE_WORD, 0))
                i += count
            elif ct == HANZI_C:
                j = i + 1
                cur = sentence[i]
                add(SegToken(cur, i, j, CHINESE_WORD,
                             self.dict.frequency(cur)))
                is_prefix = cur in self.dict.prefix_or_word
                while j <= n and is_prefix:
                    if len(cur) > 1 and cur in self.dict.freq:
                        add(SegToken(cur, i, j, CHINESE_WORD,
                                     self.dict.freq[cur]))
                    while j < n and ctypes[j] == SPACE_LIKE_C:
                        j += 1
                    if j < n and ctypes[j] == HANZI_C:
                        cur += sentence[j]
                        is_prefix = cur in self.dict.prefix_or_word
                        j += 1
                    else:
                        break
                i += 1
            elif ct in (FULLWIDTH_LETTER_C, LETTER_C):
                j = i + 1
                while j < n and ctypes[j] in (LETTER_C, FULLWIDTH_LETTER_C):
                    j += 1
                has_fw = any(ctypes[k] == FULLWIDTH_LETTER_C
                             for k in range(i, j))
                add(SegToken(STRING_PSEUDO, i, j,
                             FULLWIDTH_STRING if has_fw else STRING,
                             self.dict.frequency(STRING_PSEUDO)))
                i = j
            elif ct in (FULLWIDTH_DIGIT_C, DIGIT_C):
                j = i + 1
                while j < n and ctypes[j] in (DIGIT_C, FULLWIDTH_DIGIT_C):
                    j += 1
                has_fw = any(ctypes[k] == FULLWIDTH_DIGIT_C
                             for k in range(i, j))
                add(SegToken(NUMBER_PSEUDO, i, j,
                             FULLWIDTH_NUMBER if has_fw else NUMBER,
                             self.dict.frequency(NUMBER_PSEUDO)))
                i = j
            elif ct == DELIMITER_C:
                add(SegToken(sentence[i], i, i + 1, DELIMITER,
                             MAX_FREQUENCE))
                i += 1
            else:
                add(SegToken(STRING_PSEUDO, i, i + 1, STRING,
                             self.dict.frequency(STRING_PSEUDO)))
                i += 1

        add(SegToken(START_PSEUDO, -1, 0, SENTENCE_BEGIN,
                     self.dict.frequency(START_PSEUDO)))
        add(SegToken(END_PSEUDO, n, n + 1, SENTENCE_END,
                     self.dict.frequency(END_PSEUDO)))
        return by_start

    def process(self, sentence: str) -> list[SegToken]:
        by_start = self._create_seg_graph(sentence)
        if not by_start:
            return []
        # makeIndex: tokens ordered by start offset
        tokens: list[SegToken] = []
        for s in sorted(by_start):
            for t in by_start[s]:
                t.index = len(tokens)
                tokens.append(t)

        # [ref: hhmm/BiSegGraph.kt generateBiSegGraph — exact smoothing;
        #  bigram table empty in this distribution => wordPairFreq = 0]
        smooth = 0.1
        tiny = 1.0 / MAX_FREQUENCE
        max_start = max(by_start)
        starts = sorted(by_start)
        edges_to: dict[int, list[tuple[int, float]]] = {}
        for s in starts:
            for t1 in by_start[s]:
                one_word_freq = float(t1.weight)
                nxt = t1.end
                while nxt <= max_start and nxt not in by_start:
                    nxt += 1
                if nxt > max_start:
                    continue
                weight = -math.log(
                    smooth * (1.0 + one_word_freq) / (MAX_FREQUENCE + 0.0)
                    + (1.0 - smooth) * ((1.0 - tiny) * 0.0
                                        / (1.0 + one_word_freq) + tiny))
                for t2 in by_start[nxt]:
                    edges_to.setdefault(t2.index, []).append(
                        (t1.index, weight))

        # [ref: hhmm/BiSegGraph.kt getShortPath]
        node_count = len(edges_to)
        weights = [0.0] + [float("inf")] * node_count
        pre = [0] * (node_count + 1)
        for current in range(1, node_count + 1):
            best, best_from = float("inf"), 0
            for frm, w in edges_to.get(current, ()):
                total = weights[frm] + w
                if total < best:
                    best, best_from = total, frm
            weights[current] = best
            pre[current] = best_from
        path = []
        cur = node_count
        while cur != 0:
            path.append(cur)
            cur = pre[cur]
        path.append(0)
        return [tokens[i] for i in reversed(path)]


_SENT_SPLIT = re.compile(r"[^。．.!?！？\n\r]*(?:[。．.!?！？\n\r]+|$)")


class SmartChineseAnalyzer:
    """Full smartcn chain; callable ``text -> list[str]``.
    [ref: cn/smart/SmartChineseAnalyzer.kt createComponents]"""

    def __init__(self, stop_words=CN_STOP_WORDS):
        self.seg = HHMMSegmenter()
        self.stop_words = stop_words

    def analyze_tokens(self, text: str):
        from .porter import porter_stem
        out = []
        for m in _SENT_SPLIT.finditer(text):
            sentence = m.group(0)
            if not sentence:
                continue
            base = m.start()
            toks = self.seg.process(sentence)
            for t in toks[1:-1]:  # drop SENTENCE_BEGIN/END
                # [ref: WordSegmenter.convertSegToken + SegTokenFilter]
                if t.word_type in (STRING, NUMBER, FULLWIDTH_STRING,
                                   FULLWIDTH_NUMBER):
                    term = sentence[t.start:t.end]
                    if t.word_type in (FULLWIDTH_STRING, FULLWIDTH_NUMBER):
                        term = "".join(
                            chr(ord(c) - 0xFEE0) if ord(c) >= 0xFF10 else c
                            for c in term)
                    term = term.lower()
                elif t.word_type == DELIMITER:
                    term = COMMON_DELIMITER
                else:
                    term = t.term
                # PorterStemFilter stems every token; only latin terms
                # have stemmable structure (CJK terms pass through the
                # algorithm unchanged), so the ASCII guard is equivalent
                if term.isascii():
                    term = porter_stem(term)
                if term in self.stop_words:  # StopFilter
                    continue
                out.append((term, base + t.start, base + t.end))
        return out

    def __call__(self, text: str) -> list[str]:
        return [t for t, _, _ in self.analyze_tokens(text)]

    def analyze_flat(self, texts):
        """Vectorized indexing interface (same contract as the other
        chains)."""
        import pyarrow as pa

        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            toks = self(text or "")
            flat.extend(toks)
            doc_of_l.extend([i] * len(toks))
            pos_l.extend(range(len(toks)))
            doc_lengths[i] = len(toks)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
