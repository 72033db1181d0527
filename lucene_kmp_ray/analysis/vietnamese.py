"""Vietnamese analysis chain — bigram-merging tokenizer.

Reference chain (``/root/reference/analysis/extra/.../vi/``):
VietnameseTokenizer → Stop → VietnameseNormalization →
VietnameseStemFilter (a no-op).  The tokenizer lowercases
letter/digit runs, splits http(s) URLs into their alnum runs
(NOT bigram-merged), and then merges adjacent WORD pairs separated by
whitespace only into single two-word tokens ("công nghệ") — greedy,
non-overlapping, left to right.  The normalizer folds Vietnamese
diacritics (incl. đ → d) AFTER the stop filter.

SQL mirror: ``oracle.vietnamese_token_counts`` — URLs isolated with a
non-whitespace sentinel, word/separator lists from
regexp_extract_all + string_split_regex, and the greedy pairing as a
per-document recursive CTE over word indexes (whitespace test covers
the ASCII class; the corpus carries only plain spaces).  Vectors from
TestVietnameseAnalyzer.kt live in tests/test_vietnamese_analyzer.py.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

VIETNAMESE_STOP_WORDS = frozenset("""
bị bởi cả các cái cần càng chỉ chiếc cho chứ chưa chuyện có có thể
cứ của cùng cũng đã đang đây để đến nỗi đều điều do đó được dưới gì
khi không là lại lên lúc mà mỗi một cách này nên nếu ngay nhiều như
nhưng những nơi nữa phải qua ra rằng rằng rất rất rồi sau sẽ so sự
tại theo thì trên trước từ từng và vẫn vào vậy vì việc với vừa
""".split())

VI_FOLD = {'À': 'A', 'Á': 'A', 'Ả': 'A', 'Ã': 'A', 'Ạ': 'A', 'Ă': 'A', 'Ắ': 'A', 'Ằ': 'A', 'Ẳ': 'A', 'Ẵ': 'A', 'Ặ': 'A', 'Â': 'A', 'Ấ': 'A', 'Ầ': 'A', 'Ẩ': 'A', 'Ẫ': 'A', 'Ậ': 'A', 'à': 'a', 'á': 'a', 'ả': 'a', 'ã': 'a', 'ạ': 'a', 'ă': 'a', 'ắ': 'a', 'ằ': 'a', 'ẳ': 'a', 'ẵ': 'a', 'ặ': 'a', 'â': 'a', 'ấ': 'a', 'ầ': 'a', 'ẩ': 'a', 'ẫ': 'a', 'ậ': 'a', 'È': 'E', 'É': 'E', 'Ẻ': 'E', 'Ẽ': 'E', 'Ẹ': 'E', 'Ê': 'E', 'Ế': 'E', 'Ề': 'E', 'Ể': 'E', 'Ễ': 'E', 'Ệ': 'E', 'è': 'e', 'é': 'e', 'ẻ': 'e', 'ẽ': 'e', 'ẹ': 'e', 'ê': 'e', 'ế': 'e', 'ề': 'e', 'ể': 'e', 'ễ': 'e', 'ệ': 'e', 'Ì': 'I', 'Í': 'I', 'Ỉ': 'I', 'Ĩ': 'I', 'Ị': 'I', 'ì': 'i', 'í': 'i', 'ỉ': 'i', 'ĩ': 'i', 'ị': 'i', 'Ò': 'O', 'Ó': 'O', 'Ỏ': 'O', 'Õ': 'O', 'Ọ': 'O', 'Ô': 'O', 'Ố': 'O', 'Ồ': 'O', 'Ổ': 'O', 'Ỗ': 'O', 'Ộ': 'O', 'Ơ': 'O', 'Ớ': 'O', 'Ờ': 'O', 'Ở': 'O', 'Ỡ': 'O', 'Ợ': 'O', 'ò': 'o', 'ó': 'o', 'ỏ': 'o', 'õ': 'o', 'ọ': 'o', 'ô': 'o', 'ố': 'o', 'ồ': 'o', 'ổ': 'o', 'ỗ': 'o', 'ộ': 'o', 'ơ': 'o', 'ớ': 'o', 'ờ': 'o', 'ở': 'o', 'ỡ': 'o', 'ợ': 'o', 'Ù': 'U', 'Ú': 'U', 'Ủ': 'U', 'Ũ': 'U', 'Ụ': 'U', 'Ư': 'U', 'Ứ': 'U', 'Ừ': 'U', 'Ử': 'U', 'Ữ': 'U', 'Ự': 'U', 'ù': 'u', 'ú': 'u', 'ủ': 'u', 'ũ': 'u', 'ụ': 'u', 'ư': 'u', 'ứ': 'u', 'ừ': 'u', 'ử': 'u', 'ữ': 'u', 'ự': 'u', 'Ỳ': 'Y', 'Ý': 'Y', 'Ỷ': 'Y', 'Ỹ': 'Y', 'Ỵ': 'Y', 'ỳ': 'y', 'ý': 'y', 'ỷ': 'y', 'ỹ': 'y', 'ỵ': 'y', 'Đ': 'D', 'đ': 'd'}
_VI_TRANS = str.maketrans(VI_FOLD)

_ALNUM_RE = re.compile(r"[^\W_]+", re.UNICODE)
_URL_RE = re.compile(r"https?://", re.IGNORECASE)


def _is_alnum(ch: str) -> bool:
    import unicodedata
    cat = unicodedata.category(ch)
    return cat.startswith("L") or cat == "Nd"


def vietnamese_tokenize(text: str) -> list[str]:
    """VietnameseTokenizer.segment + mergeWordBigrams (exact scan)."""
    toks: list[tuple[str, bool, int, int]] = []   # (text, is_word, s, e)
    i, n = 0, len(text)
    while i < n:
        m = _URL_RE.match(text, i)
        if m:
            end = i
            while end < n and not text[end].isspace():
                end += 1
            j = i
            while j < end:
                while j < end and not _is_alnum(text[j]):
                    j += 1
                s = j
                while j < end and _is_alnum(text[j]):
                    j += 1
                if s < j:
                    toks.append((text[s:j].lower(), False, s, j))
            i = end
            continue
        ch = text[i]
        if _is_alnum(ch):
            s = i
            i += 1
            while i < n and _is_alnum(text[i]):
                i += 1
            toks.append((text[s:i].lower(), True, s, i))
            continue
        i += 1
    out: list[str] = []
    k = 0
    while k < len(toks):
        t, w, s, e = toks[k]
        if w and k + 1 < len(toks):
            t2, w2, s2, e2 = toks[k + 1]
            gap = text[e:s2]
            if w2 and gap and gap.isspace():
                out.append(t + " " + t2)
                k += 2
                continue
        out.append(t)
        k += 1
    return out


def vietnamese_normalize(tok: str) -> str:
    return tok.translate(_VI_TRANS)


class VietnameseAnalyzer:
    """tokenize(+bigrams) → stop → diacritic fold (stemmer no-op)."""

    name = "vietnamese"

    def __init__(self):
        self.stop_set = frozenset(VIETNAMESE_STOP_WORDS)

    def __call__(self, text: str) -> list[str]:
        return [vietnamese_normalize(t)
                for t in vietnamese_tokenize(text)
                if t not in self.stop_set]

    def analyze_flat(self, texts):
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        doc_lengths = np.empty(len(texts), dtype=np.int64)
        flat: list[str] = []
        doc_of_l: list[int] = []
        pos_l: list[int] = []
        for i, text in enumerate(texts):
            kept = 0
            for p, tok in enumerate(vietnamese_tokenize(text or "")):
                if tok not in self.stop_set:
                    flat.append(vietnamese_normalize(tok))
                    doc_of_l.append(i)
                    pos_l.append(p)
                    kept += 1
            doc_lengths[i] = kept
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
