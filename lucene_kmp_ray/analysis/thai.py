"""Thai analysis chain.

Reference chain (``/root/reference/analysis/common/.../th/ThaiAnalyzer.kt``
createComponents): ThaiTokenizer → LowerCaseFilter → DecimalDigitFilter →
StopFilter.

The reference ThaiTokenizer (``th/ThaiTokenizer.kt``) delegates to the
JRE's DICTIONARY-based Thai BreakIterator, which needs the ICU Thai
lexicon — not available in this container. Following the repo's
Burmese/Khmer precedent, this module segments Thai runs with a
deterministic ORTHOGRAPHIC-SYLLABLE state machine (pre-vowel? + initial
consonant + dependent vowels/tones + trailing vowel + final consonant
when the next char cannot be an onset's vowel), the standard
dictionary-free fallback: recall-oriented sub-word units, exactly
mirrored in the SQL oracle as a recursive-CTE char scan
(oracle._th_scan_exprs — RE2 has no lookahead, so no single regex can
express the final-consonant rule). Thai digits and the
repetition/paiyannoi signs tokenize standalone; non-Thai spans inside a
token stay whole (the standard tokenizer already split them).

LowerCase uses the index's Arrow ``utf8_lower`` mapping (fold_case);
DecimalDigitFilter is the shared all-Nd ``fold_digits`` (Thai ๐-๙ → 0-9).
Vectors in tests/test_thai_analyzer.py.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .indic import fold_digits
from .standard import fold_case

THAI_STOP_WORDS = frozenset("""
ไว้ ไม่ ไป ได้ ให้ ใน โดย แห่ง แล้ว และ แรก แบบ แต่ เอง เห็น เลย เริ่ม เรา
เมื่อ เพื่อ เพราะ เป็นการ เป็น เปิดเผย เปิด เนื่องจาก เดียวกัน เดียว เช่น
เฉพาะ เคย เข้า เขา อีก อาจ อะไร ออก อย่าง อยู่ อยาก หาก หลาย หลังจาก หลัง
หรือ หนึ่ง ส่วน ส่ง สุด สําหรับ ว่า วัน ลง ร่วม ราย รับ ระหว่าง รวม ยัง มี
มาก มา พร้อม พบ ผ่าน ผล บาง น่า นี้ นํา นั้น นัก นอกจาก ทุก ที่สุด ที่
ทําให้ ทํา ทาง ทั้งนี้ ทั้ง ถ้า ถูก ถึง ต้อง ต่างๆ ต่าง ต่อ ตาม ตั้งแต่
ตั้ง ด้าน ด้วย ดัง ซึ่ง ช่วง จึง จาก จัด จะ คือ ความ ครั้ง คง ขึ้น ของ ขอ
ขณะ ก่อน ก็ การ กับ กัน กว่า
""".split())

# Orthographic-syllable state machine over one raw token. States:
# E empty · P pre-vowel pending · O onset present · F final attached ·
# X non-Thai run · D Thai-digit run. A consonant after an onset becomes
# the FINAL of the current syllable unless the NEXT char is a dependent
# or trailing vowel (then it is the next syllable's onset) — the
# lookahead that plain RE2 cannot express, so the SQL oracle mirrors
# this scan as a recursive CTE (oracle._th_scan_exprs).
_PRE = frozenset(chr(c) for c in range(0x0E40, 0x0E45))
_CONS = frozenset(chr(c) for c in range(0x0E01, 0x0E2F))
_DEP = frozenset([chr(0x0E31)] +
                 [chr(c) for c in range(0x0E33, 0x0E3B)] +
                 [chr(c) for c in range(0x0E47, 0x0E4F)])
_TRAIL = frozenset({chr(0x0E30), chr(0x0E32), chr(0x0E45)})
_DIG = frozenset(chr(c) for c in range(0x0E50, 0x0E5A))
_SIGN = frozenset({chr(0x0E2F), chr(0x0E46)})
_THAI_RUN = re.compile("[\u0E00-\u0E7F]")


def thai_segments(tok: str) -> list[str]:
    """Split one raw token into Thai syllables / digit runs / signs /
    non-Thai spans; tokens without Thai chars pass through whole."""
    if not _THAI_RUN.search(tok):
        return [tok]
    out: list[str] = []
    cur = ""
    st = "E"
    n = len(tok)
    for i, c in enumerate(tok):
        nc = tok[i + 1] if i + 1 < n else ""
        if c in _DIG:
            act = 1 if st == "D" else 5
        elif c in _SIGN:
            act = 6
        elif c in _PRE:
            act = 7
        elif c in _CONS:
            if st == "P":
                act = 2
            elif st == "O" and not (nc in _DEP or nc in _TRAIL):
                act = 3
            else:
                act = 8
        elif c in _DEP:
            act = 1 if st in ("P", "O", "F") else 9
        elif c in _TRAIL:
            act = 2 if st == "P" else (1 if st == "O" else 9)
        else:  # non-Thai char
            act = 1 if st == "X" else 4
        if act in (1, 2, 3):
            cur += c
            st = {1: st, 2: "O", 3: "F"}[act]
        elif act in (4, 5, 7, 8):
            if cur:
                out.append(cur)
            cur = c
            st = {4: "X", 5: "D", 7: "P", 8: "O"}[act]
        elif act == 6:
            if cur:
                out.append(cur)
            out.append(c)
            cur = ""
            st = "E"
        # act 9: stray mark dropped, state unchanged
    if cur:
        out.append(cur)
    return out


class ThaiAnalyzer:
    """Thai syllable segmentation → lowercase → digit fold → stop."""

    name = "thai"
    stop_words = THAI_STOP_WORDS

    def __init__(self):
        self.stop_set = frozenset(self.stop_words)

    def _post(self, tok: str) -> str:
        return fold_digits(fold_case(tok))

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize_flat
        _, flat = tokenize_flat([text], lower=False)
        out = []
        for raw in flat.to_pylist():
            for seg in thai_segments(raw):
                seg = self._post(seg)
                if seg and seg not in self.stop_set:
                    out.append(seg)
        return out

    def analyze_flat(self, texts):
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
