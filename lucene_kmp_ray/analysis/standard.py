"""StandardAnalyzer-equivalent tokenization.

The reference chain is StandardTokenizer (UAX#29 word break) → LowerCaseFilter
→ StopFilter with an EMPTY default stop set
(``/root/reference/core/.../analysis/standard/StandardAnalyzer.kt:16,37,47-55``),
max token length 255 with over-long tokens split
(``StandardAnalyzer.kt:67``, ``StandardTokenizer.kt:105``).

We approximate UAX#29 for Latin-script web text with a single regex that is
expressible both in Python ``re`` and in DuckDB's RE2 (no lookarounds), so the
driver's SQL oracle can reproduce tokenization exactly:

    token := ALNUM+ ( ( ' | ’ | . ) ALNUM+ )*

where ALNUM = letters | digits | underscore (UAX#29 ExtendNumLet joins words
with '_'; MidNumLet ``.``/``'`` joins runs with alphanumerics on both sides —
so ``can't``, ``example.com``, ``3.14`` are single tokens, matching the
reference). Deviations from full UAX#29 (documented, Latin-focused v1):
``1,000`` splits at the comma (MidNum) and ``a:b`` at the colon (MidLetter);
no special CJK/emoji segmentation. Tokens are lowercased after segmentation.

The query side MUST use the same functions (QueryBuilder semantics,
``/root/reference/core/.../util/QueryBuilder.kt:45``).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.kt:67

# Python (re module): \w == [letters, digits, underscore] under re.UNICODE.
PY_TOKEN_RE = re.compile(r"\w+(?:['’.]\w+)*", re.UNICODE)

# Identical language in RE2 (DuckDB regexp_extract_all). \pL/\pN = Unicode
# letters/numbers; agreement with \w holds for the BMP alphanumerics used here.
SQL_TOKEN_PATTERN = r"[\pL\pN_]+(?:['’.][\pL\pN_]+)*"


def sql_tokens_expr(col: str = "text") -> str:
    """DuckDB expression: list of lowercased tokens of `col` (oracle side)."""
    pat = SQL_TOKEN_PATTERN.replace("'", "''")
    return (f"list_transform(regexp_extract_all({col}, '{pat}'), "
            f"t -> lower(t))")


def tokenize(text: str) -> list[str]:
    """Lowercased token list for one document (index- and query-side)."""
    out = []
    for tok in PY_TOKEN_RE.findall(text):
        if len(tok) > MAX_TOKEN_LENGTH:  # over-long tokens split, not dropped
            for i in range(0, len(tok), MAX_TOKEN_LENGTH):
                out.append(tok[i:i + MAX_TOKEN_LENGTH].lower())
        else:
            out.append(tok.lower())
    return out


class StandardAnalyzer:
    """Callable analyzer object (pluggable per-lang slot, SURVEY §2.2)."""

    def __call__(self, text: str) -> list[str]:
        return tokenize(text)


def tokenize_flat(texts) -> tuple[np.ndarray, pa.Array]:
    """Tokenize a batch into (doc_lengths, flat lowercased token array).

    The per-doc regex scan is the tokenizer DFA itself (the reference's
    invert loop, IndexingChain.kt:1153-1290); lowercasing runs as one Arrow
    C++ kernel over the flat token array, and everything downstream
    (grouping to postings, positions, norms) is vectorized numpy — no
    per-token Python objects survive past this function.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    doc_lengths = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    findall = PY_TOKEN_RE.findall
    maxlen = MAX_TOKEN_LENGTH
    for i, text in enumerate(texts):
        toks = findall(text or "")
        if toks and max(map(len, toks)) > maxlen:  # rare slow path
            toks = [piece for t in toks for piece in
                    ([t] if len(t) <= maxlen else
                     [t[j:j + maxlen] for j in range(0, len(t), maxlen)])]
        doc_lengths[i] = len(toks)
        flat.extend(toks)
    import pyarrow.compute as pc
    return doc_lengths, pc.utf8_lower(pa.array(flat, type=pa.string()))


def term_freqs(text: str) -> Counter:
    """Convenience for tests/oracles: term -> tf for one document."""
    return Counter(tokenize(text))
