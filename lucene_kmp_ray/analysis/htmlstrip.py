"""HTML → text extraction (HTMLStripCharFilter analog).

Semantics of ``/root/reference/analysis/common/.../charfilter/HTMLStripCharFilter.kt``
re-expressed as a vectorizable batch transform: drop tags / scripts / styles /
comments, decode the common character entities, collapse nothing else (byte
positions inside text runs are preserved).

Per-row invariant (BASELINE.json input_hint): for every url,
``html_to_text(html) == text`` byte-identically — enforced by
``pipelines/validate.py`` and a pytest.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_HEAD_RE = re.compile(r"(?is)<head\b.*?</head\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title\s*>")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&apos;": "'", "&#39;": "'", "&nbsp;": " "}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def _decode(html: bytes | str) -> str:
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def html_to_text(html: bytes | str) -> str:
    """Extract visible body text from one HTML page (deterministic, pure).
    The head section (title/meta — non-body metadata) is dropped whole,
    matching the fielded-document split: body → ``text``, <title> →
    ``title`` (html_title)."""
    s = _decode(html)
    s = _SCRIPT_RE.sub("", s)
    s = _HEAD_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)


def html_title(html: bytes | str) -> str:
    """Extract the <title> content (first occurrence, entity-decoded) —
    the title-field source of a fielded web document (Document.kt:20
    title+body pattern). Empty string when absent."""
    m = _TITLE_RE.search(_decode(html))
    if m is None:
        return ""
    return _ENTITY_RE.sub(lambda mm: _ENTITIES[mm.group(0)], m.group(1))


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "extracted_text") -> pa.Table:
    """map_batches stage: add extracted text column from the html column."""
    texts = [html_to_text(h) for h in batch[html_col].to_pylist()]
    return batch.append_column(out_col, pa.array(texts, type=pa.string()))
