"""Shared expand-analyzer machinery: a chain whose post-tokenizer
stages are token-local (stop / canonicalize / decompose / stem) is one
``expand(tok) -> tuple[str, ...]`` — empty = stopped, extra members =
posInc-0 stacked subtokens in emit order after the original. Vectorized
per *unique* token (dictionary-encode, SynonymAnalyzer style), with the
stacked extras appended per matching occurrence and a stable lexsort
restoring (doc, position, original-first) order.

Used by the Bible analyzer family (analysis/bible.py) and the compound
word decomposition filters (analysis/compound.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class ExpandAnalyzer:
    """Standard-tokenizer expand chain; subclass and override
    ``expand`` (and optionally ``prefilter`` + ``_has_prefilter`` for a
    pre-tokenization char filter, or ``_tokenize``/``_base_flat`` for a
    different tokenizer)."""

    name = "expand"
    _has_prefilter = False

    def prefilter(self, text: str) -> str:
        return text

    def expand(self, tok: str) -> tuple[str, ...]:  # pragma: no cover
        raise NotImplementedError

    def _tokenize(self, text: str) -> list[str]:
        from .standard import tokenize
        return tokenize(text)

    def _base_flat(self, texts):
        from .standard import StandardAnalyzer
        return StandardAnalyzer().analyze_flat(texts)

    def __call__(self, text: str) -> list[str]:
        out: list[str] = []
        for t in self._tokenize(self.prefilter(text)
                                if self._has_prefilter else text):
            out.extend(self.expand(t))
        return out

    def analyze_flat(self, texts):
        if self._has_prefilter:
            if isinstance(texts, (pa.Array, pa.ChunkedArray)):
                texts = texts.to_pylist()
            texts = [self.prefilter(t or "") for t in texts]
        dl, flat, doc_of, pos = self._base_flat(texts)
        if len(flat) == 0:
            return dl, flat, doc_of, pos
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        dict_arr = flat.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        exp = [self.expand(u) for u in uniq]
        nout = np.array([len(e) for e in exp], dtype=np.int64)
        first = [(e[0] if e else "") for e in exp]
        idx = dict_arr.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat1 = pa.DictionaryArray.from_arrays(
            pa.array(idx, pa.int64()),
            pa.array(first, pa.string())).cast(pa.string())
        keep = nout[idx] > 0
        parts_tok = [flat1.filter(pa.array(keep))]
        parts_doc = [doc_of[keep]]
        parts_pos = [pos[keep]]
        for ui in np.nonzero(nout > 1)[0]:
            m = idx == ui
            d, p = doc_of[m], pos[m]
            for s in exp[ui][1:]:  # stacked at the SAME position
                parts_tok.append(pa.array([s] * len(d), pa.string()))
                parts_doc.append(d)
                parts_pos.append(p)
        if len(parts_tok) == 1:
            flat2, doc2, pos2 = parts_tok[0], parts_doc[0], parts_pos[0]
        else:
            flat2 = pa.concat_arrays(
                [t.combine_chunks() if isinstance(t, pa.ChunkedArray)
                 else t for t in parts_tok])
            doc2 = np.concatenate(parts_doc)
            pos2 = np.concatenate(parts_pos)
            order = np.lexsort((pos2, doc2))  # stable: originals first
            flat2 = flat2.take(pa.array(order))
            doc2, pos2 = doc2[order], pos2[order]
        norm_lengths = np.bincount(doc2, minlength=len(dl)) \
            .astype(np.int64)
        return norm_lengths, flat2, doc2, pos2


class WhitespaceExpandAnalyzer(ExpandAnalyzer):
    """Expand chain over the (case-preserving) whitespace tokenizer —
    the shape the reference's compound-filter tests use."""

    name = "ws_expand"

    def _tokenize(self, text: str) -> list[str]:
        from .core import WhitespaceAnalyzer
        return WhitespaceAnalyzer()(text)

    def _base_flat(self, texts):
        from .core import WhitespaceAnalyzer
        return WhitespaceAnalyzer().analyze_flat(texts)
