"""Polish analysis via the Morfologik dictionary (PoliMorf).

Faithful port of the reference's morfologik module:

- ``CFSA2``: the compact FSA binary format the PoliMorf dictionary ships
  in [ref: analysis/morfologik/.../morfologik/fsa/CFSA2.kt:10-150]:
  arcs carry a 5-bit label index (0 = explicit next byte), LAST/FINAL/
  TARGET_NEXT flag bits, v-coded target offsets.
- ``DictionaryLookup`` with the PREFIX sequence encoder
  [ref: morfologik/stemming/TrimPrefixAndSuffixEncoder.kt]: entries are
  ``inflected ; encoded-lemma ; tag`` byte sequences; the encoded lemma
  is (prefixCut+'A')(suffixCut+'A')(appended bytes), 255 = replace all.
- ``MorfologikFilter`` semantics [ref: morfologik/MorfologikFilter.kt:
  75-90]: per token, look up the surface form, then its lowercased
  form; when found, the token is REPLACED by its lemma(s) (subsequent
  lemmas at the same position); otherwise the token passes through.
- ``MorfologikAnalyzer`` [ref: morfologik/MorfologikAnalyzer.kt]:
  StandardTokenizer -> MorfologikFilter (no stop list, no lowercase —
  the filter handles case internally).

The dictionary asset (``data/polish.dict``, 2.8 MB) is the public
BSD-licensed PoliMorf build the reference distributes
(``gradle/morfologik/polish``); it is read directly at runtime (loaded
once per process — the once-per-actor state slot)."""

from __future__ import annotations

import os
from functools import lru_cache

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

BIT_TARGET_NEXT = 1 << 7
BIT_LAST_ARC = 1 << 6
BIT_FINAL_ARC = 1 << 5
LABEL_INDEX_MASK = (1 << 5) - 1

_SEPARATOR = ord(";")
_REMOVE_EVERYTHING = 255


class CFSA2:
    """Read-only CFSA2 automaton over a bytes buffer."""

    def __init__(self, data: bytes):
        assert data[:4] == b"\\fsa" and data[4] == 0xC6, "not a CFSA2 file"
        pos = 5
        flags = (data[pos] << 8) | data[pos + 1]
        pos += 2
        self.has_numbers = bool(flags & 0x0100)  # FSAFlags.NUMBERS
        n_labels = data[pos]
        pos += 1
        self.label_mapping = data[pos:pos + n_labels]
        pos += n_labels
        self.arcs = data[pos:]

    # -- v-coded ints [ref: CFSA2.kt readVInt] ---------------------------
    def _read_vint(self, off: int) -> int:
        a = self.arcs
        b = a[off]
        value = b & 0x7F
        shift = 7
        while b & 0x80:
            off += 1
            b = a[off]
            value |= (b & 0x7F) << shift
            shift += 7
        return value

    def _skip_vint(self, off: int) -> int:
        a = self.arcs
        while a[off] & 0x80:
            off += 1
        return off + 1

    # -- arcs -------------------------------------------------------------
    def first_arc(self, node: int) -> int:
        return self._skip_vint(node) if self.has_numbers else node

    def next_arc(self, arc: int) -> int:
        return 0 if self.is_last(arc) else self._skip_arc(arc)

    def is_last(self, arc: int) -> bool:
        return bool(self.arcs[arc] & BIT_LAST_ARC)

    def is_final(self, arc: int) -> bool:
        return bool(self.arcs[arc] & BIT_FINAL_ARC)

    def is_terminal(self, arc: int) -> bool:
        return self._dest(arc) == 0

    def label(self, arc: int) -> int:
        idx = self.arcs[arc] & LABEL_INDEX_MASK
        return self.label_mapping[idx] if idx > 0 else self.arcs[arc + 1]

    def _skip_arc(self, off: int) -> int:
        flag = self.arcs[off]
        off += 1
        if (flag & LABEL_INDEX_MASK) == 0:
            off += 1
        if (flag & BIT_TARGET_NEXT) == 0:
            off = self._skip_vint(off)
        return off

    def _dest(self, arc: int) -> int:
        if self.arcs[arc] & BIT_TARGET_NEXT:
            cur = arc
            while not self.is_last(cur):
                cur = self.next_arc(cur)
            return self._skip_arc(cur)
        explicit = (self.arcs[arc] & LABEL_INDEX_MASK) == 0
        return self._read_vint(arc + (2 if explicit else 1))

    def end_node(self, arc: int) -> int:
        return self._dest(arc)

    def root(self) -> int:
        return self._dest(self.first_arc(0))

    def arc_for(self, node: int, byte: int) -> int:
        arc = self.first_arc(node)
        while arc != 0:
            if self.label(arc) == byte:
                return arc
            arc = self.next_arc(arc)
        return 0

    def match_prefix(self, node: int, seq: bytes) -> int:
        """Walk seq from node; returns the end node or -1."""
        for b in seq:
            arc = self.arc_for(node, b)
            if arc == 0 or self.is_terminal(arc):
                # a terminal final arc still consumes the LAST byte
                if arc != 0 and b == seq[-1] and self.is_final(arc):
                    return -2  # matched, but nothing follows
                return -1
            node = self.end_node(arc)
        return node

    def completions(self, node: int, limit: int = 64):
        """All byte sequences accepted from node (DFS)."""
        out: list[bytes] = []
        stack: list[tuple[int, bytes]] = [(node, b"")]
        while stack and len(out) < limit:
            nd, prefix = stack.pop()
            arc = self.first_arc(nd)
            while arc != 0:
                lab = bytes([self.label(arc)])
                if self.is_final(arc):
                    out.append(prefix + lab)
                if not self.is_terminal(arc):
                    stack.append((self.end_node(arc), prefix + lab))
                arc = self.next_arc(arc)
        return out


class PolishStemmer:
    """DictionaryLookup over PoliMorf with the PREFIX encoder."""

    def __init__(self):
        with open(os.path.join(_DATA_DIR, "polish.dict"), "rb") as f:
            self.fsa = CFSA2(f.read())
        self.root = self.fsa.root()

    def lookup(self, word: str) -> list[str]:
        """Lemma(s) for an inflected form ([] when absent)."""
        wb = word.encode("utf-8")
        node = self.fsa.match_prefix(self.root, wb + b";")
        if node < 0:
            return []
        lemmas = []
        for comp in self.fsa.completions(node):
            # comp = encoded-lemma ';' tag — the encoded lemma runs to
            # the next separator
            sep = comp.find(b";")
            enc = comp[:sep] if sep >= 0 else comp
            lemmas.append(self._decode(wb, enc))
        # stable unique
        seen, out = set(), []
        for m in lemmas:
            if m not in seen:
                seen.add(m)
                out.append(m)
        return out

    @staticmethod
    def _decode(source: bytes, enc: bytes) -> str:
        # [ref: TrimPrefixAndSuffixEncoder.decode]
        if len(enc) < 2:
            return enc.decode("utf-8", "replace")
        p = (enc[0] - ord("A")) & 0xFF
        s = (enc[1] - ord("A")) & 0xFF
        if p == _REMOVE_EVERYTHING or s == _REMOVE_EVERYTHING:
            return enc[2:].decode("utf-8", "replace")
        return (source[p:len(source) - s] + enc[2:]).decode(
            "utf-8", "replace")


@lru_cache(maxsize=1)
def _stemmer() -> PolishStemmer:
    return PolishStemmer()


class MorfologikAnalyzer:
    """Standard tokens -> Morfologik lemmas (surface kept when the
    dictionary has no entry). Output is lowercased tokens: our standard
    tokenizer lowercases up front, matching the filter's own
    lowercased-surface fallback lookup; capitalized lemmas are folded to
    keep index/query symmetry."""

    name = "polish"

    def __call__(self, text: str) -> list[str]:
        from .standard import tokenize
        st = _stemmer()
        out = []
        for t in tokenize(text):
            lemmas = st.lookup(t)
            if lemmas:
                out.extend(m.lower() for m in lemmas)
            else:
                out.append(t)
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
