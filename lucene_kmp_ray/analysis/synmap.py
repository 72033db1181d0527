"""SynonymMap + file-format parsers + the multi-word synonym filter —
the reference's ``analysis/synonym/`` package beyond the single-token
rules filters.py already covers:

- ``SynonymMap.Builder`` role (``synonym/SynonymMap.kt``): phrase →
  [(output phrase, keep_orig)] with rule-level dedup; phrases are
  WORD_SEPARATOR-joined analyzed token sequences.
- ``SolrSynonymParser`` (``synonym/SolrSynonymParser.kt``): the Solr
  wiki format — ``a, b, c`` (expand or contract), ``x => y, z``
  explicit mappings, ``\\``-escaped separators, ``#`` comments; a rule
  whose side analyzes to nothing or to non-consecutive positions (e.g.
  a stopword inside a phrase under EnglishAnalyzer) raises
  SynonymParseError with the line number (the ParseException contract).
- ``WordnetSynonymParser`` (``synonym/WordnetSynonymParser.kt``): the
  prolog WordNet format ``s(100000001,1,'woods',n,1,0).`` — synset
  grouping by the 9-digit id, ``''`` quote unescaping.
- ``SynonymFilterAnalyzer``: the flattened SynonymFilter semantics
  (``synonym/SynonymFilter.kt``) over a pluggable tokenizer — greedy
  longest match, non-overlapping; output phrase word j lands at match
  position start+j while j < match length, extra output words open new
  positions right after the match; originals kept per keep_orig,
  emitted before synonyms at the same position.

Every assertAnalyzesTo from TestSolrSynonymParser.kt and
TestWordnetSynonymParser.kt passes verbatim (tests/test_synmap.py).
"""

from __future__ import annotations

WORD_SEPARATOR = "\x00"


class SynonymParseError(ValueError):
    """ParseException role — carries the 1-based line number."""

    def __init__(self, msg: str, line: int):
        super().__init__(f"{msg} at line {line}")
        self.line = line


class SynonymMap:
    """phrase-key → list of (output words tuple, keep_orig)."""

    def __init__(self):
        self.rules: dict[tuple[str, ...], list] = {}
        self._seen: set = set()

    def add(self, input_words: tuple[str, ...],
            output_words: tuple[str, ...], include_orig: bool) -> None:
        key = (input_words, output_words)
        if key in self._seen:  # dedup=true rule-level dedup
            return
        self._seen.add(key)
        self.rules.setdefault(tuple(input_words), []) \
            .append((tuple(output_words), include_orig))

    @property
    def max_input_len(self) -> int:
        return max((len(k) for k in self.rules), default=0)


class _Parser:
    """SynonymMap.Parser role: analyze each side with the supplied
    analyzer; reject empty analyses and position gaps."""

    def __init__(self, dedup: bool, expand: bool, analyzer=None):
        from .standard import StandardAnalyzer
        self.expand = expand
        self.analyzer = analyzer or StandardAnalyzer()
        self.map = SynonymMap()
        self._line = 0

    def analyze(self, text: str) -> tuple[str, ...]:
        dl, flat, _doc, pos = self.analyzer.analyze_flat([text])
        toks = flat.to_pylist()
        if not toks:
            raise SynonymParseError(
                f"term: {text} analyzes to nothing", self._line)
        expect = list(range(len(toks)))
        if pos.tolist() != expect:
            raise SynonymParseError(
                f"term: {text} analyzed to a token with posinc != 1",
                self._line)
        return tuple(toks)

    def build(self) -> SynonymMap:
        return self.map


class SolrSynonymParser(_Parser):
    def parse(self, text: str) -> "SolrSynonymParser":
        for ln, line in enumerate(text.splitlines(), start=1):
            self._line = ln
            if not line or line[0] == "#":
                continue
            sides = _split(line, "=>")
            if len(sides) > 1:
                if len(sides) != 2:
                    raise SynonymParseError(
                        "more than one explicit mapping specified on "
                        "the same line", ln)
                inputs = [self.analyze(_unescape(s).strip())
                          for s in _split(sides[0], ",")]
                outputs = [self.analyze(_unescape(s).strip())
                           for s in _split(sides[1], ",")]
                for i in inputs:
                    for o in outputs:
                        self.map.add(i, o, False)
            else:
                inputs = [self.analyze(_unescape(s).strip())
                          for s in _split(line, ",")]
                if self.expand:
                    for i, a in enumerate(inputs):
                        for j, b in enumerate(inputs):
                            if i != j:
                                self.map.add(a, b, True)
                else:
                    for a in inputs:
                        self.map.add(a, inputs[0], False)
        return self


class WordnetSynonymParser(_Parser):
    def parse(self, text: str) -> "WordnetSynonymParser":
        last_id = ""
        synset: list[tuple[str, ...]] = []
        for ln, line in enumerate(text.splitlines(), start=1):
            self._line = ln
            if not line.strip():
                continue
            syn_id = line[2:11]
            if syn_id != last_id:
                self._add_synset(synset)
                synset = []
            start = line.index("'") + 1
            end = line.rindex("'")
            synset.append(self.analyze(
                line[start:end].replace("''", "'")))
            last_id = syn_id
        self._add_synset(synset)
        return self

    def _add_synset(self, synset: list) -> None:
        if len(synset) <= 1:
            return
        if self.expand:
            for i, a in enumerate(synset):
                for j, b in enumerate(synset):
                    if i != j:
                        self.map.add(a, b, True)
        else:
            for a in synset:
                self.map.add(a, synset[0], False)


def _split(s: str, separator: str) -> list[str]:
    # SolrSynonymParser.split: backslash protects the NEXT char from
    # acting as a separator (the backslash itself is kept for unescape)
    out: list[str] = []
    buf = []
    pos, end = 0, len(s)
    while pos < end:
        if s.startswith(separator, pos):
            if buf:
                out.append("".join(buf))
                buf = []
            pos += len(separator)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            buf.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i < len(s) - 1:
            i += 1
            ch = s[i]
        out.append(ch)
        i += 1
    return "".join(out)


def apply_synonyms(tokens: list[str], smap: SynonymMap,
                   ignore_case: bool = False) -> list[tuple[str, int]]:
    """Flattened SynonymFilter semantics over a token list → list of
    (token, position). Greedy longest match, non-overlapping; output
    word j overlays match position start+j while j < match_len; longer
    outputs open new positions immediately after the match; at one
    position originals come before synonyms, synonyms in add order."""
    if not smap.rules:
        return [(t, p) for p, t in enumerate(tokens)]
    max_len = smap.max_input_len
    keys = tokens if not ignore_case else [t.lower() for t in tokens]
    out: list[tuple[str, int]] = []
    pos = 0  # output position counter
    i = 0
    n = len(tokens)
    while i < n:
        match_len = 0
        outputs = None
        for ln in range(min(max_len, n - i), 0, -1):
            cand = tuple(keys[i:i + ln])
            hit = smap.rules.get(cand)
            if hit is not None:
                match_len, outputs = ln, hit
                break
        if outputs is None:
            out.append((tokens[i], pos))
            i += 1
            pos += 1
            continue
        keep_orig = any(k for _, k in outputs)
        max_out = max(len(w) for w, _ in outputs)
        span = max(match_len, max_out)
        # bucket[j] = tokens at output position pos+j
        buckets: list[list[str]] = [[] for _ in range(span)]
        if keep_orig:
            for j in range(match_len):
                buckets[j].append(tokens[i + j])
        for words, _k in outputs:
            for j, w in enumerate(words):
                buckets[j].append(w)
        for j, b in enumerate(buckets):
            for t in b:
                out.append((t, pos + j))
        emitted = sum(1 for b in buckets if b)
        pos += emitted
        i += match_len
    return out


class SynonymFilterAnalyzer:
    """tokenizer → SynonymFilter(map) as a callable analyzer; the
    tokenizer is any repo analyzer (default: case-preserving
    whitespace, the reference tests' MockTokenizer.WHITESPACE)."""

    name = "synonym_map"

    def __init__(self, smap: SynonymMap, base=None,
                 ignore_case: bool = False):
        from .core import WhitespaceAnalyzer
        self.smap = smap
        self.base = base or WhitespaceAnalyzer()
        self.ignore_case = ignore_case

    def tokens_pos(self, text: str) -> list[tuple[str, int]]:
        return apply_synonyms(self.base(text), self.smap,
                              self.ignore_case)

    def __call__(self, text: str) -> list[str]:
        return [t for t, _ in self.tokens_pos(text)]

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
            tp = self.tokens_pos(text or "")
            flat.extend(t for t, _ in tp)
            pos_l.extend(p for _, p in tp)
            doc_of_l.extend([i] * len(tp))
            doc_lengths[i] = len(tp)
        return (doc_lengths, pa.array(flat, pa.string()),
                np.array(doc_of_l, dtype=np.int64),
                np.array(pos_l, dtype=np.int64))
