"""Term ordinals — the BlockTreeOrds codec role + OrdinalMap.

The reference carries a whole ord-indexed term dictionary codec
(``codecs/blocktreeords/OrdsBlockTreeTermsWriter.kt`` /
``OrdsSegmentTermsEnum.kt``: every block additionally stores how many
terms precede it so ``seekExact(ord)`` / ``ord()`` walk the tree) and a
cross-segment ordinal join (``index/OrdinalMap.kt``: per-segment term
ords → global ords over the merged vocabulary).

Here the segment term dictionary is ALREADY a (field, term)-sorted
Parquet table (index/format.py), so the per-field ord of a term is its
row offset inside the field's contiguous slice — seek-by-ord is an
array index and ord() falls out of the same binary search
``SegmentReader.term_index`` already does. No extra sidecar is needed;
this module only adds the enum surface and the cross-segment map:

- ``TermsOrdEnum``: ``next / term / ord / seek_exact / seek_exact_ord /
  seek_ceil`` with the reference's SeekStatus contract
  (``TestOrdsBlockTree.kt:37-120`` testBasic, ``:292`` testEnum,
  ``:500`` testSeekCeilNotFound).
- ``OrdinalMap``: merged distinct vocabulary across segment readers;
  maps (segment, segment ord) → global ord and global ord → term
  (``index/OrdinalMap.kt`` getGlobalOrds/lookupTerm role).

Scale note: OrdinalMap.build merges per-segment vocab string arrays on
the caller (np.unique k-way merge) — the vocabulary is the memory-
bounded side (≪ postings); the 100-TB path for a *global* vocabulary
job is the distributed ``groupby(term)`` in index/grouped.py, not this
reader-side join.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SeekStatus", "TermsOrdEnum", "OrdinalMap"]


class SeekStatus:
    """TermsEnum.SeekStatus (core/index/TermsEnum.kt)."""

    END = "END"
    FOUND = "FOUND"
    NOT_FOUND = "NOT_FOUND"


class TermsOrdEnum:
    """Ord-positioned terms enum over one segment's field slice of the
    sorted Parquet term dictionary (OrdsSegmentTermsEnum role)."""

    def __init__(self, segment_reader, field: str = "text"):
        segment_reader.terms_table  # materialize the vocabulary strings
        self._lo, self._hi = segment_reader.field_range(field)
        self._arr = segment_reader._term_arr
        self._ord = -1  # unpositioned

    def size(self) -> int:
        return self._hi - self._lo

    # -- positioning ---------------------------------------------------------

    def next(self) -> str | None:
        """Advance; None past the last term (ord then stays at size)."""
        if self._ord + 1 >= self.size():
            self._ord = self.size()
            return None
        self._ord += 1
        return self.term()

    def ord(self) -> int:
        if self._ord < 0 or self._ord >= self.size():
            raise ValueError("enum is unpositioned")
        return self._ord

    def term(self) -> str | None:
        if self._ord < 0 or self._ord >= self.size():
            return None
        return str(self._arr[self._lo + self._ord])

    # -- seeking -------------------------------------------------------------

    def seek_exact_ord(self, ord: int) -> None:
        """seekExact(long) — caller promises 0 <= ord < size."""
        if not (0 <= ord < self.size()):
            raise IndexError(f"ord {ord} outside [0, {self.size()})")
        self._ord = int(ord)

    def seek_exact(self, term: str) -> bool:
        i = int(np.searchsorted(self._arr[self._lo:self._hi], term))
        if i < self.size() and self._arr[self._lo + i] == term:
            self._ord = i
            return True
        return False

    def seek_ceil(self, term: str) -> str:
        """Position on the smallest term >= ``term``; returns the
        SeekStatus (END leaves the enum unpositioned, like the
        exhausted reference enum)."""
        i = int(np.searchsorted(self._arr[self._lo:self._hi], term))
        if i >= self.size():
            self._ord = self.size()
            return SeekStatus.END
        self._ord = i
        return (SeekStatus.FOUND
                if self._arr[self._lo + i] == term
                else SeekStatus.NOT_FOUND)


class OrdinalMap:
    """Global ordinals over N segment term dictionaries
    (core/index/OrdinalMap.kt).

    ``global_ords[s]`` maps segment ``s``'s per-field ords to ords in
    the merged distinct vocabulary ``values`` (sorted, so global ords
    compare like terms — the invariant OrdinalMap guarantees).
    ``first_segment`` / ``first_segment_ord`` record, per global ord,
    the first segment containing the term (getFirstSegmentNumber /
    getFirstSegmentOrd)."""

    def __init__(self, values: np.ndarray,
                 global_ords: list[np.ndarray],
                 first_segment: np.ndarray,
                 first_segment_ord: np.ndarray):
        self.values = values
        self.global_ords = global_ords
        self.first_segment = first_segment
        self.first_segment_ord = first_segment_ord

    @classmethod
    def build(cls, segment_readers, field: str = "text") -> "OrdinalMap":
        vocabs = []
        for sr in segment_readers:
            sr.terms_table
            lo, hi = sr.field_range(field)
            vocabs.append(sr._term_arr[lo:hi])
        if vocabs:
            merged = np.unique(np.concatenate(vocabs))
        else:
            merged = np.array([], dtype=object)
        global_ords = [np.searchsorted(merged, v).astype(np.int64)
                       for v in vocabs]
        first_segment = np.full(len(merged), -1, dtype=np.int64)
        first_segment_ord = np.full(len(merged), -1, dtype=np.int64)
        for s in range(len(vocabs) - 1, -1, -1):
            g = global_ords[s]
            first_segment[g] = s
            first_segment_ord[g] = np.arange(len(g), dtype=np.int64)
        return cls(merged, global_ords, first_segment, first_segment_ord)

    @property
    def value_count(self) -> int:
        return len(self.values)

    def global_ord(self, segment: int, segment_ord: int) -> int:
        return int(self.global_ords[segment][segment_ord])

    def term_at(self, global_ord: int) -> str:
        return str(self.values[global_ord])

    def lookup_term(self, term: str) -> int:
        """Global ord of ``term``, or -1 if absent (lookupTerm role)."""
        i = int(np.searchsorted(self.values, term))
        if i < len(self.values) and self.values[i] == term:
            return i
        return -1

    def seek_ceil(self, term: str) -> tuple[str, int]:
        """(SeekStatus, global ord) of the smallest term >= ``term``;
        ord is value_count at END (the merged-enum contract used by the
        term_ords_seek driver entry)."""
        i = int(np.searchsorted(self.values, term))
        if i >= len(self.values):
            return SeekStatus.END, len(self.values)
        return (SeekStatus.FOUND if self.values[i] == term
                else SeekStatus.NOT_FOUND), i
