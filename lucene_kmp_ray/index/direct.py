"""DirectPostingsFormat role — a field's postings fully decoded in RAM.

The reference's ``codecs/memory/DirectPostingsFormat.kt`` wraps the
on-disk postings and, at open, loads every term's docs/freqs into plain
arrays ("bytes are loaded up-front"), trading heap for the fastest
possible postings access — the hot-segment / testing codec.

Engine form: one Parquet read of the field's payload row-groups, then
ONE bulk C pass per column (``util/cfor.decode_streams_bulk``, the same
kernel the k-way merge reads with) into CSR arrays::

    docs_flat[offs[o]:offs[o+1]], freqs_flat[offs[o]:offs[o+1]]

keyed by the field-local term ord (index/ords.py). ``SegmentReader``
consults an attached DirectField before its lazy per-term row-group
path, so every search path that goes through ``postings()`` gets the
in-memory postings transparently.

Scale note: direct mode holds ~``sum_ttf`` int64s per field per actor —
size it like the reference does (hot segments, small-but-hammered
indexes), not as the default; the lazy row-group reader stays the
100-TB path.
"""

from __future__ import annotations

import numpy as np

from ..util import forutil as fu

__all__ = ["DirectField"]


class DirectField:
    """One field's postings decoded up-front (DirectPostingsFormat)."""

    def __init__(self, segment_reader, field: str = "text"):
        segment_reader.terms_table
        lo, hi = segment_reader.field_range(field)
        self.field = field
        self._lo = lo
        self._arr = segment_reader._term_arr
        self.size = hi - lo
        idxs = np.arange(lo, hi, dtype=np.int64)
        cols = ["df", "ttf", "docs_enc", "freqs_enc"]
        t = segment_reader._payload_rows(idxs, cols)
        self.df = t["df"].to_numpy().astype(np.int64)
        self.ttf = t["ttf"].to_numpy().astype(np.int64)
        self.offs = np.empty(self.size + 1, np.int64)
        self.offs[0] = 0
        np.cumsum(self.df, out=self.offs[1:])

        from ..util.cfor import decode_streams_bulk
        bulk = decode_streams_bulk(t["docs_enc"], self.df)
        if bulk is not None:
            d_flat, _ = bulk
            f_flat, _ = decode_streams_bulk(t["freqs_enc"], self.df)
            if len(d_flat):
                # per-stream delta restart: global cumsum minus each
                # stream's carried prefix (merge.py's read-side trick)
                cs = np.cumsum(d_flat)
                st = self.offs[:-1]
                carried = cs[st] - d_flat[st]
                d_flat = cs - np.repeat(carried, self.df)
            self.docs_flat = d_flat
            self.freqs_flat = f_flat
        else:
            # numpy fallback: per-term block decode (reference path)
            docs_parts, freq_parts = [], []
            denc = t["docs_enc"].to_pylist()
            fenc = t["freqs_enc"].to_pylist()
            for i in range(self.size):
                n = int(self.df[i])
                docs_parts.append(
                    fu.delta_decode(fu.decode_blocks(denc[i], n)))
                freq_parts.append(fu.decode_blocks(fenc[i], n))
            self.docs_flat = (np.concatenate(docs_parts)
                              if docs_parts else np.empty(0, np.int64))
            self.freqs_flat = (np.concatenate(freq_parts)
                               if freq_parts else np.empty(0, np.int64))

    # -- lookups --------------------------------------------------------------

    def ord_of(self, term: str) -> int:
        """Field-local ord, or -1 (the DirectField binary search)."""
        i = int(np.searchsorted(
            self._arr[self._lo:self._lo + self.size], term))
        if i < self.size and self._arr[self._lo + i] == term:
            return i
        return -1

    def postings_ord(self, ord: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = self.offs[ord], self.offs[ord + 1]
        return self.docs_flat[s:e], self.freqs_flat[s:e]

    def postings(self, term: str):
        o = self.ord_of(term)
        if o < 0:
            return None
        return self.postings_ord(o)

    def doc_freq(self, term: str) -> int:
        o = self.ord_of(term)
        return int(self.df[o]) if o >= 0 else 0

    def total_term_freq(self, term: str) -> int:
        o = self.ord_of(term)
        return int(self.ttf[o]) if o >= 0 else 0

    def ram_bytes_used(self) -> int:
        """ramBytesUsed() accountable role."""
        return (self.docs_flat.nbytes + self.freqs_flat.nbytes +
                self.df.nbytes + self.ttf.nbytes + self.offs.nbytes)
