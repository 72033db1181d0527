"""SimpleText postings codec — export, parse-back, checksum footer.

Reference: ``codecs/simpletext/SimpleTextFieldsWriter.kt`` line markers
and ``SimpleTextUtil.kt`` escape/checksum protocol
(``TestSimpleTextPostingsFormat.kt`` runs the round-trip suite against
the same layout).
"""

import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import commit_index
from lucene_kmp_ray.index.format import build_and_write_segment
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.index.simpletext import (export_segment_postings,
                                             read_simpletext)


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("st") / "idx")
    docs = pa.table({
        "doc_id": pa.array([5, 9, 12], pa.int64()),
        "url": ["u5", "u9", "u12"],
        "text": ["b a b", "a c", "b b b"],
        "title": ["t one", "t two", ""],
    })
    man = build_and_write_segment(docs, 0, idx, fields=("text", "title"))
    commit_index(idx, [man])
    return IndexReader(idx).segment_readers[0]


def test_golden_layout(seg):
    """Exact byte layout for the text field — the SimpleTextFieldsWriter
    markers, two-space indents and END sentinel."""
    data = export_segment_postings(seg, fields=("text",))
    body = data[:data.rfind(b"checksum ")].decode()
    assert body == (
        "field text\n"
        "  term a\n"
        "    doc 5\n"
        "      freq 1\n"
        "      pos 1\n"
        "    doc 9\n"
        "      freq 1\n"
        "      pos 0\n"
        "  term b\n"
        "    doc 5\n"
        "      freq 2\n"
        "      pos 0\n"
        "      pos 2\n"
        "    doc 12\n"
        "      freq 3\n"
        "      pos 0\n"
        "      pos 1\n"
        "      pos 2\n"
        "  term c\n"
        "    doc 9\n"
        "      freq 1\n"
        "      pos 1\n"
        "END\n"
    )


def test_round_trip_matches_reader(seg):
    data = export_segment_postings(seg)
    parsed = read_simpletext(data)
    assert set(parsed) == {"text", "title"}
    doc_ids = seg.doc_meta["doc_id"].to_numpy()
    for field, terms in parsed.items():
        for term, postings in terms.items():
            docs, freqs, pos = seg.postings(term, positions=True,
                                            field=field)
            assert [doc_ids[d] for d in docs] == [p[0] for p in postings]
            assert list(freqs) == [p[1] for p in postings]
            flat = [x for p in postings for x in p[2]]
            assert list(pos) == flat


def test_checksum_detects_corruption(seg):
    data = bytearray(export_segment_postings(seg))
    i = data.index(b"freq")
    data[i + 6] = ord("9")  # flip a digit
    with pytest.raises(ValueError, match="checksum failed"):
        read_simpletext(bytes(data))


def test_escape_round_trip():
    """Terms containing newline/backslash escape like SimpleTextUtil."""
    class FakeAnalyzer:
        name = "fake"

        def analyze_flat(self, texts):
            import numpy as np
            import pyarrow as _pa
            toks = [["a\nb", "c\\d"], ["a\nb"]]
            flat = _pa.array([t for ts in toks for t in ts])
            lens = np.array([len(t) for t in toks])
            doc_of = np.repeat(np.arange(len(toks)), lens)
            starts = np.append(0, np.cumsum(lens))[:-1]
            positions = np.arange(len(flat)) - np.repeat(starts, lens)
            return lens, flat, doc_of, positions

        def __call__(self, text):
            return [text]

    import tempfile
    idx = tempfile.mkdtemp()
    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "url": ["u0", "u1"], "text": ["x", "y"]})
    man = build_and_write_segment(docs, 0, idx, analyzer=FakeAnalyzer())
    commit_index(idx, [man])
    sr = IndexReader(idx).segment_readers[0]
    parsed = read_simpletext(export_segment_postings(sr))
    assert set(parsed["text"]) == {"a\nb", "c\\d"}
    assert parsed["text"]["a\nb"] == [(0, 1, [0]), (1, 1, [0])]
