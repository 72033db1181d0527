"""UAX29URLEmailAnalyzer conformance — vectors from the reference's
TestUAX29URLEmailAnalyzer.kt (emails, scheme/no-scheme URLs, the
LUCENE-3880 mailto case, TLD-vs-ALPHANUM decisions)."""
from lucene_kmp_ray.analysis.urlemail import UAX29URLEmailAnalyzer

A = UAX29URLEmailAnalyzer()


def test_basic_emails():
    assert A("one test@example.com two three [A@example.CO.UK] "
             '"ArakaBanassaMassanaBakarA" <info@Info.info>') == \
        ["one", "test@example.com", "two", "three", "a@example.co.uk",
         "arakabanassamassanabakara", "info@info.info"]


def test_mailto_scheme_email():
    # LUCENE-3880
    assert A("MAILTO:Test@Example.ORG") == ["mailto", "test@example.org"]


def test_basic_urls():
    assert A("a <HTTPs://example.net/omg/isnt/that/NICE?no=its&n%30t"
             "#mntl-E>b-D ftp://www.example.com/ABC.txt "
             "file:///C:/path/to/a/FILE.txt C") == \
        ["a", "https://example.net/omg/isnt/that/nice?no=its&n%30t#mntl-e",
         "b", "d", "ftp://www.example.com/abc.txt",
         "file:///c:/path/to/a/file.txt", "c"]


def test_no_scheme_urls():
    assert A("<index.ph>") == ["index.ph"]
    assert A("index.ph") == ["index.ph"]
    assert A("index.php") == ["index.php"]          # php not a TLD
    assert A("index.phα") == ["index.phα"]
    assert A("index-h.php") == ["index", "h.php"]
    assert A("index2.php") == ["index2", "php"]     # digit.letter splits
    assert A("index2.ph９,") == ["index2", "ph９"]
    assert A("example.com,example.ph,index.php,index2.php,example2.ph") == \
        ["example.com", "example.ph", "index.php", "index2", "php",
         "example2.ph"]
    assert A("example.com:8080 example.com/path/here "
             "example.com?query=something example.com#fragment") == \
        ["example.com:8080", "example.com/path/here",
         "example.com?query=something", "example.com#fragment"]
    assert A("example.com:8080/path/here?query=something#fragment") == \
        ["example.com:8080/path/here?query=something#fragment"]


def test_plain_text_falls_through_to_standard_rules():
    assert A("David has 5000 bones") == ["david", "has", "5000", "bones"]
    assert A("21.35 216.239.63.104 R2D2") == \
        ["21.35", "216.239.63.104", "r2d2"]
    assert A("O'Reilly's") == ["o'reilly's"]
    assert A("我是中国人。 １２３４ Ｔｅｓｔｓ ") == \
        ["我", "是", "中", "国", "人", "１２３４", "ｔｅｓｔｓ"]
    assert A("") == []


def test_analyze_flat_matches_scalar():
    texts = ["visit example.com now", "mail a@b.org", "", "plain words"]
    dl, flat, doc_of, pos = A.analyze_flat(texts)
    assert flat.to_pylist() == [t for txt in texts for t in A(txt)]
    assert dl.tolist() == [len(A(t)) for t in texts]


def test_end_to_end_url_term_query(ray_session, tmp_path):
    """URLs are single index terms: TermQuery on the full URL matches."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_kmp_ray.index.builder import build_index
    from lucene_kmp_ray.index.reader import IndexReader
    from lucene_kmp_ray.search import Searcher, TermQuery

    texts = ["see https://example.net/a?x=1 for details",
             "mail me at Bob@Corp.COM please",
             "nothing here"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(3)], pa.string()),
        "text": pa.array(texts, pa.string())}))
    idx = str(tmp_path / "ue")
    build_index(ds, idx, segment_size=10, analyzer=UAX29URLEmailAnalyzer())
    s = Searcher(IndexReader(idx))
    assert [h.doc_id for h in
            s.search(TermQuery("https://example.net/a?x=1"),
                     k=10).score_docs] == [0]
    assert [h.doc_id for h in
            s.search(TermQuery("bob@corp.com"), k=10).score_docs] == [1]
