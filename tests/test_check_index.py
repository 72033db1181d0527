"""CheckIndex analog: clean index passes; corruption is detected
(TestCheckIndex style, SURVEY §5)."""

import json
import shutil

import pyarrow.parquet as pq

from lucene_kmp_ray.index.check import check_index, check_segment


def test_clean_index_passes(built_index, ray_session):
    report = check_index(built_index)
    assert report["ok"], report["errors"]
    assert all(r["ok"] for r in report["segments"])
    assert report["doc_count"] == 500


def test_corrupt_stats_detected(built_index, tmp_path):
    work = str(tmp_path / "corrupt")
    shutil.copytree(built_index, work)
    # corrupt one segment's manifest stats
    with open(f"{work}/segments/seg=00000/manifest.json") as f:
        man = json.load(f)
    man["sum_total_term_freq"] += 7
    with open(f"{work}/segments/seg=00000/manifest.json", "w") as f:
        json.dump(man, f)
    rep = check_segment(work, "segments/seg=00000")
    assert not rep["ok"]
    assert any("sum_total_term_freq" in e for e in rep["errors"])


def test_corrupt_postings_detected(built_index, tmp_path):
    work = str(tmp_path / "corrupt2")
    shutil.copytree(built_index, work)
    p = f"{work}/segments/seg=00001/terms.parquet"
    t = pq.read_table(p)
    # flip a df: decoded postings no longer match the claimed df
    import pyarrow as pa
    dfs = t["df"].to_pylist()
    dfs[0] += 1
    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(dfs, pa.int64()))
    pq.write_table(t, p)
    rep = check_segment(work, "segments/seg=00001")
    assert not rep["ok"]


def test_corrupt_term_vectors_detected(tmp_path):
    """CheckIndex's 'test: term vectors...' section: a freq that
    disagrees with its positions list is caught."""
    import pyarrow as pa

    from lucene_kmp_ray.index.builder import commit_index
    from lucene_kmp_ray.index.check import check_segment
    from lucene_kmp_ray.index.format import build_and_write_segment

    idx = str(tmp_path / "tvidx")
    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "url": ["u0", "u1"],
                     "text": ["a b a", "c"]})
    man = build_and_write_segment(docs, 0, idx, store_term_vectors=True)
    commit_index(idx, [man])
    p = f"{idx}/segments/seg=00000/tvectors.parquet"
    t = pq.read_table(p)
    freqs = t["freq"].to_pylist()
    freqs[0] += 1
    t = t.set_column(t.schema.get_field_index("freq"), "freq",
                     pa.array(freqs, pa.int32()))
    pq.write_table(t, p)
    rep = check_segment(idx, "segments/seg=00000")
    assert not rep["ok"]
    assert any("freq != len(positions)" in e for e in rep["errors"])
