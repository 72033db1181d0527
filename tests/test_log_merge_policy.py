"""LogDocMergePolicy leveling vectors (reference
core/src/commonTest/.../index/TestLogMergePolicy.kt:60-270) against the
manifest-math port in index/merge.py."""
from lucene_kmp_ray.index.merge import MERGE_POLICIES, find_merges_log


def _segs(sizes):
    return [{"seg": i, "doc_count": s, "sum_total_term_freq": s * 7}
            for i, s in enumerate(sizes)]


def _apply(sizes, merges):
    merged = {s for m in merges for s in m}
    out = [sz for i, sz in enumerate(sizes) if i not in merged]
    return sorted([sum(sizes[i] for i in m) for m in merges] + out,
                  reverse=True)


def test_increasing_segment_sizes():
    # TestLogMergePolicy.testIncreasingSegmentSizes: 11 segments of
    # 1000..11000 docs -> one merge of the first 10 -> [55000, 11000]
    sizes = [(i + 1) * 1000 for i in range(11)]
    merges = find_merges_log(_segs(sizes))
    assert merges == [list(range(10))]
    assert _apply(sizes, merges) == [55000, 11000]


def test_one_small_middle_segment():
    # testOneSmallMiddleSegment: a small segment in the middle doesn't
    # prevent merging -> [90100, 10000]
    sizes = [10000] * 5 + [100] + [10000] * 5
    merges = find_merges_log(_segs(sizes))
    assert _apply(sizes, merges) == [90100, 10000]


def test_many_small_middle_segments():
    # testManySmallMiddleSegment -> [10900, 10000]
    sizes = [10000] + [100] * 9 + [10000]
    merges = find_merges_log(_segs(sizes))
    assert _apply(sizes, merges) == [10900, 10000]


def test_reject_unbalanced_merges():
    # testRejectUnbalancedMerges (minMergeDocs=10000): 100 + 9x1 docs is
    # too unbalanced -> no merge; a 10th 1-doc segment allows merging
    # the ten 1-doc segments
    sizes = [100] + [1] * 9
    assert find_merges_log(_segs(sizes), min_merge_size=10000) == []
    sizes.append(1)
    merges = find_merges_log(_segs(sizes), min_merge_size=10000)
    assert merges == [list(range(1, 11))]
    assert _apply(sizes, merges) == [100, 10]


def test_adjacency_preserved_and_registry():
    # Log policies merge ADJACENT segments only (docID order holds)
    sizes = [50, 60, 55, 45, 52, 58, 49, 61, 53, 47, 56, 54]
    for m in find_merges_log(_segs(sizes), merge_factor=4,
                             min_merge_size=10):
        assert m == list(range(m[0], m[-1] + 1))
    assert MERGE_POLICIES["none"](_segs(sizes)) == []
    assert MERGE_POLICIES["log_doc"] is find_merges_log
    # log_size keys off postings volume (sum_total_term_freq)
    assert MERGE_POLICIES["log_size"](_segs(sizes), merge_factor=4,
                                      min_merge_size=70) \
        == find_merges_log(_segs(sizes), merge_factor=4, min_merge_size=70,
                           size_key="sum_total_term_freq")


def test_oversize_singleton_skipped():
    # a segment above maxMergeSize is never merged (kt:616-625)
    sizes = [10**6] + [1000] * 10
    merges = find_merges_log(_segs(sizes), max_merge_size=50_000)
    assert all(0 not in m for m in merges)
    assert merges == [list(range(1, 11))]
