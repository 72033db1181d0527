"""Delta+FOR posting-block codec round-trips (ForUtil/ForDeltaUtil semantics)."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_kmp_ray.util import forutil as fu


def test_block_size_matches_reference():
    assert fu.BLOCK_SIZE == 128  # ForUtil.kt:121


def test_pack_roundtrip_widths():
    rng = np.random.default_rng(1)
    for w in range(0, 33):
        vals = rng.integers(0, 2**w if w else 1, size=300, dtype=np.int64)
        assert np.array_equal(fu.unpack_ints(fu.pack_ints(vals, w), 300, w), vals)


def test_encode_blocks_roundtrip_sizes():
    rng = np.random.default_rng(2)
    for n in [0, 1, 127, 128, 129, 255, 256, 1000, 5000]:
        vals = rng.integers(0, 10**6, size=n, dtype=np.int64)
        assert np.array_equal(fu.decode_blocks(fu.encode_blocks(vals), n), vals)


def test_delta_roundtrip_docids():
    rng = np.random.default_rng(3)
    docs = np.sort(rng.choice(10**7, size=4096, replace=False))
    d = fu.delta_encode(docs)
    assert (d[1:] >= 1).all()  # strictly increasing docIDs → gaps >= 1
    assert np.array_equal(fu.delta_decode(d), docs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=400))
def test_encode_blocks_property(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(fu.decode_blocks(fu.encode_blocks(v), len(v)), v)
