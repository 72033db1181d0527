"""SmallFloat codec properties (util/SmallFloat.kt:87-148 semantics)."""
import numpy as np
import pytest

from lucene_kmp_ray.util import smallfloat as sf


def test_known_constants():
    assert sf.MAX_INT4 == sf.long_to_int4(2**31 - 1)
    assert sf.NUM_FREE_VALUES == 24  # 255 - MAX_INT4
    # values below NUM_FREE_VALUES are exact
    for i in range(24):
        assert sf.int_to_byte4(i) == i
        assert sf.byte4_to_int(i) == i


def test_roundtrip_is_floor_of_representables():
    xs = np.arange(0, 200_000)
    enc = sf.int_to_byte4_np(xs)
    dec = sf.byte4_to_int_np(enc)
    assert (dec <= xs).all()
    # largest representable <= x: encoding x+1 never decodes to <= x unless equal
    reps = np.unique(sf.LENGTH_TABLE_INT)
    idx = np.searchsorted(reps, xs, side="right") - 1
    assert np.array_equal(dec, reps[idx])


def test_monotonic():
    xs = np.arange(0, 1_000_000, 7)
    enc = sf.int_to_byte4_np(xs).astype(int)
    assert (np.diff(enc) >= 0).all()
    assert (np.diff(sf.LENGTH_TABLE_INT) > 0).all()  # decode strictly increasing


def test_scalar_vector_agree():
    xs = list(range(5000)) + [2**31 - 1, 10**6, 10**9]
    vec = sf.int_to_byte4_np(np.array(xs))
    assert [sf.int_to_byte4(x) for x in xs] == list(vec)


def test_negative_rejected():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
    with pytest.raises(ValueError):
        sf.long_to_int4(-5)
