"""util/vecs.matrix_from_list_column — dense unpack equivalence vs vstack."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_kmp_ray.util.vecs import matrix_from_list_column


def _ref(col):
    rows = col.to_pandas().to_numpy() if hasattr(col, "to_pandas") else col
    return np.vstack(list(rows)).astype(np.float64)


def test_fixed_dim_list_array():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(37, 16)).astype(np.float32)
    arr = pa.array(list(m), pa.list_(pa.float32()))
    out = matrix_from_list_column(arr)
    assert out.shape == (37, 16) and out.dtype == np.float64
    np.testing.assert_allclose(out, m.astype(np.float64))


def test_chunked_array_combines():
    a = pa.chunked_array([pa.array([[1.0, 2.0]], pa.list_(pa.float32())),
                          pa.array([[3.0, 4.0]], pa.list_(pa.float32()))])
    out = matrix_from_list_column(a)
    np.testing.assert_allclose(out, [[1, 2], [3, 4]])


def test_fixed_size_list_array():
    flat = pa.array(np.arange(12, dtype=np.float32))
    arr = pa.FixedSizeListArray.from_arrays(flat, 4)
    out = matrix_from_list_column(arr)
    np.testing.assert_allclose(out, np.arange(12).reshape(3, 4))


def test_sliced_offset_respected():
    m = np.arange(20, dtype=np.float32).reshape(5, 4)
    arr = pa.array(list(m), pa.list_(pa.float32())).slice(2, 2)
    out = matrix_from_list_column(arr)
    np.testing.assert_allclose(out, m[2:4])


def test_ragged_falls_back():
    arr = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        matrix_from_list_column(arr)  # vstack raises on ragged — same as before


def test_empty():
    arr = pa.array([], pa.list_(pa.float32()))
    assert matrix_from_list_column(arr).shape == (0, 0)


def test_pandas_series_fallback():
    import pandas as pd
    s = pd.Series([np.array([1.0, 2.0]), np.array([3.0, 4.0])])
    np.testing.assert_allclose(matrix_from_list_column(s), [[1, 2], [3, 4]])
