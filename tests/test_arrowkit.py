"""functions/arrowkit.py — the zero-copy Arrow↔numpy bridges under the
vector kernels. These are pure-python/pyarrow tests (no Spark session):
the properties that matter are value-identity with the boxing forms they
replaced, offset-safety on sliced batches, and loud failure on ragged
input (a silent misalignment would scramble every vector after the first
short row)."""

import numpy as np
import pyarrow as pa
import pytest

from toy_vector_db_spark.functions.arrowkit import (
    list_col_to_matrix,
    matrix_to_list_array,
)


def test_matrix_roundtrip_equals_boxing_forms():
    rng = np.random.default_rng(3)
    mat = rng.random((40, 256))
    out = matrix_to_list_array(mat)
    boxed = pa.array(mat.tolist(), type=pa.list_(pa.float64()))
    assert out.cast(pa.list_(pa.float64())).equals(boxed)
    back = list_col_to_matrix(out)
    assert back.shape == mat.shape and (back == mat).all()


def test_ingest_matches_to_pylist_for_float32():
    rng = np.random.default_rng(4)
    mat32 = rng.random((17, 64)).astype(np.float32)
    col = pa.array([row for row in mat32], type=pa.list_(pa.float32()))
    ours = list_col_to_matrix(col)
    theirs = np.array(col.to_pylist(), dtype=np.float64)
    assert ours.dtype == np.float64
    assert (ours == theirs).all()  # float32→float64 is value-exact


def test_sliced_batch_honors_offsets():
    """RecordBatch slices shift the list array's offset; flatten() must
    return only the referenced values, not the buffer prefix."""
    mat = np.arange(60, dtype=np.float64).reshape(10, 6)
    col = pa.array(mat.tolist(), type=pa.list_(pa.float64()))
    sliced = col.slice(3, 4)
    out = list_col_to_matrix(sliced)
    assert (out == mat[3:7]).all()


def test_zero_width_matrix_roundtrips():
    """The (n, 0) degenerate — including the (0, 0) its own inverse
    returns — must build valid empty lists, not trip np.arange."""
    out = matrix_to_list_array(np.zeros((3, 0)))
    assert len(out) == 3 and out.to_pylist() == [[], [], []]
    assert len(matrix_to_list_array(np.zeros((0, 0)))) == 0


def test_empty_and_ragged():
    assert list_col_to_matrix(pa.array([], type=pa.list_(pa.float64()))).shape == (0, 0)
    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        list_col_to_matrix(ragged)


def test_null_rows_rejected_loudly():
    """Advice r8 item 1: flatten() DROPS null rows' slots, and when the
    surviving value count still divides n the ragged guard passes and
    the reshape silently shifts every later vector — exactly the failure
    the guard exists to prevent. One null in a 4-row d=4 column leaves
    12 values over 4 rows (12 % 4 == 0): must raise, not return (4, 3)."""
    col = pa.array(
        [[1.0] * 4, None, [2.0] * 4, [3.0] * 4], type=pa.list_(pa.float64())
    )
    with pytest.raises(ValueError, match="null"):
        list_col_to_matrix(col)
    # a slice that excludes the null row is fine (null_count is per-slice)
    assert list_col_to_matrix(col.slice(2, 2)).shape == (2, 4)
