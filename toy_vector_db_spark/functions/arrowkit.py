"""Zero-copy bridges between Arrow list columns and numpy matrices.

The Arrow kernels in knn.py / similarity.py move fixed-dimension vector
columns in and out of numpy. The obvious spellings —
``np.array(col.to_pylist())`` on the way in and ``pa.array(mat.tolist())``
on the way out — materialize every element as a Python float object; at
PQ_K=256 the LUT frame alone built ~8M boxed floats per batch (measured
640× slower than the buffer path for the output side). These helpers do
the same conversions over the underlying buffers, bit-identically:
float32→float64 casts are value-exact, and reshape/flatten reorder
nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_col_to_matrix(col: pa.Array, dtype=np.float64) -> np.ndarray:
    """(n, d) numpy matrix from a fixed-length list column, via the value
    buffer (``flatten()`` honors array offsets, so sliced batches are
    safe). Raises if rows are ragged — vector columns are fixed-dim by
    contract, and a silent misalignment would scramble every row after
    the first short one. Null rows are rejected up front: ``flatten()``
    silently DROPS a null row's slot, and when the remaining value count
    still divides n (one null in a batch whose d divides n) the ragged
    guard below would pass and the reshape would shift every subsequent
    vector by d — exactly the silent misalignment this function exists
    to prevent (advice r8 item 1)."""
    n = len(col)
    if col.null_count:
        raise ValueError(
            f"list column has {col.null_count} null rows; vector columns "
            "are non-null by contract"
        )
    flat = np.asarray(col.flatten(), dtype=dtype)
    if n == 0:
        return flat.reshape(0, 0)
    if flat.size % n:
        raise ValueError(
            f"ragged list column: {flat.size} values over {n} rows"
        )
    return flat.reshape(n, flat.size // n)


def matrix_to_list_array(mat: np.ndarray) -> pa.ListArray:
    """list<double> Arrow array from an (n, d) float64 matrix, zero-copy:
    one flat value buffer + an arithmetic offsets buffer, no per-element
    boxing. Equal (``pa.Array.equals``) to ``pa.array(mat.tolist(),
    type=pa.list_(pa.float64()))``."""
    n, d = mat.shape
    flat = pa.array(mat.reshape(-1), type=pa.float64())
    if d == 0:  # degenerate: n empty lists (np.arange rejects step 0)
        offsets = pa.array(np.zeros(n + 1, dtype=np.int32))
    else:
        offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, flat)
