"""Zero-copy unpacking of Arrow embedding columns into numpy matrices.

Every ANN / embedding stage needs the ``embedding: list<float>`` column
as an (n, dim) float matrix. ``to_pylist()`` builds n*dim Python float
objects per batch; this helper instead flattens the list column (an
offset-respecting slice of the child buffer, no per-row work) and
reshapes — the only copy is the optional dtype upcast, done once and
vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_matrix(col: pa.ChunkedArray | pa.Array, dtype=np.float64) -> np.ndarray:
    """list<T> / fixed_size_list<T> column with uniform row length ->
    (n, dim) numpy matrix. Raises on ragged rows or null entries (the
    embedding tables never have either; raising beats silent garbage)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("null rows in embedding column")
    lengths = pc.list_value_length(col)
    mm = pc.min_max(lengths)
    dim = mm["min"].as_py()
    if dim != mm["max"].as_py():
        raise ValueError("ragged list column cannot reshape to a matrix")
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(flat.reshape(n, dim), dtype=dtype)
