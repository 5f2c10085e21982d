"""Shared Arrow↔numpy array kernels (one implementation, many callers).

Used by the similarity/dedup pipelines and the vector-carrying queries —
fixed-width list columns convert to matrices with ONE flatten+reshape (no
per-row Python), and matrices ride Acero joins as fixed-size binary
(Acero rejects list-typed payload columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """(N, D) matrix from a fixed-width list column — zero Python loops."""
    arr = batch[col].combine_chunks()
    return arr.flatten().to_numpy().reshape(len(batch), -1).astype(dtype)


def matrix_to_fixed_binary(m: np.ndarray) -> pa.Array:
    """(N, D) matrix → fixed_size_binary column (D·itemsize bytes/row):
    the join-safe wire format for vectors."""
    m = np.ascontiguousarray(m)
    width = m.shape[1] * m.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(m), [None, pa.py_buffer(m.tobytes())])


def fixed_binary_to_matrix(col, dtype) -> np.ndarray:
    """fixed_size_binary column → (N, D) matrix (writable copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    return np.frombuffer(b"".join(arr.to_pylist()), dtype=dtype) \
        .reshape(len(arr), -1).copy()
