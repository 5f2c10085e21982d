"""Shared Arrow↔numpy array kernels (one implementation, many callers).

Used by the similarity/dedup pipelines and the vector-carrying queries —
fixed-width list columns convert to matrices with ONE flatten+reshape (no
per-row Python), and matrices ride Acero joins as fixed-size binary
(Acero rejects list-typed payload columns).

Empty-block discipline: Ray's sort/repartition can legally emit 0-row
blocks, so every kernel here must return a well-shaped ``(0, D)`` matrix
(width derived from the TYPE, not the data) instead of raising or losing D.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _list_width(t: pa.DataType) -> int:
    """Element count of a fixed-width list type (0 when unknowable)."""
    if pa.types.is_fixed_size_list(t):
        return t.list_size
    return 0


def list_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """(N, D) matrix from a fixed-width list column — zero Python loops.

    Empty batches return ``(0, D)`` with D taken from the list type (a
    ``reshape(0, -1)`` would raise; shape (0, 0) would break downstream
    matmuls on empty blocks)."""
    arr = batch[col].combine_chunks()
    n = len(batch)
    if n == 0:
        return np.empty((0, _list_width(arr.type)), dtype=dtype)
    return arr.flatten().to_numpy().reshape(n, -1).astype(dtype)


def matrix_to_fixed_binary(m: np.ndarray) -> pa.Array:
    """(N, D) matrix → fixed_size_binary column (D·itemsize bytes/row):
    the join-safe wire format for vectors."""
    m = np.ascontiguousarray(m)
    width = m.shape[1] * m.itemsize
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(width), len(m), [None, pa.py_buffer(m.tobytes())])


def fixed_binary_to_matrix(col, dtype) -> np.ndarray:
    """fixed_size_binary column → (N, D) matrix (writable copy).

    Zero-copy view of the data buffer (offset-safe), then one copy — no
    per-row ``to_pylist`` round-trip. Empty columns keep their width
    (``byte_width`` from the type) so downstream matmuls see (0, D)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    itemsize = np.dtype(dtype).itemsize
    width = arr.type.byte_width // itemsize
    if len(arr) == 0:
        return np.empty((0, width), dtype=dtype)
    buf = arr.buffers()[1]
    flat = np.frombuffer(buf, dtype=dtype,
                         count=(arr.offset + len(arr)) * width)
    return flat[arr.offset * width:].reshape(len(arr), width).copy()
