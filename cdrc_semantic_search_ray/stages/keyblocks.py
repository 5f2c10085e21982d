"""Key-partitioned whole-block processing — the fast path under map_groups.

``GroupedData.map_groups`` co-locates equal keys in one block (sort / hash
repartition) and then calls the UDF **once per group**, constructing a
pyarrow slice + format conversion per call. With many small groups (one row
per conversation / edge / node) the per-group Python dispatch dominates the
stage. These helpers keep the exact same co-location shuffle but hand the
UDF the WHOLE sorted block, so group reduction runs as a single vectorized
``pyarrow.Table.group_by`` / numpy pass per block — one Python call per
block instead of thousands.

Correctness relies on the same invariant map_groups itself relies on
(ray/data/grouped_data.py: "batch_size=None ... guaranteeing that groups
are contained in full"): after ``Dataset.sort(keys)``, all rows with equal
key values live in exactly one block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def map_key_blocks(ds, keys: list[str], fn, num_blocks: int | None = None,
                   **map_opts):
    """Shuffle by ``keys`` then apply ``fn`` to each whole, key-sorted block.

    ``fn: pa.Table -> pa.Table`` sees every row of every key it sees (no
    group straddles a block), with rows sorted by ``keys`` ascending.

    ``num_blocks``: coalesce to this many blocks BEFORE the sort. The sort
    exchange moves input_blocks × output_partitions block pieces, so many
    small upstream blocks (e.g. combiner partials, split parquet reads) pay
    quadratic fixed overhead — callers that know the exchange is
    overhead-bound pass a small count (measured on the q14 join: 3.8 s →
    2.1 s at sf0.1 from this alone).
    """
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds.sort(keys).map_batches(
        fn, batch_size=None, batch_format="pyarrow", **map_opts)


def map_hash_blocks(ds, keys: list[str], fn, num_buckets: int = 1024,
                    num_blocks: int | None = None, **map_opts):
    """Like :func:`map_key_blocks`, but shuffles on ``hash(keys) % B``.

    Range-sorting composite STRING keys pays sampling + per-row string
    comparisons across the whole exchange; an int32 bucket key makes the
    same co-location nearly free (measured: the edge-aggregation sort
    barrier dominated its stage). Trade-off: blocks arrive co-located by
    key but NOT key-sorted — ``fn`` must locally sort/group (vectorized,
    parallel per block) if it needs runs.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__kb_bucket", bucket_of_rows(batch, keys, num_buckets))

    def drop_and_apply(block: pa.Table) -> pa.Table:
        return fn(block.drop_columns(["__kb_bucket"]))

    drop_and_apply.__name__ = getattr(fn, "__name__", "map_hash_blocks")
    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    if num_blocks:  # see map_key_blocks: exchange cost ∝ in × out blocks
        bucketed = bucketed.repartition(num_blocks)
    return bucketed.sort("__kb_bucket").map_batches(
        drop_and_apply, batch_size=None, batch_format="pyarrow", **map_opts)


def polars_hash_rows(table: pa.Table, seed: int) -> np.ndarray:
    """ONE hardened entry point for every polars row-hash in the engine.

    A Ray worker whose FIRST polars import is interrupted (task
    cancellation mid-import — e.g. a pipeline aborting while a fresh
    worker deserializes its UDF) caches a half-initialized module in
    ``sys.modules``; every later ``import polars`` in that worker then
    returns the broken module and raises ``AttributeError: module
    'polars._reexport' has no attribute 'Series'`` from inside
    ``from_arrow`` — deterministically, for the worker's whole lifetime
    (observed poisoning two unrelated queries of a full oracle sweep).
    Healing: purge ``polars*`` from ``sys.modules`` and re-import once.
    """
    import sys

    for attempt in (0, 1):
        try:
            import polars as pl

            return pl.from_arrow(table).hash_rows(seed=seed).to_numpy()
        except AttributeError:
            if attempt:
                raise
            for k in [k for k in list(sys.modules)
                      if k == "polars" or k.startswith("polars.")]:
                sys.modules.pop(k, None)
    raise AssertionError("unreachable")


def bucket_of_rows(batch: pa.Table, keys: list[str],
                   num_buckets: int) -> pa.Array:
    """int32 bucket per row from a cross-process-stable vectorized row hash
    (polars ahash, fixed seeds — zero-copy from Arrow; replaced the
    ``to_pylist`` → ``pd.util.hash_array`` object materialization that
    dominated exchange tagging, round-2 VERDICT #4). Buckets control
    placement only; per-block group/join logic always re-reads real keys,
    so results are hash-function-independent."""
    h = polars_hash_rows(batch.select(keys), seed=0)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def run_starts(block: pa.Table, keys: list[str]) -> np.ndarray:
    """Start offsets of each key run in a block sorted by ``keys``.

    Returns int64 array of run starts (first element 0). Vectorized:
    adjacent-row inequality OR-ed across key columns.
    """
    n = len(block)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    neq = None
    for k in keys:
        col = block[k].combine_chunks()
        d = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        neq = d if neq is None else pc.or_(neq, d)
    changed = neq.to_numpy(zero_copy_only=False)
    return np.concatenate(([0], np.flatnonzero(changed) + 1))


def group_aggregate(block: pa.Table, keys: list[str],
                    aggs: list[tuple[str, str]],
                    rename: dict[str, str] | None = None) -> pa.Table:
    """Vectorized per-block finalize: ``Table.group_by(keys).aggregate(aggs)``
    with optional output-column renaming (arrow suffixes ``_sum``/``_min``/…).
    """
    out = block.group_by(keys).aggregate(aggs)
    if rename:
        out = out.rename_columns(
            [rename.get(c, c) for c in out.column_names])
    return out


def distinct_by(ds, keys: list[str]):
    """Distinct rows by ``keys`` (keeps key columns only) — hash-partition +
    per-block ``unique``; the Ray-Data shape of the reference's Python-set
    dedup (/root/reference/src/query_api.py:51-52, SURVEY.md R7)."""

    def _uniq(block: pa.Table) -> pa.Table:
        return block.group_by(keys).aggregate([])

    return map_key_blocks(ds.select_columns(keys), keys, _uniq)
