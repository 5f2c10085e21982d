"""Generic relational operators over ray.data (SURVEY.md §2.2/§2.4 + §2.6).

The reference's only join is a per-document linear scan of two metadata lists
(/root/reference/src/datastore.py:19-42, SURVEY.md M5) and its only
aggregations are Counter/sort/limit (src/cdrc_logs.py:38-44). This module
generalizes those shapes into reusable, scale-aware operators:

- ``broadcast_join``  small side replicated, per-batch Acero join → NO shuffle
- ``broadcast_semi`` / ``broadcast_anti``  broadcast key set + vectorized mask
- ``hash_join``       both sides large: explicit bucketed hash join — each
  side gets ``bucket = crc32(key) % B``, a single groupby(bucket) shuffle
  co-locates matching buckets, and the per-bucket join is a vectorized
  ``pyarrow.Table.join``. B is the partitioning knob; skewed keys can be
  salted by raising B (documented assumption: one bucket fits in memory).
- ``partial_groupby``  combiner-style aggregation: per-batch pre-aggregation
  (pyarrow group_by) before the shuffle, then a merge of partials — the
  pattern every wide aggregate here uses (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_COL = "__side"
_BUCKET_COL = "__bucket"
_KEY_COL = "__key"


def read_table(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------
def broadcast_join(large, small: pa.Table, keys, right_keys=None,
                   join_type: str = "inner"):
    """Join a Dataset against a SMALL in-memory pyarrow table, no shuffle.

    The small side ships to each task once (captured in the UDF closure /
    object store); each Arrow batch joins vectorized via Acero.
    """
    import ray

    small_ref = ray.put(small)
    keys = [keys] if isinstance(keys, str) else list(keys)
    rkeys = ([right_keys] if isinstance(right_keys, str) else
             list(right_keys)) if right_keys else keys

    def _join(batch: pa.Table) -> pa.Table:
        s = ray.get(small_ref)
        return batch.join(s, keys=keys, right_keys=rkeys, join_type=join_type)

    return large.map_batches(_join, batch_format="pyarrow")


def broadcast_semi(large, key_col: str, key_set):
    """Keep rows whose key is in the broadcast set (left-semi)."""
    import ray

    ref = ray.put(pa.array(sorted(key_set)))

    def _semi(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key_col], value_set=ray.get(ref))
        return batch.filter(mask)

    return large.map_batches(_semi, batch_format="pyarrow")


def broadcast_anti(large, key_col: str, key_set):
    """Keep rows whose key is NOT in the broadcast set (left-anti) —
    the resume/change-detection shape (SURVEY.md R8)."""
    import ray

    ref = ray.put(pa.array(sorted(key_set)))

    def _anti(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch[key_col], value_set=ray.get(ref)))
        return batch.filter(mask)

    return large.map_batches(_anti, batch_format="pyarrow")


def column_key_set(ds, col: str) -> set:
    """Distinct values of one column, collected to the driver.

    Only for provably small key domains (dimension keys); the scale path for
    big domains is :func:`semi_join` / :func:`anti_join`, which gate on the
    distinct-key count and fall back to a bucketed shuffle."""
    out: set = set()
    for b in ds.select_columns([col]).iter_batches(batch_format="pyarrow"):
        out.update(pc.unique(b[col].combine_chunks()).to_pylist())
    return out


def _bucket_arrays(ks: list[pa.Array], num_buckets: int) -> pa.Array:
    """Vectorized, process-stable bucket of one-or-more key arrays (int32).

    A single integer key buckets by value (transparent, skew-debuggable);
    everything else — strings, composites, timestamps — hashes through
    polars' vectorized row hash (ahash with fixed seeds: deterministic
    across processes/nodes, zero-copy from Arrow, no ``to_pylist``
    object materialization on the exchange-tagging path). Buckets control
    PLACEMENT only — the per-block join/groupby runs on the real keys — so
    semantics never depend on the hash function."""
    if len(ks) == 1 and pa.types.is_integer(ks[0].type):
        h = ks[0].to_numpy().astype(np.int64, copy=False) % num_buckets
        return pa.array(h.astype(np.int32))
    from ..stages.keyblocks import polars_hash_rows

    t = pa.table({f"k{i}": a for i, a in enumerate(ks)})
    h = polars_hash_rows(t, seed=0)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


_ALLOWED_JOINS = ("inner", "left outer", "left semi", "left anti",
                  "right outer", "full outer")


def hash_join(left, right, left_key, right_key,
              num_buckets: int = 64, join_type: str = "inner"):
    """Bucketed hash join for two LARGE datasets (one all-to-all shuffle).

    ``left_key`` / ``right_key``: a column name or an equal-length LIST of
    names (composite equi-join). Both sides are tagged and bucketed by
    ``hash(keys) % B`` (vectorized, see :func:`_bucket_arrays`), unioned
    under shared ``__key{i}`` columns (only PAYLOAD columns of the other
    side are null-padded — keys are never duplicated), shuffled once on the
    int32 bucket, and joined per block with a vectorized Acero join.
    Assumes any single bucket fits in a worker's heap — raise
    ``num_buckets`` for bigger data or skew.

    ``join_type``: ``inner``, ``left outer``, ``left semi``, ``left anti``
    (semi/anti return LEFT columns only), ``right outer`` (key columns
    carry the RIGHT-side names), ``full outer`` (keys coalesce under the
    LEFT-side names — every unmatched right key survives; conformance is
    property-tested against driver-side Acero). Join keys must be non-null.
    """
    lk = [left_key] if isinstance(left_key, str) else list(left_key)
    rk = [right_key] if isinstance(right_key, str) else list(right_key)
    if len(lk) != len(rk) or not lk:
        raise ValueError("left_key/right_key must be same-length, non-empty")
    if join_type not in _ALLOWED_JOINS:
        raise NotImplementedError(
            f"join_type {join_type!r}: supported types are {_ALLOWED_JOINS}")
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    lpay = [c for c in lcols if c not in lk]
    rpay = [c for c in rcols if c not in rk]
    shared = set(lpay) & set(rpay)
    if shared:
        raise ValueError(f"ambiguous columns: {shared}")
    clash = set(rpay) & set(lk)
    if clash:
        raise ValueError(f"right payload collides with left keys: {clash}")
    # mirror check (round-3 ADVICE): for join types whose Acero output keeps
    # RIGHT key names, a left payload column named like a right key would
    # surface as a duplicate column mid-pipeline — fail fast instead
    if join_type in ("right outer", "full outer"):
        clash = set(lpay) & set(rk)
        if clash:
            raise ValueError(
                f"left payload collides with right keys: {clash}")
    ltypes = dict(zip(left.schema().names, left.schema().types))
    rtypes = dict(zip(right.schema().names, right.schema().types))
    key_types = [ltypes[k] for k in lk]
    key_cols = [f"{_KEY_COL}{i}" for i in range(len(lk))]
    semi_or_anti = join_type in ("left semi", "left anti")

    def tag_side(side: int):
        keys_in = lk if side == 0 else rk
        own = set(lpay if side == 0 else rpay)

        def fn(batch: pa.Table) -> pa.Table:
            ks = [batch[k].combine_chunks().cast(t)
                  for k, t in zip(keys_in, key_types)]
            cols = {
                _BUCKET_COL: _bucket_arrays(ks, num_buckets),
                _SIDE_COL: pa.array(np.full(len(batch), side, dtype=np.int8)),
                **dict(zip(key_cols, ks)),
            }
            for c in lpay + rpay:
                if c in own:
                    cols[c] = batch[c].combine_chunks()
                else:
                    cols[c] = pa.nulls(len(batch), ltypes.get(c, rtypes.get(c)))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(tag_side(0), batch_format="pyarrow").union(
        right.map_batches(tag_side(1), batch_format="pyarrow"))

    if semi_or_anti:
        out_cols = lk + lpay
    elif join_type == "right outer":
        out_cols = rk + lpay + rpay  # Acero keeps RIGHT key names here
    else:
        out_cols = lk + lpay + rpay  # full outer: keys coalesce under lk

    def join_block(block: pa.Table) -> pa.Table:
        """One vectorized Acero join per BLOCK: equal keys share a bucket
        and all rows of a bucket share a block (keyblocks co-location), so
        joining the whole block at once equals the per-bucket join union —
        without a Python call per bucket."""
        side = block[_SIDE_COL]
        lmask = pc.equal(side, 0)
        lt = block.filter(lmask).select(key_cols + lpay) \
                  .rename_columns(lk + lpay)
        rt = block.filter(pc.invert(lmask)).select(key_cols + rpay) \
                  .rename_columns(rk + rpay)
        joined = lt.join(rt, keys=lk, right_keys=rk, join_type=join_type)
        # Acero may reorder; normalize column order
        want = [c for c in out_cols if c in joined.column_names]
        return joined.select(want)

    from ..stages.keyblocks import map_key_blocks

    # coalesce before the sort: the exchange cost scales with in-blocks ×
    # out-partitions, and num_buckets blocks is exactly the parallelism the
    # per-bucket join needs (measured 3.8 s → 2.1 s at sf0.1). Beats Ray's
    # native hash-shuffle Dataset.join on the same shape (5.4 s, ray 2.49).
    return map_key_blocks(tagged, [_BUCKET_COL], join_block,
                          num_blocks=num_buckets)


def semi_join(large, key_col: str, keys_ds, keys_col: str,
              broadcast_limit: int = 200_000, num_buckets: int = 64):
    """Left-semi join of ``large`` against the distinct keys of ``keys_ds``.

    Size-gated (SURVEY.md §7.3 broadcast-vs-shuffle decision): the key side
    is reduced to its distinct keys first (a shuffle over KEYS ONLY, never
    the large side); if the distinct count fits ``broadcast_limit`` the keys
    broadcast (``ray.put`` once, vectorized ``is_in`` per batch — no
    large-side shuffle at all), otherwise both sides take ONE bucketed
    shuffle (``hash_join`` left semi) and nothing is ever collected on the
    driver. Pass ``broadcast_limit=0`` to force the shuffle path."""
    return _gated_semi_anti(large, key_col, keys_ds, keys_col,
                            broadcast_limit, num_buckets, anti=False)


def anti_join(large, key_col: str, keys_ds, keys_col: str,
              broadcast_limit: int = 200_000, num_buckets: int = 64):
    """Left-anti join (the resume/change-detection shape, SURVEY.md R8) —
    same size gate as :func:`semi_join`."""
    return _gated_semi_anti(large, key_col, keys_ds, keys_col,
                            broadcast_limit, num_buckets, anti=True)


def _gated_semi_anti(large, key_col, keys_ds, keys_col, broadcast_limit,
                     num_buckets, anti: bool):
    dk = distinct(keys_ds.select_columns([keys_col]), [keys_col]).materialize()
    if dk.count() <= broadcast_limit:
        keys: set = set()
        for b in dk.iter_batches(batch_format="pyarrow"):
            keys.update(b[keys_col].to_pylist())
        return (broadcast_anti if anti else broadcast_semi)(
            large, key_col, keys)
    return hash_join(large, dk, key_col, keys_col, num_buckets=num_buckets,
                     join_type="left anti" if anti else "left semi")


# ---------------------------------------------------------------------------
# combiner-style aggregation
# ---------------------------------------------------------------------------
_PARTIAL_OPS = {"sum", "count", "min", "max"}


def partial_groupby(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                    merge_blocks: int | None = None):
    """Pre-aggregated groupby: ``aggs`` = [(col, op, out_name)] with op in
    {sum,count,min,max}. Each batch collapses to one partial row per key
    (pyarrow group_by — vectorized), THEN the shuffle runs over partials.

    count partials become sums at merge time. avg = sum/count downstream.
    ``merge_blocks``: callers with a SMALL key domain (partials ≪ input)
    pass a small count so the merge exchange doesn't pay per-block fixed
    overhead across every upstream block (see keyblocks.map_key_blocks).
    """
    for _, op, _ in aggs:
        if op not in _PARTIAL_OPS:
            raise ValueError(op)

    def partial(batch: pa.Table) -> pa.Table:
        spec = [(c, op) for c, op, _ in aggs]
        g = batch.group_by(keys).aggregate(spec)
        cols = {k: g[k] for k in keys}
        for c, op, out in aggs:
            cols[out] = g[f"{c}_{op}"]
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merge_op = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    from ..stages.keyblocks import group_aggregate, map_key_blocks

    def merge(block: pa.Table) -> pa.Table:
        spec = [(out, merge_op[op]) for _, op, out in aggs]
        rename = {f"{out}_{merge_op[op]}": out for _, op, out in aggs}
        g = group_aggregate(block, keys, spec, rename=rename)
        return g.select(keys + [out for _, _, out in aggs])

    return map_key_blocks(partials, keys, merge, num_blocks=merge_blocks)


def range_join_bands(ds, col: str, bounds: list[float], labels: list[str],
                     out: str = "band"):
    """Range (band) join: assign each row the band whose half-open interval
    [bounds[i], bounds[i+1]) contains ``ds[col]`` — the broadcast-side case
    of a range join (bands ≪ data, sorted boundaries ship in the closure;
    one binary search per batch via ``np.searchsorted``, no shuffle).
    Rows below bounds[0] or at/above bounds[-1] are dropped (matching a SQL
    BETWEEN-style inner join). A large-large interval overlap join would
    instead bucket both sides on quantized range keys (same machinery as
    ``hash_join``) — not needed by any current caller."""
    if len(labels) != len(bounds) - 1:
        raise ValueError("need len(labels) == len(bounds) - 1")
    lo, hi = bounds[0], bounds[-1]
    edges = np.asarray(bounds, dtype=np.float64)
    lab = np.asarray(labels, dtype=object)

    def f(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().cast(pa.float64()).to_numpy()
        keep = (v >= lo) & (v < hi)
        idx = np.searchsorted(edges, v[keep], side="right") - 1
        return batch.filter(pa.array(keep)).append_column(
            out, pa.array(lab[idx], type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def sort_limit(ds, sort_keys: list[tuple[str, str]], n: int):
    """Global top-n: ds.sort(...).limit(n) (range-partitioned shuffle)."""
    cols = [k for k, _ in sort_keys]
    desc = [d == "descending" for _, d in sort_keys]
    return ds.sort(cols, descending=desc).limit(n)


def distinct(ds, keys: list[str]):
    """Exact distinct on key columns: key-partition + per-block unique
    (SURVEY.md R7 generalized)."""
    from ..stages.keyblocks import distinct_by

    return distinct_by(ds, keys)


def topk_per_group(ds, group_keys: list[str], sort_keys: list[tuple[str, str]],
                   k: int):
    """Per-group top-k with deterministic tie-breaks (SURVEY.md R2 shape).

    Whole-block vectorized: local sort by (group_keys, sort_keys), run
    boundaries, rank = offset within run, filter rank <= k."""
    import numpy as np

    from ..stages.keyblocks import map_key_blocks, run_starts

    def _top(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            return block.append_column("rn", pa.array([], type=pa.int64()))
        b = block.sort_by([(g, "ascending") for g in group_keys]
                          + list(sort_keys))
        starts = run_starts(b, group_keys)
        sizes = np.diff(np.append(starts, n))
        rn = np.arange(n) - np.repeat(starts, sizes) + 1
        b = b.append_column("rn", pa.array(rn, type=pa.int64()))
        return b.filter(pa.array(rn <= k))

    return map_key_blocks(ds, group_keys, _top)
