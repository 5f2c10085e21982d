"""LSH blocking: banded signed-random-projection block keys + hot-key salting.

Formalizes what the reference delegates to Pinecone's ANN service
(/root/reference/src/datastore.py:107-109, SURVEY.md P8): candidate
generation for near-duplicate / canonicalization pairs WITHOUT an all-pairs
shuffle. Each row with an embedding gets ``lsh_bands`` block keys (bands of
``lsh_rows`` sign bits of seeded random projections); rows sharing any block
key become candidates. Two vectors at cosine θ agree on one bit with
p = 1 − arccos(θ)/π, so a (bands=8, rows=4) scheme catches cosine ≥ 0.85
pairs with ≥ 99% probability while keeping blocks small.

Skew handling (SURVEY.md §7.3): block-key frequency is computed with a cheap
pre-pass (a count groupby over the SMALL key projection); keys above
``salt_threshold`` are split into ``salt_factor`` sub-blocks by a
deterministic hash of the row id. Salting trades a bounded recall loss for
bounded block size; the multiple independent bands give missed pairs more
chances. Pair generation also hard-caps work per block
(``max_pairs_per_block``).
"""

from __future__ import annotations

import functools
import zlib

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig

BLOCK_SCHEMA = pa.schema([
    ("node_id", pa.string()),
    ("block_key", pa.string()),
    ("vec", pa.list_(pa.float32())),
])

PAIR_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("score", pa.float32()),
])


@functools.lru_cache(maxsize=8)
def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed ^ 0x5F3759DF)
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def block_keys_batch(batch: pa.Table, id_col: str = "node_id",
                     vec_col: str = "vec",
                     cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """1 row → ``lsh_bands`` (node_id, block_key, vec) rows (a flat-map)."""
    vecs = np.asarray(
        batch[vec_col].combine_chunks().flatten().to_numpy()
        .reshape(len(batch), -1), dtype=np.float32)
    ids = batch[id_col].to_pylist()
    b, r = cfg.lsh_bands, cfg.lsh_rows
    bits = (vecs @ _planes(vecs.shape[1], b * r, cfg.embed_seed)) >= 0  # (N, b*r)
    weights = (1 << np.arange(r)).astype(np.int64)
    band_vals = bits.reshape(len(ids), b, r) @ weights  # (N, b)

    node_ids = [nid for nid in ids for _ in range(b)]
    keys = [f"{band}:{int(v)}" for row in band_vals for band, v in enumerate(row)]
    flat = np.repeat(vecs, b, axis=0).reshape(-1)
    return pa.table({
        "node_id": pa.array(node_ids, type=pa.string()),
        "block_key": pa.array(keys, type=pa.string()),
        "vec": pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.float32()), vecs.shape[1]),
    })


def salt_hot_keys(block_rows, hot_keys: set[str],
                  cfg: EngineConfig = DEFAULT_CONFIG):
    """Split blocks named in ``hot_keys`` into ``salt_factor`` sub-blocks.

    Deterministic: the sub-block of a row is crc32(node_id) % salt_factor.
    Pairs split across sub-blocks may be missed in THIS band; other bands
    remain unsalted chances (documented recall trade, SURVEY.md §7.3).
    """
    if not hot_keys:
        return block_rows
    S = cfg.salt_factor

    def _salt(batch: pa.Table) -> pa.Table:
        keys = batch["block_key"].to_pylist()
        ids = batch["node_id"].to_pylist()
        new = [
            f"{k}#{zlib.crc32(i.encode()) % S}" if k in hot_keys else k
            for k, i in zip(keys, ids)
        ]
        return batch.set_column(
            batch.schema.get_field_index("block_key"), "block_key",
            pa.array(new, type=pa.string()))

    return block_rows.map_batches(_salt, batch_format="pyarrow")


def find_hot_keys(block_rows, cfg: EngineConfig = DEFAULT_CONFIG) -> set[str]:
    """Frequency pre-pass: groupby-count over the (small) key projection.

    The count table is tiny (≤ #distinct block keys) — safe to collect."""
    counts = block_rows.select_columns(["block_key"]).groupby("block_key").count()
    hot: set[str] = set()
    for batch in counts.iter_batches(batch_format="pyarrow"):
        mask = np.asarray(batch["count()"].to_numpy()) > cfg.salt_threshold
        for k, m in zip(batch["block_key"].to_pylist(), mask.tolist()):
            if m:
                hot.add(k)
    return hot


def make_pairs_block_fn(cfg: EngineConfig = DEFAULT_CONFIG):
    """Whole-block candidate pairs: exact pairwise cosine >= canon_tau.

    The block arrives key-partitioned on ``block_key`` (stages/keyblocks.py)
    and is locally sorted by (block_key, node_id) here — the partition sort
    must use block_key ONLY, or one LSH block could straddle two Ray blocks.
    LSH blocks are then contiguous id-ordered runs: a < b falls out of the
    upper triangle. Work per block is capped at ``max_pairs_per_block``
    comparisons (deterministic truncation by id order). One Python call per
    Ray block; per-LSH-block work is pure numpy.
    """
    from .keyblocks import run_starts

    def _pairs(block: pa.Table) -> pa.Table:
        n_rows = len(block)
        if n_rows < 2:
            return pa.table({c: [] for c in ("a", "b", "score")},
                            schema=PAIR_SCHEMA)
        block = block.sort_by([("block_key", "ascending"),
                               ("node_id", "ascending")])
        ids = np.asarray(block["node_id"].to_pylist(), dtype=object)
        vecs = np.asarray(
            block["vec"].combine_chunks().flatten().to_numpy()
            .reshape(n_rows, -1), dtype=np.float32)
        starts = run_starts(block, ["block_key"])
        bounds = np.concatenate((starts, [n_rows]))
        max_n = int((2 * cfg.max_pairs_per_block) ** 0.5) + 1
        a_out, b_out, s_out = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            n = int(hi - lo)
            if n < 2:
                continue
            if n > max_n:
                n, hi = max_n, lo + max_n
            v = vecs[lo:hi]
            sims = v @ v.T
            ii, jj = np.where(np.triu(sims, k=1) >= cfg.canon_tau)
            if len(ii) == 0:
                continue
            a_out.append(ids[lo:hi][ii])
            b_out.append(ids[lo:hi][jj])
            s_out.append(sims[ii, jj])
        if not a_out:
            return pa.table({c: [] for c in ("a", "b", "score")},
                            schema=PAIR_SCHEMA)
        return pa.table({
            "a": pa.array(np.concatenate(a_out), type=pa.string()),
            "b": pa.array(np.concatenate(b_out), type=pa.string()),
            "score": pa.array(np.concatenate(s_out), type=pa.float32()),
        })

    return _pairs


def candidate_pairs(with_vecs, cfg: EngineConfig = DEFAULT_CONFIG,
                    salt: bool = True):
    """(node_id, vec) Dataset → deduped candidate-pair Dataset (a, b, score).

    blocks → [frequency pre-pass → salt] → per-block pairwise → dedup.
    Both shuffles run vectorized whole-block finalizers (keyblocks.py).
    """
    from .keyblocks import group_aggregate, map_hash_blocks

    blocks = with_vecs.map_batches(
        lambda t: block_keys_batch(t, cfg=cfg), batch_format="pyarrow")
    if salt:
        hot = find_hot_keys(blocks, cfg)
        blocks = salt_hot_keys(blocks, hot, cfg)
    # hash-bucket shuffles (int sort key): the pair fn sorts locally by
    # (block_key, node_id), and hash group_by needs no order at all.
    pairs = map_hash_blocks(blocks, ["block_key"], make_pairs_block_fn(cfg))
    # cross-band dedup: one row per (a, b); score is identical across bands
    # (same two vectors), so max == the value and stays deterministic.
    return map_hash_blocks(
        pairs, ["a", "b"],
        lambda t: group_aggregate(t, ["a", "b"], [("score", "max")],
                                  rename={"score_max": "score"}))
