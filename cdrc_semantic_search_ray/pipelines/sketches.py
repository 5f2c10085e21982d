"""Mergeable sketch aggregates: HLL approx count-distinct + DDSketch
quantiles (round-2 VERDICT missing #2).

No reference ancestor (SURVEY.md §2.6: the reference has no sketches
anywhere) — these are the standard public algorithms every training-data
pipeline hits early: HyperLogLog (Flajolet et al. 2007, with the
small-range linear-counting correction) and DDSketch relative-error
quantiles (Masson, Rim & Lee, VLDB 2019).

Both follow the engine's combiner discipline (SURVEY.md §4.2): a per-batch
vectorized partial (registers / bucket counts), ONE small shuffle of
fixed-size partials keyed on the group column, and a vectorized per-block
merge+finalize. Exactness claims are explicit: q39 keeps EXACT quantiles
for bounded integer domains; these sketches are the open-domain scale path,
with error bounds asserted by tests (tests/test_sketches.py) instead of a
SQL oracle — rel. error ≤ ~1.04/√m for HLL, ≤ α for DDSketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrays import fixed_binary_to_matrix

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers → σ ≈ 1.04/√4096 ≈ 1.6 %
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(col: pa.Array) -> np.ndarray:
    """Cross-process-stable vectorized 64-bit value hash (polars ahash,
    fixed seed) — the register assignment must agree across workers."""
    import polars as pl

    return pl.from_arrow(pa.table({"v": col})).hash_rows(seed=0).to_numpy()


def _rho(h: np.ndarray) -> np.ndarray:
    """HLL rank: 1 + leading-zero count of the 64−p bits after the register
    index; capped at 64−p+1 for the all-zero remainder. float64 log2 is
    exact enough here (a one-off ±1 on a measure-zero set of hashes shifts
    the estimate by ≪ the sketch's own σ) and is clipped at bit 63."""
    z = h << np.uint64(HLL_P)
    rho = np.full(len(h), 64 - HLL_P + 1, dtype=np.uint8)
    nz = z != 0
    top = np.minimum(np.floor(np.log2(z[nz].astype(np.float64))), 63)
    rho[nz] = (64 - 1 - top.astype(np.int64) + 1).astype(np.uint8)
    return rho


def _registers_binary(regs: np.ndarray) -> pa.Array:
    """(G, m) uint8 register matrix → fixed_size_binary(m) column."""
    regs = np.ascontiguousarray(regs)
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(HLL_M), len(regs), [None, pa.py_buffer(regs.tobytes())])


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """(G, m) registers → per-group cardinality estimates (raw HLL with the
    linear-counting small-range correction; 64-bit hashes need no
    large-range correction)."""
    e = _HLL_ALPHA * HLL_M * HLL_M / np.sum(
        np.power(2.0, -regs.astype(np.float64)), axis=1)
    v = np.count_nonzero(regs == 0, axis=1)
    small = (e <= 2.5 * HLL_M) & (v > 0)
    with np.errstate(divide="ignore"):
        lin = HLL_M * np.log(HLL_M / np.maximum(v, 1))
    return np.where(small, lin, e)


def approx_distinct(ds, key: str, col: str, merge_blocks: int = 8):
    """Approximate count-distinct of ``col`` per ``key`` group.

    Per batch: one vectorized hash pass + ``np.maximum.at`` scatter into a
    (groups, 4096) register matrix; the shuffle moves one 4 KiB register
    blob per (batch, group) — NEVER the raw values — and the merge is an
    elementwise-max ``reduceat``. Output: (key, approx_distinct int64)."""
    from ..stages.keyblocks import map_key_blocks, run_starts

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL count(DISTINCT) ignores NULLs — drop them BEFORE hashing
        # (round-3 ADVICE: a null used to occupy a register as one phantom
        # distinct value; approx_top_items already filters the same way)
        batch = batch.filter(pc.is_valid(batch[col]))
        if len(batch) == 0:
            return pa.table({key: pa.array([], batch.schema.field(key).type),
                             "hll": pa.array([], pa.binary(HLL_M))})
        dict_arr = batch[key].combine_chunks().dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        uniques = dict_arr.dictionary
        h = _hash64(batch[col].combine_chunks())
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rho = _rho(h)
        regs = np.zeros((len(uniques), HLL_M), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        return pa.table({key: uniques, "hll": _registers_binary(regs)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(block: pa.Table) -> pa.Table:
        if len(block) == 0:
            return pa.table({key: pa.array([], block.schema.field(key).type),
                             "approx_distinct": pa.array([], pa.int64())})
        b = block.sort_by([(key, "ascending")])
        starts = run_starts(b, [key])
        mat = fixed_binary_to_matrix(b["hll"], np.uint8)
        regs = np.maximum.reduceat(mat, starts, axis=0)
        est = np.round(_hll_estimate(regs)).astype(np.int64)
        return pa.table({
            key: b[key].combine_chunks().take(
                pa.array(starts, type=pa.int64())),
            "approx_distinct": pa.array(est),
        })

    return map_key_blocks(partials, [key], merge, num_blocks=merge_blocks)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------
def approx_top_items(ds, col: str, k: int = 20, capacity: int = 4096,
                     merge_blocks: int = 8):
    """Approximate top-k frequent items of an open-domain column (the
    vocab-building / heavy-hitter shape) with a CARRIED error bound.

    Per batch: EXACT counts (arrow group_by), pruned to the ``capacity``
    most frequent — state per batch is bounded regardless of domain size —
    plus ``eps`` = the largest pruned count (0 if nothing pruned). Merge:
    one small shuffle summing counts per item and eps globally. Every
    reported count is then exact-to-within [cnt, cnt + Σeps] (an item
    missing from a batch's summary had ≤ that batch's eps occurrences), the
    Misra-Gries/mergeable-summaries guarantee with Σeps ≤ N/capacity for
    adversarial input and far smaller for zipfian text.
    Output: (item, cnt, eps_bound) — top-k by (cnt desc, item asc)."""
    import pyarrow.compute as pc

    from ..stages.keyblocks import map_key_blocks

    # eps rides as a FLAGGED row (is_eps=1, item="") — the flag is part of
    # the grouping, so no data value (including the legal empty-string
    # token) can ever collide with the carrier. Null input items are
    # excluded from counting (documented; Ray's sort sampler also cannot
    # key on nulls).
    def partial(batch: pa.Table) -> pa.Table:
        items = batch[col].combine_chunks()
        items = items.filter(pc.is_valid(items))
        g = pa.table({"item": items}).group_by(
            "item").aggregate([("item", "count")])
        cnt = g["item_count"].cast(pa.int64())
        t = pa.table({"item": g["item"], "cnt": cnt})
        eps = 0
        if len(t) > capacity:
            t = t.sort_by([("cnt", "descending"), ("item", "ascending")])
            eps = int(t["cnt"][capacity].as_py())
            t = t.slice(0, capacity)
        t = t.append_column(
            "is_eps", pa.array(np.zeros(len(t), dtype=np.int8)))
        if eps:
            t = pa.concat_tables([t, pa.table(
                {"item": pa.array([""], pa.string()),
                 "cnt": pa.array([eps], pa.int64()),
                 "is_eps": pa.array([1], pa.int8())})])
        return t

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(block: pa.Table) -> pa.Table:
        """Sum counts per item, then emit only the BLOCK-LOCAL top-k (+ the
        eps carrier row): items are key-partitioned so per-item counts are
        complete within a block, making block-local top-k safe — the
        driver-side final assembly sees ≤ merge_blocks·k + 1 rows, never
        the item domain."""
        g = block.group_by(["item", "is_eps"]).aggregate([("cnt", "sum")])
        t = pa.table({"item": g["item"], "is_eps": g["is_eps"],
                      "cnt": g["cnt_sum"].cast(pa.int64())})
        mask = pc.equal(t["is_eps"], 1)
        eps_rows = t.filter(mask)
        rest = t.filter(pc.invert(mask)).sort_by(
            [("cnt", "descending"), ("item", "ascending")]).slice(0, k)
        return pa.concat_tables([rest, eps_rows])

    summed = map_key_blocks(partials, ["item"], merge,
                            num_blocks=merge_blocks).materialize()

    eps_total = 0
    rows = []
    for b in summed.iter_batches(batch_format="pyarrow"):
        mask = pc.equal(b["is_eps"], 1)
        e = b.filter(mask)
        if len(e):
            eps_total += int(pc.sum(e["cnt"]).as_py())
        rows.append(b.filter(pc.invert(mask)).drop_columns(["is_eps"]))
    all_items = pa.concat_tables(rows).sort_by(
        [("cnt", "descending"), ("item", "ascending")]).slice(0, k)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "item": all_items["item"],
        "cnt": all_items["cnt"],
        "eps_bound": pa.array(
            np.full(len(all_items), eps_total, dtype=np.int64)),
    }))


# ---------------------------------------------------------------------------
# DDSketch quantiles
# ---------------------------------------------------------------------------
def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def approx_quantiles(ds, key: str, col: str, qs=(0.5, 0.9, 0.99),
                     alpha: float = 0.01, merge_blocks: int = 4):
    """DDSketch: relative-error (≤ α) quantiles of a POSITIVE open-domain
    float column per group — the scale path q39's exact quantiles (bounded
    integer domains) cannot cover.

    Per batch: bucket index ⌈log_γ(x)⌉ (one vectorized log) + a
    (key, bucket) count groupby; the shuffle moves (key, bucket, cnt) rows
    whose cardinality is bounded by groups × O(log(max/min)/α) — data-size
    independent. Finalize: per-group cumsum over bucket counts, rank
    ⌊q·(n−1)⌋, midpoint value 2γ^i/(γ+1). Non-positive rows are counted
    into a reserved bucket and excluded from value estimates (documented).
    Output: (key, q_pct int64, approx float64) with q_pct = round(100·q)."""
    from ..stages.keyblocks import map_key_blocks, run_starts
    from .relational import partial_groupby

    gamma = _dd_gamma(alpha)
    log_g = np.log(gamma)
    qs = tuple(float(q) for q in qs)
    ZERO_BUCKET = np.iinfo(np.int64).min  # x <= 0 sentinel

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().cast(pa.float64()).to_numpy()
        b = np.full(len(v), ZERO_BUCKET, dtype=np.int64)
        pos = v > 0
        b[pos] = np.ceil(np.log(v[pos]) / log_g).astype(np.int64)
        return pa.table({key: batch[key].combine_chunks(),
                         "bucket": pa.array(b),
                         "one": pa.array(np.ones(len(v), dtype=np.int64))})

    counts = partial_groupby(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        [key, "bucket"], [("one", "sum", "cnt")], merge_blocks=merge_blocks)

    def finalize(block: pa.Table) -> pa.Table:
        kt = block.schema.field(key).type
        if len(block) == 0:
            return pa.table({key: pa.array([], kt),
                             "q_pct": pa.array([], pa.int64()),
                             "approx": pa.array([], pa.float64())})
        b = block.sort_by([(key, "ascending"), ("bucket", "ascending")])
        keys_arr = b[key].combine_chunks()
        buckets = b["bucket"].combine_chunks().to_numpy()
        cnts = b["cnt"].combine_chunks().cast(pa.int64()).to_numpy()
        starts = run_starts(b, [key])
        bounds = np.concatenate((starts, [len(b)]))
        out_k, out_q, out_v = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            gb = buckets[lo:hi]
            gc = cnts[lo:hi]
            pos = gb != ZERO_BUCKET  # value estimates cover x > 0 only
            gb, gc = gb[pos], gc[pos]
            if len(gb) == 0:
                continue
            cum = np.cumsum(gc)
            n = cum[-1]
            for q in qs:
                r = int(q * (n - 1))
                i = int(np.searchsorted(cum, r + 1))
                est = 2.0 * gamma ** gb[i] / (gamma + 1.0)
                out_k.append(lo)
                out_q.append(int(round(100 * q)))
                out_v.append(est)
        take = pa.array(np.asarray(out_k, dtype=np.int64))
        return pa.table({key: keys_arr.take(take),
                         "q_pct": pa.array(out_q, pa.int64()),
                         "approx": pa.array(out_v, pa.float64())})

    return map_key_blocks(counts, [key], finalize, num_blocks=merge_blocks)
