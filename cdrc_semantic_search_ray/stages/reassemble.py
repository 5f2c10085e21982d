"""Conversation reassembly: groupby(conv_id) + sort(turn_idx) → struct-lists.

Ray Data mapping of the reference's group-by-parent merge
(``DocumentGroupingPostprocessor``, /root/reference/src/model.py:13-32 — see
SURVEY.md R3/P3): a hash shuffle on ``conv_id`` followed by a per-group sort
on ``turn_idx``. Per-turn ``text`` is carried byte-exact into the struct list
(text-equality invariant, BASELINE.json:15) — we only sort and nest, never
rewrite.

Skew note (SURVEY.md §7.3): ``conv_id`` is naturally high-cardinality with
bounded group size (turns per conversation), so no salting is needed here —
unlike the LSH block keys in stages/blocking.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .keyblocks import run_starts

TURN_COLS = ("turn_idx", "role", "text", "tool", "ts")


def _block_to_convs(block: pa.Table) -> pa.Table:
    """Whole block (sorted by conv_id, turn_idx) → one row per conversation.

    Vectorized: conversation boundaries come from adjacent-row inequality on
    ``conv_id``; the turn struct-list is built once over the full block via
    list offsets — no per-group Python dispatch (see stages/keyblocks.py).
    """
    # Local (vectorized) secondary order: the Dataset-level shuffle sorts by
    # conv_id ONLY — sorting by (conv_id, turn_idx) at the Dataset level
    # would let one conversation straddle two blocks, since the whole-group
    # guarantee covers rows equal in ALL sort keys.
    block = block.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    cols = [c for c in TURN_COLS if c in block.column_names]
    n = len(block)
    struct = pa.StructArray.from_arrays(
        [block[c].combine_chunks() for c in cols], names=cols
    )
    if n == 0:
        empty = pa.ListArray.from_arrays(pa.array([0], type=pa.int32()), struct)
        return pa.table({
            "conv_id": pa.array([], type=pa.string()),
            "n_turns": pa.array([], type=pa.int32()),
            "turns": empty,
        })
    starts = run_starts(block, ["conv_id"])
    offsets = np.concatenate((starts, [n]))
    turns = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), struct
    )
    conv_ids = block["conv_id"].combine_chunks().take(
        pa.array(starts, type=pa.int64()))
    return pa.table({
        "conv_id": conv_ids,
        "n_turns": pa.array(np.diff(offsets).astype(np.int32)),
        "turns": turns,
    })


def _default_buckets() -> int:
    """Many more buckets than sort partitions: each output partition then
    holds several buckets and sampling boundaries can only shift a
    partition's size by ±1 bucket. With P ≈ partition count the shift is
    ±50-100% — measured 2× task skew at 128 buckets / 192 partitions.
    Beyond ~4 buckets/partition the residual skew stops mattering: tasks
    outnumber cores by ~8×, so waves average it out (A/B at 4.8M turns:
    1024 buckets 83s, 8192 buckets 88s — more buckets only adds sort
    sampling cost)."""
    import ray

    if ray.is_initialized():
        return max(1024, 16 * int(ray.cluster_resources().get("CPU", 8)))
    return 1024


def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic uniform bucket per conv_id (vectorized, zero-copy —
    see keyblocks.bucket_of_rows)."""
    from .keyblocks import bucket_of_rows

    return batch.append_column(
        "bucket", bucket_of_rows(batch, ["conv_id"], num_buckets))


def reassemble(transcripts, num_buckets: int | None = None,
               coalesce: bool = True) -> "ray.data.Dataset":  # noqa: F821
    """transcripts (flat turns, arbitrary row order) → conversations.

    Output schema: ``conv_id:string, n_turns:int32,
    turns:list<struct<...present turn columns...>>`` with turns sorted by
    ``turn_idx`` ascending. One row per conversation.

    Physical plan: ONE shuffle, keyed on ``bucket = hash(conv_id) % P``
    rather than on the raw string key — hash buckets are uniform, so the
    downstream nesting/extraction tasks are evenly sized (range-partitioning
    the string key measured a 6× task-size skew). P (≥16× cluster CPUs,
    `_default_buckets`) is the KEY cardinality; the sort's PARTITION count
    is `_sort_width` (~4 blocks/CPU — several buckets per partition keep
    sampling skew ±1 bucket). Equal buckets co-locate in one block (the
    map_groups guarantee); each block is then locally sorted by (conv_id,
    turn_idx), nested in one vectorized pass, and yielded as ~4 slices for
    downstream task granularity. Results are bucket- and width-invariant:
    grouping is by conv_id within the block, placement knobs never change
    content.
    """
    P = num_buckets or _default_buckets()
    bucketed = transcripts.map_batches(
        _add_bucket, fn_kwargs={"num_buckets": P}, batch_format="pyarrow")
    # Coalesce BEFORE the sort (the round-2 exchange lesson, now applied to
    # the flagship's widest shuffle): the sort moves in_blocks ×
    # out_partitions block pieces, and split parquet reads arrive as
    # hundreds of small blocks (measured 256×256 = 65k pieces, sort wall
    # 9.4 s at 16 CPUs of which only ~2 s was task time). ~4 blocks/CPU
    # keeps extraction granularity (the downstream per-block stage) while
    # cutting exchange pieces ~16×. Callers that already size their read
    # to the sort width (kg.build_conversations) pass coalesce=False and
    # skip this pass entirely.
    if coalesce:
        bucketed = bucketed.repartition(_sort_width())
    return bucketed.sort("bucket").map_batches(
        _drop_bucket_and_nest, batch_size=None, batch_format="pyarrow"
    )


def _sort_width() -> int:
    import ray

    if ray.is_initialized():
        return max(32, 4 * int(ray.cluster_resources().get("CPU", 8)))
    return 32


def _drop_bucket_and_nest(block: pa.Table):
    """Nest, then YIELD ~4 zero-copy slices: the sort runs at ~4 blocks/CPU
    (narrow exchange) while downstream per-block stages (extraction) see
    ~16 blocks/CPU — enough task waves to balance — without an extra
    repartition pass (measured: a post-sort repartition cost more than the
    granularity won at both 4 and 16 CPUs)."""
    convs = _block_to_convs(block.drop_columns(["bucket"]))
    n = len(convs)
    if n <= 1:
        yield convs
        return
    step = -(-n // 4)
    for lo in range(0, n, step):
        yield convs.slice(lo, step)


def explode(conversations) -> "ray.data.Dataset":  # noqa: F821
    """Inverse of :func:`reassemble` — conversations → flat, turn-ordered rows.

    Used by the invariant tests (round-trip must preserve every turn column
    byte-exact) and by consumers that want flat turns in conversation order.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        turns = batch["turns"].combine_chunks()
        flat = turns.flatten()
        lengths = pc.list_value_length(turns).to_numpy().astype("int64")
        conv_ids = batch["conv_id"].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(lengths), dtype=np.int64),
                               lengths)))
        data = {"conv_id": conv_ids}
        for i in range(flat.type.num_fields):
            f = flat.type.field(i)
            data[f.name] = flat.field(i)
        return pa.table(data)

    return conversations.map_batches(_explode, batch_format="pyarrow")
