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

import pyarrow as pa
import pyarrow.compute as pc

TURN_COLS = ("turn_idx", "role", "text", "tool", "ts")


def _conv_to_row(group: pa.Table) -> pa.Table:
    cols = [c for c in TURN_COLS if c in group.column_names]
    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    struct = pa.StructArray.from_arrays(
        [g[c].combine_chunks() for c in cols], names=cols
    )
    turns = pa.ListArray.from_arrays(
        pa.array([0, len(g)], type=pa.int32()), struct
    )
    return pa.table(
        {
            "conv_id": pa.array([g["conv_id"][0].as_py()], type=pa.string()),
            "n_turns": pa.array([len(g)], type=pa.int32()),
            "turns": turns,
        }
    )


def reassemble(transcripts) -> "ray.data.Dataset":  # noqa: F821
    """transcripts (flat turns, arbitrary row order) → conversations.

    Output schema: ``conv_id:string, n_turns:int32,
    turns:list<struct<...present turn columns...>>`` with turns sorted by
    ``turn_idx`` ascending. One row per conversation.
    """
    return transcripts.groupby("conv_id").map_groups(
        _conv_to_row, batch_format="pyarrow"
    )


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
            pa.array(
                [i for i, n in enumerate(lengths) for _ in range(n)],
                type=pa.int64(),
            )
        )
        data = {"conv_id": conv_ids}
        for i in range(flat.type.num_fields):
            f = flat.type.field(i)
            data[f.name] = flat.field(i)
        return pa.table(data)

    return conversations.map_batches(_explode, batch_format="pyarrow")
