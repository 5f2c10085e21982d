"""Mention detection + triple extraction as actor-pool ``map_batches`` stages.

Same operator shape as the reference's model stages (batched embedding /
NER-shaped inference: load-once state in ``__init__``, batched work in
``__call__`` — /root/reference/src/datastore.py:116-120, SURVEY.md C2/P4/P5):
the gazetteer automaton is compiled ONCE per actor, then applied to batches of
whole conversations. Swapping the rule-based matcher for a spaCy/transformer
NER is a one-class change (documented seam, SURVEY.md §7.4).

Input batches are ``conversations`` rows (conv_id, n_turns,
turns:list<struct>), produced by stages/reassemble.py — extraction consumes
complete, turn-ordered conversations because the coref rule carries state
across turns (functions/extract_core.py). Per-conversation purity ⇒ output is
independent of batch/partition boundaries.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract_core import MentionMatcher, extract_conversation

MENTION_SCHEMA = pa.schema([
    ("mention_id", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("surface", pa.string()),
    ("norm", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("label", pa.string()),
])

TRIPLE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj_norm", pa.string()),
    ("pred", pa.string()),
    ("obj_norm", pa.string()),
    ("subj_surface", pa.string()),
    ("obj_surface", pa.string()),
])


def _load_lexicon(lexicon) -> dict[str, str]:
    """Accept a dict, a ray ObjectRef (broadcast), or a parquet path."""
    if isinstance(lexicon, dict):
        return lexicon
    if isinstance(lexicon, str):
        import pyarrow.parquet as pq

        t = pq.read_table(lexicon, columns=["norm", "kind"])
        return dict(zip(t["norm"].to_pylist(), t["kind"].to_pylist()))
    import ray

    return _load_lexicon(ray.get(lexicon))


def _iter_conversations(batch: pa.Table):
    """Yield (conv_id, [(turn_idx, text), ...]) per row, zero-copy-ish:
    works on the list offsets + flattened child arrays, no per-row dicts."""
    turns = batch["turns"].combine_chunks()
    offsets = turns.offsets.to_numpy()
    flat = turns.flatten()
    tidx = flat.field("turn_idx").to_numpy()
    texts = flat.field("text").to_pylist()
    conv_ids = batch["conv_id"].to_pylist()
    for i, conv in enumerate(conv_ids):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        yield conv, [(int(tidx[j]), texts[j]) for j in range(lo, hi)]


class MentionDetector:
    """conversations → mentions table (SURVEY.md P4)."""

    def __init__(self, lexicon):
        self.matcher = MentionMatcher(_load_lexicon(lexicon))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {n: [] for n in MENTION_SCHEMA.names}
        for conv, turns in _iter_conversations(batch):
            mentions, _ = extract_conversation(turns, self.matcher)
            for ti, m in mentions:
                rows["mention_id"].append(f"{conv}#{ti}#{m.start}")
                rows["conv_id"].append(conv)
                rows["turn_idx"].append(ti)
                rows["surface"].append(m.surface)
                rows["norm"].append(m.norm)
                rows["start"].append(m.start)
                rows["end"].append(m.end)
                rows["label"].append(m.label)
        return pa.table(rows, schema=MENTION_SCHEMA)


class TripleExtractor:
    """conversations → raw (norm-level) triples table (SURVEY.md P5)."""

    def __init__(self, lexicon):
        self.matcher = MentionMatcher(_load_lexicon(lexicon))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
        for conv, turns in _iter_conversations(batch):
            _, triples = extract_conversation(turns, self.matcher)
            for ti, t in triples:
                rows["conv_id"].append(conv)
                rows["turn_idx"].append(ti)
                rows["subj_norm"].append(t.subj_norm)
                rows["pred"].append(t.pred)
                rows["obj_norm"].append(t.obj_norm)
                rows["subj_surface"].append(t.subj_surface)
                rows["obj_surface"].append(t.obj_surface)
        return pa.table(rows, schema=TRIPLE_SCHEMA)
