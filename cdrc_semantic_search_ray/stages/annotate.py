"""Mention detection + triple extraction ``map_batches`` stages.

Same operator shape as the reference's model stages (batched embedding /
NER-shaped inference: load-once state, batched work —
/root/reference/src/datastore.py:116-120, SURVEY.md C2/P4/P5): the gazetteer
automaton is compiled ONCE per worker, then applied to batches of whole
conversations.

Two execution paths, same semantics:

- ``MentionDetector`` / ``TripleExtractor`` classes — the actor-pool seam
  for EXPENSIVE state (a spaCy/transformer model on GPUs per the north
  star): state in ``__init__``, pass the class to ``map_batches(Cls,
  concurrency=(m, n), num_gpus=g)``. One-class swap (SURVEY.md §7.4).
- ``detect_mentions_batch`` / ``extract_triples_batch`` functions — the
  default sandbox path: plain tasks with a per-worker-process ``lru_cache``
  on the matcher. The deterministic stand-in loads in milliseconds, and
  task-based stages reuse Ray's warm workers instead of paying a fresh
  actor-pool spawn (~2-4s) at every stage start.

Input batches are ``conversations`` rows (conv_id, n_turns,
turns:list<struct>), produced by stages/reassemble.py — extraction consumes
complete, turn-ordered conversations because the coref rule carries state
across turns (functions/extract_core.py). Per-conversation purity ⇒ output is
independent of batch/partition boundaries.
"""

from __future__ import annotations

import functools

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
    # offsets are absolute into the ORIGINAL values buffer while flatten()
    # trims to the slice — rebase so sliced ListArrays (block slicing can
    # produce non-zero array offsets) stay aligned (round-1 ADVICE).
    offsets = turns.offsets.to_numpy()
    off0 = int(offsets[0])
    flat = turns.flatten()
    tidx = flat.field("turn_idx").to_numpy()
    texts = flat.field("text").to_pylist()
    conv_ids = batch["conv_id"].to_pylist()
    for i, conv in enumerate(conv_ids):
        lo, hi = int(offsets[i]) - off0, int(offsets[i + 1]) - off0
        yield conv, [(int(tidx[j]), texts[j]) for j in range(lo, hi)]


def _mentions_table(batch: pa.Table, matcher: MentionMatcher) -> pa.Table:
    rows: dict[str, list] = {n: [] for n in MENTION_SCHEMA.names}
    for conv, turns in _iter_conversations(batch):
        mentions, _ = extract_conversation(turns, matcher)
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


def _triples_table(batch: pa.Table, matcher: MentionMatcher) -> pa.Table:
    rows: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
    for conv, turns in _iter_conversations(batch):
        _, triples = extract_conversation(turns, matcher)
        for ti, t in triples:
            rows["conv_id"].append(conv)
            rows["turn_idx"].append(ti)
            rows["subj_norm"].append(t.subj_norm)
            rows["pred"].append(t.pred)
            rows["obj_norm"].append(t.obj_norm)
            rows["subj_surface"].append(t.subj_surface)
            rows["obj_surface"].append(t.obj_surface)
    return pa.table(rows, schema=TRIPLE_SCHEMA)


@functools.lru_cache(maxsize=8)
def _cached_matcher(lexicon_path: str) -> MentionMatcher:
    """Once per worker PROCESS (workers are reused across task stages)."""
    return MentionMatcher(_load_lexicon(lexicon_path))


def detect_mentions_batch(batch: pa.Table, *, lexicon: str) -> pa.Table:
    """Task-path mention detection (per-worker cached matcher)."""
    return _mentions_table(batch, _cached_matcher(lexicon))


def extract_triples_batch(batch: pa.Table, *, lexicon: str) -> pa.Table:
    """Task-path triple extraction (per-worker cached matcher)."""
    return _triples_table(batch, _cached_matcher(lexicon))


class MentionDetector:
    """conversations → mentions table (SURVEY.md P4) — actor-pool seam."""

    def __init__(self, lexicon):
        self.matcher = MentionMatcher(_load_lexicon(lexicon))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _mentions_table(batch, self.matcher)


class TripleExtractor:
    """conversations → raw norm-level triples (SURVEY.md P5) — actor seam."""

    def __init__(self, lexicon):
        self.matcher = MentionMatcher(_load_lexicon(lexicon))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _triples_table(batch, self.matcher)
