"""Text-analysis pipelines over a ``documents``-shaped table.

Ray Data mappings of the reference's string/regex operators
(SURVEY.md M1-M3: normalizer, HTML strip, regex extract) plus the text
operators a 100 TB training-data pipeline needs (language-ID, quality
scoring, token counting, fingerprinting). Vectorized pyarrow.compute kernels
where they exist; compiled-regex actor pools where they don't.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing as H
from ..functions import textstats as TS


def normalize_text(docs):
    """doc_id + text_norm = whitespace-collapsed lower(trim(text)) —
    pyarrow.compute kernels only (the reference's M2 chain vectorized)."""

    def _norm(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        t = pc.utf8_lower(t)
        t = pc.utf8_trim_whitespace(t)
        t = pc.replace_substring_regex(t, r"\s+", " ")
        return pa.table({"doc_id": batch["doc_id"].combine_chunks(),
                         "text_norm": t.combine_chunks()
                         if isinstance(t, pa.ChunkedArray) else t})

    return docs.map_batches(_norm, batch_format="pyarrow")


def strip_html(ds, col: str = "text", out: str = "text_clean"):
    """M3: ``re.sub('<[^<]+?>', '', notes)`` as a vectorized column op."""

    def _strip(batch: pa.Table) -> pa.Table:
        cleaned = pc.replace_substring_regex(batch[col], "<[^<]+?>", "")
        return batch.append_column(out, cleaned)

    return ds.map_batches(_strip, batch_format="pyarrow")


def token_counts(docs):
    """doc_id, n_tokens (whitespace), n_subtokens (BPE-ish regex)."""

    def _count(batch: pa.Table) -> pa.Table:
        n_ws = pc.count_substring_regex(batch["text"], r"\S+")
        texts = batch["text"].to_pylist()
        n_bpe = [len(TS.bpe_ish_tokens(t)) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_tokens": n_ws.combine_chunks().cast(pa.int64())
            if isinstance(n_ws, pa.ChunkedArray) else n_ws.cast(pa.int64()),
            "n_subtokens": pa.array(n_bpe, pa.int64()),
        })

    return docs.map_batches(_count, batch_format="pyarrow")


def quality_scores(docs):
    """Per-doc quality stats (length / punctuation / stopword ratios)."""

    def _score(batch: pa.Table) -> pa.Table:
        stats = [TS.quality_stats(t) for t in batch["text"].to_pylist()]
        cols = {"doc_id": batch["doc_id"].combine_chunks()}
        for k, typ in (("n_chars_calc", pa.int64()), ("n_tokens", pa.int64()),
                       ("avg_token_len", pa.float64()),
                       ("punct_ratio", pa.float64()),
                       ("stopword_ratio", pa.float64())):
            cols[k] = pa.array([s[k] for s in stats], typ)
        return pa.table(cols)

    return docs.map_batches(_score, batch_format="pyarrow")


def fingerprints(docs):
    """doc_id, fp = md5(lower(text)) + winnowing rolling-hash sketch."""

    def _fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "fp": pa.array([H.md5_fingerprint(t.lower()) for t in texts],
                           pa.string()),
            "sketch": pa.array([H.rolling_fingerprints(t) for t in texts],
                               pa.list_(pa.int64())),
        })

    return docs.map_batches(_fp, batch_format="pyarrow")


class LangIdActor:
    """Language-ID as a stateful stage (profiles/regexes built per actor)."""

    def __init__(self):
        # force module import + regex compilation once per actor
        self._langid = TS.langid

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._langid(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "lang_pred": pa.array([p[0] for p in preds], pa.string()),
            "confidence": pa.array([p[1] for p in preds], pa.float64()),
        })


def language_id(docs, concurrency: int = 4):
    return docs.map_batches(LangIdActor, batch_format="pyarrow",
                            concurrency=(1, concurrency))


def regex_hits(docs, pattern: str, out: str = "n_hits"):
    """M1 shape: vectorized regex match counting over a text column."""

    def _hits(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            out: (n.combine_chunks() if isinstance(n, pa.ChunkedArray) else n)
            .cast(pa.int64()),
        })

    return docs.map_batches(_hits, batch_format="pyarrow")


# default DLP term list for redact_terms — the dictionary-scrub analogue of
# a name/PII blacklist (real pipelines ship millions of terms via an
# Aho-Corasick actor; a regex alternation covers the vectorized-engine
# shape at list sizes RE2 compiles happily, ~10k terms)
REDACT_TERMS: tuple[str, ...] = ("customer", "line", "scan")
REDACT_TOKEN = "[REDACTED]"


def redact_terms(docs, terms: tuple[str, ...] = REDACT_TERMS,
                 token: str = REDACT_TOKEN):
    """PII-style dictionary redaction: replace whole-word occurrences of
    ``terms`` with ``token``; count per doc. Fully vectorized (ONE compiled
    RE2 alternation per batch via pyarrow's count/replace kernels — same
    engine class as the DuckDB oracle's regexp_replace). Output:
    (doc_id, clean_text, n_redacted)."""
    import re

    pattern = r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b"

    def _redact(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern)
        cleaned = pc.replace_substring_regex(batch["text"], pattern, token)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "clean_text": cleaned.combine_chunks()
            if isinstance(cleaned, pa.ChunkedArray) else cleaned,
            "n_redacted": (n.combine_chunks()
                           if isinstance(n, pa.ChunkedArray) else n)
            .cast(pa.int64()),
        })

    return docs.map_batches(_redact, batch_format="pyarrow")


def sequence_packing(docs, budget: int = 256, shard_col: str = "source"):
    """Training-sequence packing: assign each document a (pack_id,
    seq_offset) inside its shard so consecutive docs fill fixed
    ``budget``-token context windows — the standard streaming-packing
    semantics pack_id = floor(exclusive_prefix_tokens / budget) (a doc
    straddling a boundary spills into the next window; exact greedy
    bin-packing is NOT order-stable under distribution, this is).

    Partitioning assumption (documented per SURVEY §2 custom-operator
    rule): packing is per-``shard_col`` — shards are independent, so the
    whole op is ONE key shuffle + a per-block segmented cumulative sum
    (q52's kernel shape); no global scan, embarrassingly parallel across
    shards at 100 TB. Token counts use the same RE2 ``\\S+`` kernel as
    token_counts (oracle parity)."""
    import numpy as np

    from ..stages.keyblocks import map_key_blocks, run_starts

    def _count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], r"\S+")
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            shard_col: batch[shard_col].combine_chunks(),
            "n_tokens": (n.combine_chunks()
                         if isinstance(n, pa.ChunkedArray) else n)
            .cast(pa.int64()),
        })

    counted = docs.map_batches(_count, batch_format="pyarrow")
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      shard_col: pa.array([], pa.string()),
                      "n_tokens": pa.array([], pa.int64()),
                      "pack_id": pa.array([], pa.int64()),
                      "seq_offset": pa.array([], pa.int64())})

    def pack(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            return empty
        b = block.sort_by([(shard_col, "ascending"),
                           ("doc_id", "ascending")])
        v = b["n_tokens"].combine_chunks().to_numpy()
        starts = run_starts(b, [shard_col])
        sizes = np.diff(np.append(starts, n))
        cs = np.cumsum(v)
        seg_offset = np.concatenate(([0], cs[starts[1:] - 1])) \
            if len(starts) > 1 else np.zeros(1, dtype=np.int64)
        excl = cs - np.repeat(seg_offset, sizes) - v  # exclusive prefix
        return pa.table({
            "doc_id": b["doc_id"].combine_chunks(),
            shard_col: b[shard_col].combine_chunks(),
            "n_tokens": pa.array(v, pa.int64()),
            "pack_id": pa.array(excl // budget, pa.int64()),
            "seq_offset": pa.array(excl % budget, pa.int64()),
        })

    return map_key_blocks(counted, [shard_col], pack, num_blocks=16)
