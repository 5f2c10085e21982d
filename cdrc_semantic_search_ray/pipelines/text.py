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
