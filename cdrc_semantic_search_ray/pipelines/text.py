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


def _pack_count_stage(docs, shard_col: str, keep_text: bool):
    """Shared token-count map stage for the packing family (the RE2
    ``\\S+`` kernel token_counts/oracles pin)."""

    def _count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], r"\S+")
        cols = {
            "doc_id": batch["doc_id"].combine_chunks(),
            shard_col: batch[shard_col].combine_chunks(),
            "n_tokens": (n.combine_chunks()
                         if isinstance(n, pa.ChunkedArray) else n)
            .cast(pa.int64()),
        }
        if keep_text:
            cols["text"] = batch["text"].combine_chunks()
        return pa.table(cols)

    return docs.map_batches(_count, batch_format="pyarrow")


def _pack_prefix(block: pa.Table, shard_col: str):
    """Shared pack-assignment kernel: sort the key block by (shard,
    doc_id), segmented-cumsum token counts per shard, return the sorted
    table, per-row token counts, the EXCLUSIVE prefix, and the shard run
    starts. The ONE definition of the packing arithmetic — q60's
    assignment and q66's materialization must never diverge."""
    import numpy as np

    from ..stages.keyblocks import run_starts

    n = len(block)
    b = block.sort_by([(shard_col, "ascending"), ("doc_id", "ascending")])
    v = b["n_tokens"].combine_chunks().to_numpy()
    starts = run_starts(b, [shard_col])
    sizes = np.diff(np.append(starts, n))
    cs = np.cumsum(v)
    seg_offset = np.concatenate(([0], cs[starts[1:] - 1])) \
        if len(starts) > 1 else np.zeros(1, dtype=np.int64)
    excl = cs - np.repeat(seg_offset, sizes) - v  # exclusive prefix
    return b, v, excl, starts


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
    from ..stages.keyblocks import map_key_blocks

    counted = _pack_count_stage(docs, shard_col, keep_text=False)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      shard_col: pa.array([], pa.string()),
                      "n_tokens": pa.array([], pa.int64()),
                      "pack_id": pa.array([], pa.int64()),
                      "seq_offset": pa.array([], pa.int64())})

    def pack(block: pa.Table) -> pa.Table:
        if len(block) == 0:
            return empty
        b, v, excl, _ = _pack_prefix(block, shard_col)
        return pa.table({
            "doc_id": b["doc_id"].combine_chunks(),
            shard_col: b[shard_col].combine_chunks(),
            "n_tokens": pa.array(v, pa.int64()),
            "pack_id": pa.array(excl // budget, pa.int64()),
            "seq_offset": pa.array(excl % budget, pa.int64()),
        })

    return map_key_blocks(counted, [shard_col], pack, num_blocks=16)


def repetition_scores(docs):
    """Repetition-based quality signals (the Gopher-rule family that q26's
    length/punct/stopword ratios don't cover): per doc, the most-frequent
    token's share and the duplicate-bigram fraction — the standard
    boilerplate/spam discriminators for pretraining filters.

    Fully vectorized: ONE tokenize pass, one factorize, then sorted
    run-length kernels (lexsort + diff) for per-doc distinct/max counts —
    no per-doc Python. Ratios are e6 fixed-point with the oracle's exact
    operation order ((1e6·x)/y, one division, round half away)."""
    import numpy as np
    import pandas as pd

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "n_distinct": pa.array([], pa.int64()),
                      "top1_share_e6": pa.array([], pa.int64()),
                      "dup_bigram_e6": pa.array([], pa.int64())})

    def _round_e6(num: "np.ndarray", den: "np.ndarray") -> "np.ndarray":
        r = np.divide(1e6 * num, den, out=np.zeros(len(num)),
                      where=den > 0)
        return np.copysign(np.floor(np.abs(r) + 0.5), r).astype(np.int64)

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                batch["text"].combine_chunks())), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        codes, uniq = pd.factorize(flat)
        doc_idx = np.repeat(np.arange(n), lens)

        # per-(doc, token) counts via one lexsort + run-length pass
        order = np.lexsort((codes, doc_idx))
        di, ci = doc_idx[order], codes[order]
        new = np.ones(len(di), dtype=bool)
        new[1:] = (di[1:] != di[:-1]) | (ci[1:] != ci[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(di)))
        gdoc = di[starts]
        n_distinct = np.bincount(gdoc, minlength=n)
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, gdoc, counts)

        # bigrams: consecutive code pairs within a doc (boundary masked)
        valid = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) else \
            np.array([], dtype=bool)
        V = np.int64(len(uniq) + 1)
        bg = codes[:-1].astype(np.int64) * V + codes[1:]
        bg, bgd = bg[valid], doc_idx[:-1][valid]
        nb = np.bincount(bgd, minlength=n)
        order2 = np.lexsort((bg, bgd))
        db = np.zeros(n, dtype=np.int64)
        if len(bg):
            b2, d2 = bg[order2], bgd[order2]
            new2 = np.ones(len(b2), dtype=bool)
            new2[1:] = (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])
            db = np.bincount(d2[np.flatnonzero(new2)], minlength=n)

        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_tokens": pa.array(lens),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
            "top1_share_e6": pa.array(_round_e6(mx.astype(np.float64),
                                                lens.astype(np.float64))),
            "dup_bigram_e6": pa.array(_round_e6(
                (nb - db).astype(np.float64), nb.astype(np.float64))),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def pack_sequences(docs, budget: int = 256, shard_col: str = "source",
                   sep: str = " "):
    """Materialize the packed TRAINING SEQUENCES :func:`sequence_packing`
    only assigns: one row per (shard, pack_id) with the member documents'
    text concatenated in doc_id order.

    Rides the SAME single key shuffle as the assignment — the block
    arrives (shard, doc_id)-sorted with text carried, the segmented
    cumsum yields pack boundaries, and concatenation is one vectorized
    ``binary_join`` over a ListArray built from those boundaries (no
    per-pack Python). Output: (shard, pack_id, n_docs, n_tokens,
    packed_text)."""
    import numpy as np

    from ..stages.keyblocks import map_key_blocks

    counted = _pack_count_stage(docs, shard_col, keep_text=True)
    empty = pa.table({shard_col: pa.array([], pa.string()),
                      "pack_id": pa.array([], pa.int64()),
                      "n_docs": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "packed_text": pa.array([], pa.string())})

    def pack(block: pa.Table) -> pa.Table:
        n = len(block)
        if n == 0:
            return empty
        b, v, excl, starts = _pack_prefix(block, shard_col)
        pack_id = excl // budget
        # pack boundary = shard boundary OR pack_id change
        new = np.ones(n, dtype=bool)
        new[1:] = pack_id[1:] != pack_id[:-1]
        new[starts] = True
        pstarts = np.flatnonzero(new)
        offsets = np.append(pstarts, n).astype(np.int32)
        texts = b["text"].combine_chunks()
        packed = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), texts), sep)
        take = pa.array(pstarts, pa.int64())
        psizes = np.diff(offsets).astype(np.int64)
        ptokens = np.add.reduceat(v, pstarts)
        return pa.table({
            shard_col: b[shard_col].combine_chunks().take(take),
            "pack_id": pa.array(pack_id[pstarts], pa.int64()),
            "n_docs": pa.array(psizes),
            "n_tokens": pa.array(ptokens.astype(np.int64)),
            "packed_text": packed,
        })

    return map_key_blocks(counted, [shard_col], pack, num_blocks=16)


def lm_quality(docs, vocab_broadcast_limit: int = 2_000_000):
    """Unigram-LM quality score per document (statistical quality filter —
    the corpus-likelihood cousin of the rule-based ``quality_scores``):
    score = mean over the doc's token instances of the corpus unigram
    frequency, in EXACT e6 fixed-point —

        per-token contribution = (1_000_000 · count(token)) // N_tokens
        lm_score_e6            = sum(contributions) // n_tokens(doc)

    All-integer floor arithmetic ⇒ partition-order-proof and mirrored
    verbatim in the DuckDB oracle (no log(): correctly-rounded transcendental
    parity across engines is NOT guaranteed, exact rationals are).

    Two passes over the text: (1) corpus token counts via the combiner
    groupby; (2) re-tokenize and score.  The vocabulary side is SIZE-GATED
    (same recipe as q43's df table): at or below ``vocab_broadcast_limit``
    distinct tokens it broadcasts via ``ray.put`` and scoring is one
    vectorized ``index_in``+``take`` per batch — documents never shuffle;
    an open vocabulary instead explodes (doc_id, token) rows through ONE
    bucketed ``hash_join`` + a doc-key combiner groupby (parity-tested at
    gate 0).  Tokenizer = RE2 ``\\s+`` on trimmed lowercase, the engine's
    standard (identical to DuckDB ``string_split_regex``).
    """
    import numpy as np
    import ray

    from .relational import hash_join, partial_groupby

    def _toks(texts):
        t = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(texts)), r"\s+")
        return t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t

    def tok_rows(batch: pa.Table) -> pa.Table:
        toks = _toks(batch["text"])
        lens = pc.list_value_length(toks).to_numpy()
        idx = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64),
                                 lens))
        return pa.table({"doc_id": batch["doc_id"].combine_chunks()
                         .take(idx), "token": toks.flatten()})

    counts = partial_groupby(
        docs.map_batches(tok_rows, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(len(b), dtype=np.int64))),
            batch_format="pyarrow"),
        ["token"], [("one", "sum", "c")], merge_blocks=8).materialize()
    n_total_raw = counts.sum("c")
    if n_total_raw is None:  # empty corpus: typed empty result
        import ray.data as rd
        return rd.from_arrow(pa.schema([("doc_id", pa.int64()),
                                        ("lm_score_e6", pa.int64())])
                             .empty_table())
    n_total = int(n_total_raw)

    if counts.count() <= vocab_broadcast_limit:
        toks_l, cs_l = [], []
        for b in counts.iter_batches(batch_format="pyarrow"):
            toks_l.append(b["token"].combine_chunks())
            cs_l.append(b["c"].combine_chunks())
        vocab = pa.concat_arrays(toks_l)
        contrib = pa.array(
            (1_000_000 * np.concatenate(
                [a.to_numpy() for a in cs_l])) // n_total)
        ref = ray.put((vocab, contrib))

        def score(batch: pa.Table) -> pa.Table:
            v, con = ray.get(ref)
            toks = _toks(batch["text"])
            lens = pc.list_value_length(toks).to_numpy()
            idx = pc.index_in(toks.flatten(), value_set=v)
            per_tok = con.take(idx).to_numpy(zero_copy_only=False)
            starts = np.zeros(len(batch), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sums = np.add.reduceat(per_tok, starts) if len(per_tok) \
                else np.zeros(len(batch), dtype=np.int64)
            # reduceat repeats values for empty segments; every doc has ≥1
            # token (split of "" yields [""]), so lens ≥ 1 always
            return pa.table({
                "doc_id": batch["doc_id"].combine_chunks(),
                "lm_score_e6": pa.array(
                    (sums // np.maximum(lens, 1)).astype(np.int64)),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    # open vocabulary: ONE bucketed join of exploded token rows
    rows = docs.map_batches(tok_rows, batch_format="pyarrow")
    joined = hash_join(
        rows, counts.map_batches(
            lambda b: pa.table({"token_r": b["token"].combine_chunks(),
                                "c": b["c"].combine_chunks()}),
            batch_format="pyarrow"),
        "token", "token_r", num_buckets=64, join_type="inner")

    def contrib_rows(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy()
        return pa.table({
            "doc_id": b["doc_id"].combine_chunks(),
            "con": pa.array((1_000_000 * c) // n_total),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    per_doc = partial_groupby(
        joined.map_batches(contrib_rows, batch_format="pyarrow"),
        ["doc_id"], [("con", "sum", "s"), ("one", "sum", "m")],
        merge_blocks=16)
    return per_doc.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"].combine_chunks(),
            "lm_score_e6": pc.divide(b["s"], b["m"]).cast(pa.int64()),
        }), batch_format="pyarrow")
