"""Generation-path analogues: response parsing (M11), answer generation
(C4) and the relevancy-evaluation sweep (C5).

The reference runs these against SaaS/GPU LLMs; what the ENGINE owes is
the data-plane around the model call, which is deterministic and
distributable:

- **M11 response splitter** (`/root/reference/search_service/
  streamlit_app.py:37-46`): split a generated multi-part response on the
  ``---------------------`` delimiter, keep only parts carrying BOTH the
  ``Summary:`` and ``Relevance:`` markers (others become NULL rows — the
  reference appends ``None``), and extract the two fields per part.
  Here: :func:`split_responses`, a fully vectorized 1→N flat map.

- **C4 generator** (`/root/reference/src/model.py:96-104`
  ``explain_dataset``: per-(query, document) prompt → LLM answer;
  `src/evaluation.py:29-38` shows the batch harness loading a local
  HF model once and reusing it per request): an actor-pool
  ``map_batches`` stage — :class:`AnswerGenerator` — whose ``__init__``
  is the load-model-once seam (here it compiles the tokenizer and
  pins the broadcast query set; a real deployment would load the LLM
  there) and whose ``__call__`` produces one deterministic answer per
  (query, document) from the prompt template + matched context terms.

- **C5 relevancy sweep** (`/root/reference/src/evaluation.py:42-79`:
  alpha grid × query list → retrieve top-k contexts → RelevancyEvaluator
  → {result, alpha, query} rows): hybrid retrieval is the shared
  parameterized core (`..pipelines.similarity.hybrid_topk` — the same
  arithmetic q35's oracle pins), contexts stream through
  :class:`RelevancyJudge` (actor-pool stage, deterministic term-overlap
  verdict standing in for the 4-bit-Mistral judge; same load-once seam),
  and one tiny groupby yields per-(query, alpha) pass/fail.

All three are oracle-checked end-to-end (DuckDB SQL over the same
parquet): the "model" surfaces are deterministic by design, so the whole
pipeline — render, split, retrieve, judge, aggregate — hash-matches SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import relational as R

# the reference UI's part delimiter (streamlit_app.py:37); responses are
# rendered with \n around it so the split is byte-exact both sides
DELIM = "---------------------"

# C4/C5 query workload: the reference evaluates logged + templated query
# strings (evaluation.py:46-58); here a fixed deterministic list over the
# synthetic vocabulary
EVAL_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "table value scan"),
    (2, "window data group"),
    (3, "customer query line"),
)


def _toks(text_col) -> pa.Array:
    """RE2 '\\s+' tokenization of lower/trimmed text — parity with the
    oracle's string_split_regex (same engine class; python str.split()
    differs on unicode whitespace)."""
    t = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(text_col)), r"\s+")
    return t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t


# ---------------------------------------------------------------------------
# M11 — response splitter
# ---------------------------------------------------------------------------

N_PARTS = 3  # parts per rendered response
_MALFORMED_MOD = 7  # (doc_id + part) % 7 == 0 → block without markers


def render_responses(docs):
    """Deterministic generator stand-in: render one multi-part response
    per document (N_PARTS blocks joined by the reference delimiter; every
    ``(doc_id + part) % 7 == 0`` block is rendered WITHOUT the field
    markers, modelling the LLM omitting the requested structure — the
    case streamlit_app.py:40-41 maps to None)."""

    def render(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        toks = _toks(b["text"])
        blocks = []
        for p in range(1, N_PARTS + 1):
            summary = pc.binary_join(
                pc.list_slice(toks, 0, 2 * p), " ")
            rel = pa.array((ids_np * p) % 100, pa.int64())
            good = pc.binary_join_element_wise(
                "Title: doc-", pc.cast(ids, pa.string()),
                " part ", str(p),
                "\nSummary: ", summary,
                "\nRelevance: ", pc.cast(rel, pa.string()), "%", "")
            bad = pc.binary_join_element_wise(
                "Note: no structured answer for part ", str(p), "")
            blocks.append(pc.if_else(
                pa.array((ids_np + p) % _MALFORMED_MOD == 0),
                bad, good))
        parts = [blocks[0]]
        for blk in blocks[1:]:
            parts.extend([f"\n{DELIM}\n", blk])
        return pa.table({"doc_id": ids,
                         "response": pc.binary_join_element_wise(
                             *parts, "")})

    return docs.map_batches(render, batch_format="pyarrow")


def split_responses(responses):
    """The splitter itself (M11): one response row → N part rows with
    (summary, relevance_pct) extracted, NULL for parts missing either
    marker. Vectorized: split_pattern (1→N), flatten + np.repeat for the
    id spine, extract_regex for the fields."""

    def split(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b["response"].combine_chunks(),
                                 f"\n{DELIM}\n")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        doc_id = np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), lens)
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        part_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs, lens) + 1
        ok = pc.and_(pc.match_substring(flat, "Summary: "),
                     pc.match_substring(flat, "Relevance: "))
        summary_m = pc.extract_regex(flat, r"Summary: (?P<s>[^\n]*)")
        rel_m = pc.extract_regex(flat, r"Relevance: (?P<r>\d+)%")
        null_str = pa.nulls(len(flat), pa.string())
        summary = pc.if_else(ok, pc.struct_field(summary_m, "s"), null_str)
        rel = pc.if_else(ok, pc.cast(pc.struct_field(rel_m, "r"),
                                     pa.int64()),
                         pa.nulls(len(flat), pa.int64()))
        return pa.table({
            "doc_id": pa.array(doc_id, pa.int64()),
            "part_idx": pa.array(part_idx, pa.int64()),
            "summary": summary,
            "relevance_pct": rel,
        })

    return responses.map_batches(split, batch_format="pyarrow")


def q55_response_split(sf_dir: str):
    """Registry entry: render (deterministic generator stand-in) then
    split + field-extract — the full M11 path, oracle-checked (the oracle
    re-renders and re-parses in SQL, an independent regex engine)."""
    docs = R.read_table(sf_dir, "documents", ["doc_id", "text"])
    return split_responses(render_responses(docs))


_SQL_Q55 = rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
  FROM documents),
blocks AS (
  SELECT d.doc_id, p.part_idx,
         CASE WHEN (d.doc_id + p.part_idx) % {_MALFORMED_MOD} = 0
              THEN 'Note: no structured answer for part ' || p.part_idx
              ELSE 'Title: doc-' || d.doc_id || ' part ' || p.part_idx ||
                   chr(10) || 'Summary: ' ||
                   array_to_string(toks[1:2*p.part_idx], ' ') ||
                   chr(10) || 'Relevance: ' ||
                   ((d.doc_id * p.part_idx) % 100) || '%'
         END AS part
  FROM d CROSS JOIN (VALUES (1), (2), (3)) AS p(part_idx))
SELECT doc_id, part_idx,
       CASE WHEN part LIKE '%Summary: %' AND part LIKE '%Relevance: %'
            THEN regexp_extract(part, 'Summary: ([^' || chr(10) || ']*)', 1)
       END AS summary,
       CASE WHEN part LIKE '%Summary: %' AND part LIKE '%Relevance: %'
            THEN CAST(regexp_extract(part, 'Relevance: (\d+)%', 1) AS BIGINT)
       END AS relevance_pct
FROM blocks
"""


# ---------------------------------------------------------------------------
# C4 — answer generator (actor-pool stage)
# ---------------------------------------------------------------------------

ANSWER_TERMS = 5  # cap: first N matched terms quoted in the answer


class AnswerGenerator:
    """Deterministic generator stage (C4 shape). ``__init__`` is the
    load-once seam — the reference loads a quantized HF LLM exactly once
    and reuses it across requests (evaluation.py:29-38); here the "model"
    is a compiled tokenizer + the pinned query set, and the answer is a
    template fill from matched context terms (explain_dataset's prompt →
    answer, made deterministic). Swap the body of :meth:`__call__` for a
    real batched-inference call to deploy an actual model."""

    def __init__(self, queries: tuple[tuple[int, str], ...] = EVAL_QUERIES):
        self.queries = [
            (qid, qtext, sorted(set(qtext.split())))
            for qid, qtext in queries
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tok_lists = _toks(batch["text"]).to_pylist()
        d_sets = [sorted(set(t)) for t in tok_lists]
        out = {"query_id": [], "doc_id": [], "n_matched": [], "answer": []}
        for qid, qtext, qtoks in self.queries:
            qset = set(qtoks)
            for i, dset in enumerate(d_sets):
                terms = [t for t in dset if t in qset]
                out["query_id"].append(qid)
                out["doc_id"].append(int(ids[i]))
                out["n_matched"].append(len(terms))
                out["answer"].append(
                    f"Q: {qtext} A: dataset doc-{int(ids[i])} matches "
                    f"[{', '.join(terms[:ANSWER_TERMS])}]")
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_matched": pa.array(out["n_matched"], pa.int64()),
            "answer": pa.array(out["answer"], pa.string()),
        })


def q56_generate_answers(sf_dir: str):
    """Registry entry: the C4 generator as an actor-pool ``map_batches``
    stage over the documents stream × the broadcast query workload
    (queries ride the actor, not each batch)."""
    docs = R.read_table(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(AnswerGenerator, batch_format="pyarrow",
                            concurrency=(1, 4))


_SQL_Q56 = r"""
WITH d AS (
  SELECT doc_id,
         list_sort(list_distinct(
             string_split_regex(trim(lower(text)), '\s+'))) AS toks
  FROM documents),
q(query_id, qtext) AS (
  VALUES (1, 'table value scan'), (2, 'window data group'),
         (3, 'customer query line')),
m AS (
  SELECT q.query_id, q.qtext, d.doc_id,
         list_sort(list_distinct(list_intersect(
             d.toks, string_split_regex(q.qtext, '\s+')))) AS terms
  FROM d CROSS JOIN q)
SELECT query_id, doc_id, len(terms) AS n_matched,
       'Q: ' || qtext || ' A: dataset doc-' || doc_id || ' matches [' ||
       -- array_to_string of an EMPTY list is NULL in DuckDB, not ''
       COALESCE(array_to_string(terms[1:5], ', '), '') || ']' AS answer
FROM m
"""


# ---------------------------------------------------------------------------
# C5 — relevancy-evaluation sweep
# ---------------------------------------------------------------------------

EVAL_NQ = 5          # query set = first NQ documents (q35's convention)
EVAL_K = 5           # reference eval reduces top_k to 5 (evaluation.py:18)
EVAL_ALPHAS = (0, 75, 100)  # the reference's alpha grid (evaluation.py:59)
JUDGE_MIN_SHARED = 2  # deterministic verdict: ≥2 shared distinct terms


class RelevancyJudge:
    """Deterministic relevancy judge stage (C5 shape). The reference
    builds a RelevancyEvaluator over a 4-bit local LLM and asks it
    pass/fail per (query, contexts) (evaluation.py:23-38,69-74); this
    stage's verdict is ≥``JUDGE_MIN_SHARED`` shared distinct tokens
    between query text and a retrieved context — deterministic, so the
    whole sweep is SQL-checkable. ``__init__`` is the same load-once
    seam as :class:`AnswerGenerator` (broadcast query token sets here; a
    judge model in a real deployment)."""

    def __init__(self, q_toks_ref):
        import ray

        self.q_toks = (ray.get(q_toks_ref)
                       if not isinstance(q_toks_ref, dict) else q_toks_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy(zero_copy_only=False)
        d_sets = [set(t) for t in _toks(batch["text"]).to_pylist()]
        shared = [len(self.q_toks[int(q)] & d)
                  for q, d in zip(qids, d_sets)]
        passing = pc.greater_equal(pa.array(shared, pa.int64()),
                                   JUDGE_MIN_SHARED)
        return pa.table({
            "query_id": batch["query_id"].combine_chunks(),
            "alpha_pct": batch["alpha_pct"].combine_chunks(),
            "shared_terms": pa.array(shared, pa.int64()),
            "ctx_passing": pc.cast(passing, pa.int64()),
        })


def eval_sweep(sf_dir: str, nq: int = EVAL_NQ, k: int = EVAL_K,
               alphas: tuple[int, ...] = EVAL_ALPHAS):
    """The evaluation harness (C5): alpha grid × query set → hybrid
    retrieval top-``k`` (shared parameterized core — the exact arithmetic
    q35's oracle pins) → contexts judged by :class:`RelevancyJudge` →
    one row per (query, alpha): n_ctx, n_passing, passing (any context
    passes — RelevancyEvaluator emits one verdict per query).

    Scale shape: the hit list is ≤ nq·|alphas|·k rows BY CONSTRUCTION, so
    collecting it on the driver is size-bounded (not data-dependent); the
    context texts stream through the judge as a filtered ``map_batches``
    over documents — no shuffle after retrieval except the tiny final
    groupby over ≤ nq·|alphas| partial rows."""
    import ray

    from .similarity import hybrid_topk

    hits = hybrid_topk(sf_dir, nq=nq, k=k, alphas=alphas)
    hit_tab = pa.concat_tables(
        [b for b in hits.iter_batches(batch_format="pyarrow")]
        or [pa.table({"query_id": pa.array([], pa.int64()),
                      "alpha_pct": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "score_e6": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})])

    # query token sets (tiny, broadcast once)
    import pyarrow.parquet as pq

    qdocs = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", nq)])
    q_toks = {int(d): set(t) for d, t in
              zip(qdocs["doc_id"].to_pylist(),
                  _toks(qdocs["text"]).to_pylist())}
    # (query_id, alpha_pct) pairs per retrieved context doc
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for q, a, nid in zip(hit_tab["query_id"].to_pylist(),
                         hit_tab["alpha_pct"].to_pylist(),
                         hit_tab["neighbor_id"].to_pylist()):
        by_doc.setdefault(int(nid), []).append((int(q), int(a)))
    ref = ray.put(by_doc)  # q_toks ships separately (judge-only)

    def attach(b: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.array([int(i) in bd for i in ids], dtype=bool)
        b = b.filter(pa.array(keep))
        ids = ids[keep]
        reps = np.array([len(bd[int(i)]) for i in ids], dtype=np.int64) \
            if len(ids) else np.array([], dtype=np.int64)
        qs = [p[0] for i in ids for p in bd[int(i)]]
        alphas_ = [p[1] for i in ids for p in bd[int(i)]]
        idx = np.repeat(np.arange(len(ids)), reps)
        return pa.table({
            "query_id": pa.array(qs, pa.int64()),
            "alpha_pct": pa.array(alphas_, pa.int64()),
            "doc_id": pa.array(ids[idx] if len(ids) else [], pa.int64()),
            "text": b["text"].take(pa.array(idx, pa.int64())),
        })

    docs = R.read_table(sf_dir, "documents", ["doc_id", "text"])
    contexts = docs.map_batches(attach, batch_format="pyarrow")
    q_ref = ray.put(q_toks)
    judged = contexts.map_batches(
        RelevancyJudge, batch_format="pyarrow", concurrency=(1, 4),
        fn_constructor_args=(q_ref,))
    agg = R.partial_groupby(
        judged, ["query_id", "alpha_pct"],
        [("ctx_passing", "count", "n_ctx"),
         ("ctx_passing", "sum", "n_passing"),
         ("ctx_passing", "max", "passing")],
        merge_blocks=1)
    return agg.map_batches(
        lambda b: b.select(["query_id", "alpha_pct", "n_ctx", "n_passing",
                            "passing"]),
        batch_format="pyarrow")


def q57_eval_sweep(sf_dir: str):
    """Registry entry for the C5 sweep (evaluation.py's results frame:
    one row per (query, alpha) with the judge verdict)."""
    return eval_sweep(sf_dir)


_SQL_Q57 = rf"""
WITH d AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS toks
  FROM documents),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
c AS (SELECT d.doc_id, toks, emb FROM d JOIN e ON d.doc_id = e.vec_id),
q AS (SELECT * FROM c WHERE doc_id < {EVAL_NQ}),
s AS (
  SELECT q.doc_id AS query_id, a.alpha_pct, c.doc_id AS neighbor_id,
         (a.alpha_pct / 100.0) * list_cosine_similarity(q.emb, c.emb)
         + (1 - a.alpha_pct / 100.0) *
           (len(list_intersect(q.toks, c.toks))::DOUBLE
            / len(list_distinct(list_concat(q.toks, c.toks)))) AS score
  FROM q JOIN c ON c.doc_id <> q.doc_id
  CROSS JOIN (VALUES (0), (75), (100)) AS a(alpha_pct)),
hits AS (
  SELECT query_id, alpha_pct, neighbor_id
  FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id, alpha_pct
            ORDER BY score DESC, neighbor_id) AS rank FROM s)
  WHERE rank <= {EVAL_K}),
j AS (
  SELECT h.query_id, h.alpha_pct,
         CASE WHEN len(list_intersect(q.toks, ctx.toks))
                   >= {JUDGE_MIN_SHARED} THEN 1 ELSE 0 END AS ctx_passing
  FROM hits h
  JOIN q ON q.doc_id = h.query_id
  JOIN d ctx ON ctx.doc_id = h.neighbor_id)
SELECT query_id, alpha_pct, CAST(count(*) AS BIGINT) AS n_ctx,
       CAST(sum(ctx_passing) AS BIGINT) AS n_passing,
       CAST(max(ctx_passing) AS BIGINT) AS passing
FROM j GROUP BY query_id, alpha_pct
"""
