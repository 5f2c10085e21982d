"""Serving-path analogue (reference search_service/api.py + model.py):
stateful session build-once/query-many, hybrid scoring vs an independent
brute-force recompute, parent-document grouping, deterministic explain,
and the detached-actor deployment path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def session():
    from cdrc_semantic_search_ray.pipelines.service import load_session

    return load_session(SF_DIR)


def test_run_matches_bruteforce_hybrid(session):
    """The inverted-index sparse score + matmul dense score must equal an
    INDEPENDENT per-chunk recompute of α·cosine + (1−α)·Jaccard built
    straight from the raw document text (same tokenizer kernel)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cdrc_semantic_search_ray.functions.embed import embed_texts
    from cdrc_semantic_search_ray.pipelines.service import (CHUNK_TOKENS,
                                                            _chunk_spans)

    q = "population health survey data"
    out = session.run(q, top_k=5, alpha=0.75)
    got = {r["doc_id"]: r["score"] for r in out["results_content"]}

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    tok_lists = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(
            docs["text"].combine_chunks())), r"\s+").to_pylist()
    n_tok = np.array([len(t) for t in tok_lists], dtype=np.int64)
    doc_idx, starts = _chunk_spans(n_tok)

    q_toks = set(q.lower().split())
    qv = embed_texts([q], dim=session.embed_dim)[0].astype(np.float64)
    best: dict[int, float] = {}
    for d, s in zip(doc_idx, starts):
        window = tok_lists[d][s:s + CHUNK_TOKENS]
        toks = set(window)
        inter = len(q_toks & toks)
        union = len(q_toks) + len(toks) - inter
        jac = inter / union if union else 0.0
        cos = float(embed_texts([" ".join(window)],
                                dim=session.embed_dim)[0]
                    .astype(np.float64) @ qv)
        sc = 0.75 * cos + 0.25 * jac
        doc = int(docs["doc_id"][d].as_py())
        best[doc] = max(best.get(doc, -np.inf), sc)
    for doc_id, score in got.items():
        assert score == pytest.approx(best[doc_id], abs=1e-12)
    # top_k is the k best parent docs, deterministically ordered
    want_top = sorted(best, key=lambda d: (-best[d], d))[:5]
    assert list(got) == want_top


def test_session_state_and_explain(session):
    out = session.run("transport census region", top_k=3)
    rid = out["results_id"]
    exp = session.explain(rid, 0)
    assert exp["metadata"]["query"] == "transport census region"
    assert exp["explained_response"]["doc_id"] == \
        out["results_content"][0]["doc_id"]
    assert exp["explained_response"]["n_chunks"] >= 1
    # matched terms really occur in the document's text
    doc_id = exp["explained_response"]["doc_id"]
    import pyarrow.parquet as pq

    text = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .filter(pa.compute.equal(pa.compute.field("doc_id"), doc_id))
    words = set(text["text"][0].as_py().lower().split())
    for t in exp["explained_response"]["matched_terms"]:
        assert t in words
    assert session.explain("not-a-real-id", 0)["error"]


def test_q54_registry_entry_deterministic(ray_session):
    from cdrc_semantic_search_ray.pipelines.service import q54_serving_session

    a = q54_serving_session(SF_DIR)
    b = q54_serving_session(SF_DIR)
    assert a.equals(b)
    assert a.num_rows > 0
    assert a.column_names == ["query", "rank", "doc_id", "score_e6"]


def test_detached_actor_deployment(ray_session):
    """serve() → named detached actor; a second serve() call reuses it
    (get_if_exists), and remote run matches the local session."""
    import ray

    from cdrc_semantic_search_ray.pipelines.service import (load_session,
                                                            serve)

    h1 = serve(SF_DIR, name="cdrc_test_service")
    h2 = serve(SF_DIR, name="cdrc_test_service")
    try:
        remote = ray.get(h1.run.remote("service data report", top_k=4))
        local = load_session(SF_DIR).run("service data report", top_k=4)
        assert [r["doc_id"] for r in remote["results_content"]] == \
            [r["doc_id"] for r in local["results_content"]]
        assert ray.get_actor("cdrc_test_service") is not None
    finally:
        ray.kill(h1)
