"""Distributed-pipeline conformance vs the sequential golden oracle
(BASELINE.json: triple P/R >= 0.95; per-turn text byte-equality)."""

import pyarrow.compute as pc
import pyarrow.parquet as pq


def _triple_set(ds):
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        out.update(zip(b["conv_id"].to_pylist(), b["turn_idx"].to_pylist(),
                       b["subj"].to_pylist(), b["pred"].to_pylist(),
                       b["obj"].to_pylist()))
    return out


def test_triples_pr_vs_golden(kg_artifacts, golden_result):
    pset = _triple_set(kg_artifacts["triples"])
    gset = golden_result["triples"]
    tp = len(pset & gset)
    precision = tp / max(1, len(pset))
    recall = tp / max(1, len(gset))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # both deterministic → expect exact agreement
    assert pset == gset


def test_text_equality_invariant(kg_artifacts, unit_corpus):
    """Per-turn text must survive normalize+reassembly byte-exact under
    stable (conv_id, turn_idx) ordering (BASELINE.json:15)."""
    from cdrc_semantic_search_ray.stages.reassemble import explode

    flat = explode(kg_artifacts["conversations"])
    got = {}
    for b in flat.iter_batches(batch_format="pyarrow"):
        for c, t, x in zip(b["conv_id"].to_pylist(), b["turn_idx"].to_pylist(),
                           b["text"].to_pylist()):
            got[(c, t)] = x
    src = pq.read_table(unit_corpus / "transcripts",
                        columns=["conv_id", "turn_idx", "text"])
    want = {
        (c, t): x
        for c, t, x in zip(src["conv_id"].to_pylist(),
                           src["turn_idx"].to_pylist(),
                           src["text"].to_pylist())
    }
    assert got == want  # byte-exact, every turn present exactly once


def test_reassembly_sorted_and_complete(kg_artifacts):
    for b in kg_artifacts["conversations"].iter_batches(batch_format="pyarrow"):
        for n, turns in zip(b["n_turns"].to_pylist(), b["turns"].to_pylist()):
            idxs = [t["turn_idx"] for t in turns]
            assert idxs == sorted(idxs) == list(range(n))


def test_canon_map_matches_truth(kg_artifacts, unit_corpus):
    """LSH blocking + distributed label propagation must find exactly the
    injected near-duplicate groups (margin asserted at generation time)."""
    got = {}
    for b in kg_artifacts["canon_map"].iter_batches(batch_format="pyarrow"):
        got.update(zip(b["entity_key"].to_pylist(),
                       b["canonical_id"].to_pylist()))
    ct = pq.read_table(unit_corpus / "canon_truth.parquet")
    truth = dict(zip(ct["entity_id"].to_pylist(), ct["canonical_id"].to_pylist()))
    assert got == truth


def test_links_resolve_typos_via_embedding(kg_artifacts):
    """Typo'd surfaces (absent from the exact alias map) must link through
    the embedding-cosine path — the reference's dense-retrieval half."""
    methods = set()
    for b in kg_artifacts["links"].iter_batches(batch_format="pyarrow"):
        methods.update(b["method"].to_pylist())
    assert "exact" in methods and "embed" in methods


def test_edges_weights_consistent(kg_artifacts):
    triples = kg_artifacts["triples"]
    edges = kg_artifacts["edges"]
    n_triples = triples.count()
    total_weight = 0
    for b in edges.iter_batches(batch_format="pyarrow"):
        total_weight += int(pc.sum(b["weight"]).as_py())
        for w, prov in zip(b["weight"].to_pylist(), b["provenance"].to_pylist()):
            assert 1 <= len(prov) <= min(w, 8)
    assert total_weight == n_triples


def test_aggregate_nodes_join_path_matches_broadcast(kg_artifacts,
                                                     unit_corpus):
    """aggregate_nodes' catalogue decoration is size-gated (round-4: the
    last ungated driver read of the catalogue): broadcast path below
    canon_broadcast_limit, bucketed left-outer hash_join + coalesce above.
    Gate forced to 0 must give an identical node table."""
    import dataclasses

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.pipelines import kg as K

    cat = str(unit_corpus / "catalogue.parquet")
    edges = kg_artifacts["edges"]

    def node_set(ds):
        rows = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            rows.update(zip(b["node_id"].to_pylist(), b["name"].to_pylist(),
                            b["kind"].to_pylist(), b["degree"].to_pylist(),
                            b["weight"].to_pylist()))
        return rows

    broadcast = node_set(K.aggregate_nodes(edges, cat, DEFAULT_CONFIG))
    shuffled = node_set(K.aggregate_nodes(
        edges, cat, dataclasses.replace(DEFAULT_CONFIG,
                                        canon_broadcast_limit=0)))
    assert broadcast == shuffled and broadcast


def test_partition_count_invariance(ray_session, tmp_path):
    """Same corpus written as 1 file vs 16 files → identical triple sets
    (FIXTURES.md partitioning probe)."""
    import pyarrow.parquet as pq_

    from cdrc_semantic_search_ray.fixtures import generate_corpus
    from cdrc_semantic_search_ray.pipelines.kg import run_kg

    a = generate_corpus(tmp_path / "a", n_convs=12, seed=11, n_files=1)
    b = generate_corpus(tmp_path / "b", n_convs=12, seed=11, n_files=16)
    ta = pq_.read_table(a / "transcripts").num_rows
    tb = pq_.read_table(b / "transcripts").num_rows
    assert ta == tb
    sa = _triple_set(run_kg(a)["triples"])
    sb = _triple_set(run_kg(b)["triples"])
    assert sa == sb and sa


def test_distributed_components_match_driver_path():
    """The distributed min-label propagation (driver_threshold=0) and the
    driver-side union-find fast path must produce identical labels."""
    import ray.data as rd
    import pyarrow as pa

    from cdrc_semantic_search_ray.pipelines.components import (
        connected_components,
    )

    edges = rd.from_arrow(pa.table({
        # two chained components {a,b,c,d} and {x,y}, plus duplicate edges
        "a": ["n:b", "n:a", "n:c", "n:x", "n:b"],
        "b": ["n:c", "n:b", "n:d", "n:y", "n:c"],
        "score": [1.0, 1.0, 1.0, 1.0, 1.0],
    }))

    def to_map(labels):
        out = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        return out

    dist = to_map(connected_components(edges, driver_threshold=0))
    fast = to_map(connected_components(edges, driver_threshold=10**6))
    expect = {"n:b": "n:a", "n:c": "n:a", "n:d": "n:a", "n:y": "n:x"}
    # distributed path also emits root self-labels; fast path defaults them
    for k, v in expect.items():
        assert dist[k] == v and fast[k] == v
    for k, v in dist.items():
        assert fast.get(k, k) == v


def test_canonicalize_distributed_matches_local(unit_corpus):
    """The zero-Ray-job local canonicalize fast path and the fully
    distributed blocking + label-propagation path must agree exactly."""
    from dataclasses import replace

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.pipelines.kg import canonicalize

    cat = str(unit_corpus / "catalogue.parquet")

    def to_map(ds):
        out = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["entity_key"].to_pylist(),
                           b["canonical_id"].to_pylist()))
        return out

    local = to_map(canonicalize(cat, DEFAULT_CONFIG))
    dist_cfg = replace(DEFAULT_CONFIG, canon_driver_entities=0,
                       canon_driver_threshold=0)
    dist = to_map(canonicalize(cat, dist_cfg))
    assert local == dist


def test_candidate_pairs_join_scoring_matches_broadcast(ray_session,
                                                        unit_corpus):
    """score_pairs' two paths must agree bit-exactly: broadcast (ids,
    matrix) gather vs pair_vec_broadcast_limit=0 (two bucketed hash joins
    on fixed-size-binary vectors) — same shared scoring kernel."""
    from dataclasses import replace

    import pyarrow as pa
    import ray.data as rd

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.stages.blocking import candidate_pairs

    cat = pq.read_table(unit_corpus / "catalogue.parquet",
                        columns=["entity_id", "vec"])
    tbl = pa.table({"node_id": cat["entity_id"], "vec": cat["vec"]})

    def pset(ds):
        out = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.update({(a, x): s for a, x, s in zip(
                b["a"].to_pylist(), b["b"].to_pylist(),
                b["score"].to_pylist())})
        return out

    base = pset(candidate_pairs(rd.from_arrow(tbl), DEFAULT_CONFIG))
    joined = pset(candidate_pairs(
        rd.from_arrow(tbl),
        replace(DEFAULT_CONFIG, pair_vec_broadcast_limit=0)))
    assert base and base == joined


def test_actor_pool_path_matches_task_path(unit_corpus):
    """use_actor_pools=True (the GPU-model seam) and the default task path
    must produce identical triples and links."""
    from dataclasses import replace

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.pipelines import kg as K

    lex = str(unit_corpus / "lexicon.parquet")
    cat = str(unit_corpus / "catalogue.parquet")
    actor_cfg = replace(DEFAULT_CONFIG, use_actor_pools=True)

    def triple_set(cfg):
        conv = K.build_conversations(unit_corpus)
        tr = K.extract_triples(conv, lex, cfg)
        out = set()
        for b in tr.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["conv_id"].to_pylist(), b["turn_idx"].to_pylist(),
                           b["subj_norm"].to_pylist(), b["pred"].to_pylist(),
                           b["obj_norm"].to_pylist()))
        return out

    assert triple_set(DEFAULT_CONFIG) == triple_set(actor_cfg)


def test_build_graph_matches_run_kg(kg_artifacts, unit_corpus):
    """The fused production path (build_graph: partial-agg then resolve
    distinct keys inline) must yield the same weighted edge set as the
    artifact path (resolve every row, then aggregate)."""
    from cdrc_semantic_search_ray.pipelines.kg import build_graph

    def edge_weights(ds):
        out = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.update({
                (s, p, o): w
                for s, p, o, w in zip(b["subj"].to_pylist(),
                                      b["pred"].to_pylist(),
                                      b["obj"].to_pylist(),
                                      b["weight"].to_pylist())
            })
        return out

    edges_fast, nodes_fast = build_graph(unit_corpus)
    assert edge_weights(edges_fast) == edge_weights(kg_artifacts["edges"])
    assert nodes_fast.count() == kg_artifacts["nodes"].count()


def test_bucket_count_invariance(unit_corpus):
    """Triple output must not depend on the reassembly bucket count
    (SURVEY.md §5.5: partitioning is placement, never semantics)."""
    from cdrc_semantic_search_ray.pipelines import kg as K
    from cdrc_semantic_search_ray.stages.reassemble import reassemble

    lex = str(unit_corpus / "lexicon.parquet")

    def triples_with_buckets(p):
        conv = reassemble(K.read_transcripts(unit_corpus), num_buckets=p)
        tr = K.extract_triples(conv, lex)
        out = set()
        for b in tr.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["conv_id"].to_pylist(), b["turn_idx"].to_pylist(),
                           b["subj_norm"].to_pylist(), b["pred"].to_pylist(),
                           b["obj_norm"].to_pylist()))
        return out

    assert triples_with_buckets(7) == triples_with_buckets(64)
