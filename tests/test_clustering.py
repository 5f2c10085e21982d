"""Clustering + graph-analytics conformance (q67/q68/q69/q70).

k-means and PageRank are iterative, so they carry no SQL oracle; these
tests ARE the correctness gate: pure-numpy references re-implementing the
identical fixed-point semantics, partitioning-invariance (results must not
depend on block boundaries), and planted-duplicate behavior for SemDeDup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cdrc_semantic_search_ray.pipelines import clustering as C
from cdrc_semantic_search_ray.pipelines import relational as R

SF_DIR = "/root/testdata/sf0.001"


def _emb():
    return R.read_table(SF_DIR, "embeddings", ["vec_id", "embedding"])


# ---------------------------------------------------------------------------
# numpy references with the IDENTICAL exact-arithmetic semantics
# ---------------------------------------------------------------------------


def _ref_encode(ids, mat):
    m = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    x = 1e6 * m
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def _ref_seeds(ids, v_e6, k):
    mix = ids.astype(np.uint64) * C._SEED_MIX
    order = np.lexsort((ids, mix))[:k]
    return v_e6[order]


def _ref_kmeans(ids, mat, k, iters):
    v = _ref_encode(ids, mat)
    cm = _ref_seeds(ids, v, k)
    for _ in range(iters):
        sims = v.astype(np.float64) @ cm.astype(np.float64).T
        a = np.argmax(sims, axis=1)
        new = cm.astype(np.float64).copy()
        for c in range(k):
            mask = a == c
            if mask.any():
                new[c] = v[mask].sum(axis=0) / mask.sum()
        new = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True),
                               1e-12) * 1e6
        cm = np.copysign(np.floor(np.abs(new) + 0.5), new).astype(np.int64)
    sims = v.astype(np.float64) @ cm.astype(np.float64).T
    a = np.argmax(sims, axis=1)
    best = sims[np.arange(len(a)), a] / 1e12
    sim6 = np.copysign(np.floor(np.abs(best) * 1e6 + 0.5),
                       best).astype(np.int64)
    return a, sim6, cm


def _collect_emb():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].combine_chunks().to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, mat


def test_kmeans_matches_numpy_reference(ray_session):
    """Distributed Lloyd's == single-process Lloyd's, bit-exact: the
    fixed-point discipline makes partial sums associative and matmuls
    exact, so the two must agree on every assignment AND similarity."""
    ids, mat = _collect_emb()
    ra, rsim, rcm = _ref_kmeans(ids, mat, k=5, iters=3)

    asg, cm = C.kmeans(_emb(), k=5, iters=3)
    got = asg.to_pandas().sort_values("id").reset_index(drop=True)
    order = np.argsort(ids)
    assert np.array_equal(cm, rcm)
    assert np.array_equal(got["cluster"].to_numpy(), ra[order])
    assert np.array_equal(got["sim_e6"].to_numpy(), rsim[order])


def test_kmeans_partitioning_invariance(ray_session):
    """Same result at 1 block and at 13 blocks (different batch boundaries
    ⇒ different partial-sum groupings — the exact-int discipline makes the
    reduction associative)."""
    a1, cm1 = C.kmeans(_emb().repartition(1), k=4, iters=2)
    a2, cm2 = C.kmeans(_emb().repartition(13), k=4, iters=2)
    assert np.array_equal(cm1, cm2)
    d1 = a1.to_pandas().sort_values("id").reset_index(drop=True)
    d2 = a2.to_pandas().sort_values("id").reset_index(drop=True)
    assert d1[["id", "cluster", "sim_e6"]].equals(
        d2[["id", "cluster", "sim_e6"]])


def test_kmeans_k_exceeds_corpus_raises(ray_session):
    import ray.data as rd

    tiny = rd.from_items([{"vec_id": i, "embedding": [float(i), 1.0]}
                          for i in range(3)])
    with pytest.raises(ValueError, match="exceeds corpus size"):
        C.kmeans(tiny, k=10, iters=1)


def test_semantic_dedup_prunes_planted_duplicates(ray_session):
    """Plant exact copies of existing vectors under fresh ids: every copy
    must be pruned (cosine 1.0 to its exemplar ≥ threshold) while exactly
    one representative per duplicate family is kept."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    base = t.to_pylist()
    planted = [{"vec_id": 10_000 + i, "embedding": base[i]["embedding"]}
               for i in range(20)]
    ds = rd.from_items(base + planted).repartition(4)

    out = C.semantic_dedup(ds, k=6, iters=3,
                           threshold_e6=999_000).to_pandas()
    assert len(out) == len(base) + 20
    # each planted id pairs with its source: both land in the same cluster
    # (identical vector ⇒ identical assignment); at most one of the family
    # survives
    for i in range(20):
        fam = out[out["id"].isin([base[i]["vec_id"], 10_000 + i])]
        assert fam["cluster"].nunique() == 1
        assert int(fam["kept"].sum()) == 1, fam
    # exemplars always survive
    ex = out[out["id"].isin(out["exemplar_id"])]
    assert bool(ex["kept"].all())


def test_semantic_dedup_partitioning_invariance(ray_session):
    o1 = (C.semantic_dedup(_emb().repartition(1), k=4, iters=2,
                           threshold_e6=990_000)
          .to_pandas().sort_values("id").reset_index(drop=True))
    o2 = (C.semantic_dedup(_emb().repartition(9), k=4, iters=2,
                           threshold_e6=990_000)
          .to_pandas().sort_values("id").reset_index(drop=True))
    assert o1.equals(o2)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _ref_pagerank(edges, iters=10, damp_num=85, damp_den=100):
    """Dense reference with the identical integer floor semantics."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n, dtype=np.int64)
    for s, d, w in edges:
        outw[ix[s]] += w
    rank = np.full(n, C.PR_SCALE // n, dtype=np.int64)
    for _ in range(iters):
        in_sum = np.zeros(n, dtype=np.int64)
        for s, d, w in edges:
            in_sum[ix[d]] += rank[ix[s]] * w // max(outw[ix[s]], 1)
        dangling = int(rank[outw == 0].sum())
        teleport = ((damp_den - damp_num) * C.PR_SCALE) // (damp_den * n)
        dshare = (damp_num * dangling) // (damp_den * n)
        rank = teleport + dshare + (damp_num * in_sum) // damp_den
    return dict(zip(nodes, rank.tolist()))


_EDGES = [
    ("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("a", "c", 1),
    ("d", "a", 3), ("e", "a", 1), ("c", "e", 4), ("b", "a", 1),
    ("f", "b", 2),  # f is reachable-from-nowhere; g below is dangling
    ("a", "g", 1),
]


def test_pagerank_matches_dense_reference(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"subj": s, "obj": o, "weight": w}
                        for s, o, w in _EDGES])
    got = {r["node"]: r["rank_fx"]
           for r in C.pagerank(ds, iters=12).take_all()}
    assert got == _ref_pagerank(_EDGES, iters=12)


def test_pagerank_partitioning_invariance_and_mass(ray_session):
    import ray.data as rd

    items = [{"subj": s, "obj": o, "weight": w} for s, o, w in _EDGES]
    g1 = {r["node"]: r["rank_fx"]
          for r in C.pagerank(rd.from_items(items).repartition(1),
                              iters=8).take_all()}
    g2 = {r["node"]: r["rank_fx"]
          for r in C.pagerank(rd.from_items(items).repartition(7),
                              iters=8).take_all()}
    assert g1 == g2
    # floor arithmetic only ever LOSES sub-ULP mass: total stays within
    # (iters × (n_nodes + E)) of the initial PR_SCALE and never exceeds it
    total = sum(g1.values())
    assert total <= C.PR_SCALE
    assert total >= C.PR_SCALE - 8 * (len(g1) + len(_EDGES)) * 2


def test_pagerank_distributed_path_parity(ray_session):
    """Gate-0 parity: forcing the Dataset-resident path (node gate 0 ⇒
    every node count exceeds it) must reproduce the broadcast path's
    ranks exactly — both run the identical integer arithmetic."""
    import ray.data as rd

    items = [{"subj": s, "obj": o, "weight": w} for s, o, w in _EDGES]
    bc = {r["node"]: r["rank_fx"]
          for r in C.pagerank(rd.from_items(items), iters=6).take_all()}
    dist = {r["node"]: r["rank_fx"]
            for r in C.pagerank(rd.from_items(items), iters=6,
                                node_broadcast_limit=0).take_all()}
    assert dist == bc


def test_pagerank_edge_gate_parity(ray_session):
    """Edge-gate-0 parity (round-5 driver-local fast path): forcing the
    per-iteration Ray scan (edge gate 0) must reproduce the driver-local
    iteration's ranks exactly — same integer arithmetic, only the
    execution venue differs."""
    import ray.data as rd

    items = [{"subj": s, "obj": o, "weight": w} for s, o, w in _EDGES]
    local = {r["node"]: r["rank_fx"]
             for r in C.pagerank(rd.from_items(items), iters=6).take_all()}
    scan = {r["node"]: r["rank_fx"]
            for r in C.pagerank(rd.from_items(items), iters=6,
                                edge_driver_limit=0).take_all()}
    assert scan == local


def test_pagerank_sink_dominates(ray_session):
    """Sanity on semantics: a node every edge points at outranks the
    sources pointing at it."""
    import ray.data as rd

    edges = [{"subj": f"s{i}", "obj": "hub", "weight": 1} for i in range(9)]
    got = {r["node"]: r["rank_fx"]
           for r in C.pagerank(rd.from_items(edges), iters=10).take_all()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub") * 3


def test_temperature_resample_rate_semantics(ray_session):
    """q70's temperature rule, checked on the real sf0.01 table: the
    smallest lang keeps (almost) everything, larger langs are sampled at
    rate sqrt(n_min/n) — kept counts must land near n·rate, and the
    smallest group's kept fraction must exceed every larger group's."""
    import duckdb

    from cdrc_semantic_search_ray.pipelines.queries import \
        q70_temperature_resample

    sf = "/root/testdata/sf0.01"
    out = q70_temperature_resample(sf).to_pandas()
    counts = dict(duckdb.sql(
        f"select lang, count(*) from '{sf}/documents.parquet' group by lang"
    ).fetchall())
    n_min = min(counts.values())
    kept = out.groupby("lang").size().to_dict()
    for lang, n in counts.items():
        rate = (n_min / n) ** 0.5
        expect = n * rate
        # md5-prefix Bernoulli at 2^32 granularity: binomial-ish tolerance
        assert abs(kept.get(lang, 0) - expect) <= max(6, 4 * expect ** 0.5), \
            (lang, kept.get(lang, 0), expect)
    fracs = {lg: kept.get(lg, 0) / counts[lg] for lg in counts}
    smallest = min(counts, key=counts.get)
    assert all(fracs[smallest] >= fracs[lg] - 1e-9 for lg in counts)


def test_assign_to_centroids_roundtrip(ray_session, tmp_path):
    """The incremental-ingestion handoff: save centroids, reload, assign
    the SAME corpus — every vector must land in the identical cluster
    with the identical similarity the training pass produced (the
    assignment arithmetic is shared, the parquet roundtrip exact)."""
    asg, cm = C.kmeans(_emb(), k=5, iters=2)
    want = asg.to_pandas().sort_values("id").reset_index(drop=True)

    path = str(tmp_path / "centroids.parquet")
    C.save_centroids(cm, path)
    loaded = C.load_centroids(path)
    assert np.array_equal(loaded, cm)

    got = (C.assign_to_centroids(_emb(), loaded)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got[["id", "cluster", "sim_e6"]].equals(
        want[["id", "cluster", "sim_e6"]])


def test_q72_ignores_null_sources(ray_session, tmp_path):
    """q72's n_sources must match count(DISTINCT source) — NULLs ignored —
    and a NULL source must not crash the keyed exchange (Ray sort cannot
    key on NULLs; q72 coalesces + carries a has_src flag in the key)."""
    import pyarrow.parquet as pq

    from cdrc_semantic_search_ray.pipelines.queries import q72_dataset_card

    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "en", "de"]),
        "source": pa.array(["s1", None, "", "s2"]),  # null + empty-string
        "n_chars": pa.array([5, 5, 5, 5], pa.int64()),
        "text": pa.array(["a b", "c", "d e f", "g"]),
    }), f"{d}/documents.parquet")
    out = q72_dataset_card(d).to_pandas().set_index("lang")
    assert int(out.loc["en", "n_sources"]) == 2  # {"s1", ""} — null ignored
    assert int(out.loc["en", "n_docs"]) == 3     # null row still counted
    assert int(out.loc["en", "n_tokens"]) == 6
    assert int(out.loc["de", "n_sources"]) == 1
