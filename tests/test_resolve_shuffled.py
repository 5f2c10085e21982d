"""Parity: the bucketed-shuffle resolve path (big-link-map fallback) must
produce exactly the broadcast path's triples (round-2 item #4)."""

from __future__ import annotations

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_shuffled_resolve_matches_broadcast(kg_artifacts):
    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.pipelines.kg import resolve_triples_shuffled

    broadcast = _canon(kg_artifacts["triples"].to_pandas())
    shuffled = _canon(resolve_triples_shuffled(
        kg_artifacts["triples_raw"], kg_artifacts["links"],
        kg_artifacts["canon_map"], DEFAULT_CONFIG).to_pandas())
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, shuffled)


def test_build_graph_shuffled_canon_matches_broadcast(ray_session,
                                                      unit_corpus):
    """Forcing canon_broadcast_limit=0 (round-3 de-drivered canon path:
    distributed canonicalize + bucketed-join application + fully shuffled
    resolve) must reproduce the default fused build_graph edges and nodes.
    Provenance samples are excluded (documented: both are capped samples)."""
    import dataclasses

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.pipelines.kg import build_graph

    def edge_set(e):
        out = set()
        for b in e.iter_batches(batch_format="pyarrow"):
            out.update(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                           b["obj"].to_pylist(), b["weight"].to_pylist()))
        return out

    base_e, base_n = build_graph(unit_corpus, DEFAULT_CONFIG)
    cfg = dataclasses.replace(DEFAULT_CONFIG, canon_driver_entities=0,
                              canon_broadcast_limit=0)
    shuf_e, shuf_n = build_graph(unit_corpus, cfg)
    be, se = edge_set(base_e), edge_set(shuf_e)
    assert be and be == se
    bn = _canon(base_n.to_pandas())
    sn = _canon(shuf_n.to_pandas())
    pd.testing.assert_frame_equal(bn, sn)
