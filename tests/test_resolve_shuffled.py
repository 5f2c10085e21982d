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
