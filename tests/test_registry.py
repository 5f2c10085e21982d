"""Registry horizon + rotated-query oracle evidence.

The external driver records correctness rows for the first DRIVER_HORIZON
registry entries only (observed rounds 2-3; round-3 ADVICE asked for the
cap to be explicit and test-pinned). This module (a) pins the intended
horizon membership so an innocent reordering can't silently change which
queries get driver rows, and (b) runs the driver's own compare (row count
+ columns + order-insensitive value hash vs DuckDB) for every
oracle-backed query rotated PAST the horizon, so rotation loses no
correctness evidence.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# the six operators that had no driver row in rounds 1-3 (registered past
# the old horizon) — round 4 rotated them inside — plus the three NEW
# round-4 operators (genai.py M11/C4/C5 analogues, all oracle-backed; new
# operators must not land in the driver's blind spot)
MUST_BE_INSIDE = {
    "q19_simhash_dedup", "q20_ngram_jaccard_dedup", "q24_similarity_ivf",
    "q28_langid", "q29_multimodal_features", "q53_approx_top_tokens",
    "q55_response_split", "q56_generate_answers", "q57_eval_sweep",
    "q58_fetch_resources", "q59_redact_terms", "q60_sequence_packing",
    "q61_incremental_dedup", "q62_stratified_sample",
    "q63_decontaminate", "q64_quantize_embeddings",
    "q65_repetition_quality", "q66_pack_sequences",
    "q67_kmeans_clusters", "q68_semantic_dedup",
    "q69_pagerank_entities", "q70_temperature_resample",
    "q71_lm_quality", "q72_dataset_card",
    "q73_pagerank_trade",  # round-5: oracle twin of q69's kernel
    "q74_visualise_embeddings",  # round-5: visualise_embeddings analogue
    "kg_conversations",
}
# redundantly-evidenced entries rotated out (each verified below or by the
# kg golden pytests; every rotated oracle query carries ≥2 green driver
# rows from rounds 1-3)
ROTATED_OUT = {
    "q02_filter_project", "q04_sort_limit", "q05_distinct",
    "q08_semi_join_agg", "q09_topk_per_group", "q21_embedding_neardup",
    "q11_string_normalize", "q12_regex_hits",
    "q10_window_hourly", "q13_monthly_orders", "q27_fingerprint",
    "q15_region_revenue", "q25_token_count",
    "q42_deterministic_sample", "q45_read_json_catalogue",
    "q47_sliding_window", "kg_mentions", "kg_triples",
    "q54_serving_session",  # stateful per-request serving — pytest-only
    # late-round-4 rotation for q67-q71 (each with FOUR green driver rows)
    "q33_param_sweep", "q34_csv_roundtrip", "q36_strip_html",
    "q37_read_text_mining", "q32_render_notes", "q06_count_by_group",
    # round-5 rotation for q73/q74 (window family keeps q38/q40/q44
    # inside; S5 pushdown is exercised by every query's read path)
    "q52_running_total", "q46_pushdown_scan",
}


def test_horizon_membership():
    from cdrc_semantic_search_ray.pipelines.queries import (DRIVER_HORIZON,
                                                            QUERIES)

    names = list(QUERIES)
    inside = set(names[:DRIVER_HORIZON])
    assert MUST_BE_INSIDE <= inside
    assert ROTATED_OUT == set(names[DRIVER_HORIZON:])
    assert all(callable(f) for f in QUERIES.values())


def test_every_registered_query_has_evidence():
    """Every horizon entry either has an oracle or is a documented
    rows-only operator; every rotated-out oracle query is re-checked by
    test_rotated_oracle_queries below."""
    from cdrc_semantic_search_ray.pipelines.queries import (DRIVER_HORIZON,
                                                            ORACLE_SQL,
                                                            QUERIES)

    rows_only_by_design = {
        # approximate / stateful / non-SQL-expressible (documented in each
        # docstring); bounded-error or golden pytests are their evidence
        "q18_minhash_lsh_dedup", "q19_simhash_dedup",
        "q20_ngram_jaccard_dedup", "q22_embedding_neardup_lsh",
        "q24_similarity_ivf", "q28_langid",
        "q49_approx_distinct", "q50_approx_quantiles",
        "q53_approx_top_tokens", "kg_conversations", "kg_mentions",
        "kg_triples",
        # iterative over a non-SQL-derivable input (q69's edges come from
        # synthetic transcripts the driver's DuckDB can't build): numpy
        # bit-exact parity + invariance pytests in tests/test_clustering.py;
        # the PageRank KERNEL is oracle-checked via q73's chained-CTE SQL
        # (q67 k-means and q68 SemDeDup carry full SQL oracles themselves)
        "q69_pagerank_entities",
    }
    for name in list(QUERIES)[:DRIVER_HORIZON]:
        assert name in ORACLE_SQL or name in rows_only_by_design, name


def _value_hash(df) -> str:
    from conftest import driver_value_hash

    return driver_value_hash(df)


def test_q41_broadcast_matches_join_path(ray_session):
    """q41's doc→lang side is size-gated (broadcast below the limit, hash
    join above): both paths must agree exactly."""
    from cdrc_semantic_search_ray.pipelines.queries import \
        q41_embedding_centroids

    key = ["lang", "pos"]
    a = q41_embedding_centroids(SF_DIR).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b = q41_embedding_centroids(SF_DIR, broadcast_limit=0).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    assert len(a) > 0


@pytest.mark.parametrize("name", ["q02_filter_project", "q04_sort_limit",
                                  "q05_distinct", "q08_semi_join_agg",
                                  "q09_topk_per_group",
                                  "q10_window_hourly",
                                  "q11_string_normalize", "q12_regex_hits",
                                  "q13_monthly_orders", "q15_region_revenue",
                                  "q21_embedding_neardup",
                                  "q25_token_count", "q27_fingerprint",
                                  "q42_deterministic_sample",
                                  "q45_read_json_catalogue",
                                  "q47_sliding_window",
                                  # late-round-4 rotations (q67-q72 took
                                  # their horizon slots)
                                  "q06_count_by_group", "q32_render_notes",
                                  "q33_param_sweep", "q34_csv_roundtrip",
                                  "q36_strip_html",
                                  "q37_read_text_mining",
                                  # round-5 rotations (q73/q74 took
                                  # their slots)
                                  "q52_running_total",
                                  "q46_pushdown_scan"])
def test_rotated_oracle_queries(ray_session, name):
    from conftest import duckdb_oracle

    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF_DIR).to_pandas()
    want = duckdb_oracle(ORACLE_SQL[name], SF_DIR)
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_polars_hash_rows_heals_poisoned_module():
    """The worker-poisoning failure mode pinned as a unit test: delete the
    attribute the half-initialized-module crash hits, then verify the
    hardened entry point purges + re-imports and returns the identical
    hashes (cross-process-stable seeded ahash — partition layouts depend
    on these values never changing)."""
    import pyarrow as pa

    from cdrc_semantic_search_ray.stages.keyblocks import polars_hash_rows

    t = pa.table({"k": pa.array(["a", "b", "c"])})
    want = polars_hash_rows(t, seed=0).tolist()

    import polars

    del polars._reexport.Series  # simulate the interrupted first import
    assert polars_hash_rows(t, seed=0).tolist() == want  # healed

    import polars as pl2

    assert hasattr(pl2._reexport, "Series")  # fresh module restored
