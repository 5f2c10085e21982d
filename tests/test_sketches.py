"""Sketch aggregates: error bounds vs exact DuckDB answers + mergeability
(partition-count invariance). These are the oracle substitute for the
approximate family — same pattern as the IVF recall floor (round-2 VERDICT
next #5)."""

from __future__ import annotations

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def test_hll_error_bound(ray_session):
    from cdrc_semantic_search_ray.pipelines.queries import q49_approx_distinct

    got = q49_approx_distinct(SF_DIR).to_pandas().set_index("event_type")
    exact = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY event_type"
    ).df().set_index("event_type")
    assert set(got.index) == set(exact.index)
    for et in exact.index:
        e = int(exact.loc[et, "n"])
        a = int(got.loc[et, "approx_distinct"])
        assert abs(a - e) / e <= 0.05, (et, a, e)


def test_hll_partition_invariance(ray_session):
    """Register merge is an elementwise max → estimates must be identical
    at any partitioning of the same input."""
    from cdrc_semantic_search_ray.pipelines import sketches as SK
    from cdrc_semantic_search_ray.pipelines.relational import read_table

    ev = read_table(SF_DIR, "events", ["event_type", "user_id"])
    a = SK.approx_distinct(ev, "event_type", "user_id").to_pandas()
    ev16 = read_table(SF_DIR, "events",
                      ["event_type", "user_id"]).repartition(16)
    b = SK.approx_distinct(ev16, "event_type", "user_id").to_pandas()
    key = ["event_type"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_ddsketch_error_bound(ray_session):
    from cdrc_semantic_search_ray.pipelines.queries import q50_approx_quantiles

    got = q50_approx_quantiles(SF_DIR).to_pandas()
    exact = duckdb.sql(
        f"""SELECT l_returnflag, 50 AS q_pct,
                   quantile_disc(l_extendedprice, 0.5) AS v
            FROM '{SF_DIR}/lineitem.parquet' GROUP BY l_returnflag
            UNION ALL
            SELECT l_returnflag, 90, quantile_disc(l_extendedprice, 0.9)
            FROM '{SF_DIR}/lineitem.parquet' GROUP BY l_returnflag
            UNION ALL
            SELECT l_returnflag, 99, quantile_disc(l_extendedprice, 0.99)
            FROM '{SF_DIR}/lineitem.parquet' GROUP BY l_returnflag"""
    ).df()
    merged = got.merge(exact, on=["l_returnflag", "q_pct"])
    assert len(merged) == len(got) == 3 * exact["l_returnflag"].nunique()
    rel = ((merged["approx"] - merged["v"]).abs() / merged["v"])
    # DDSketch guarantee: value within alpha of the exact rank value;
    # allow 2*alpha for rank-convention differences at tie boundaries
    assert (rel <= 0.02).all(), merged[rel > 0.02]


def test_ddsketch_partition_invariance(ray_session):
    from cdrc_semantic_search_ray.pipelines import sketches as SK
    from cdrc_semantic_search_ray.pipelines.relational import read_table

    li = read_table(SF_DIR, "lineitem", ["l_returnflag", "l_extendedprice"])
    a = SK.approx_quantiles(li, "l_returnflag", "l_extendedprice").to_pandas()
    li16 = read_table(SF_DIR, "lineitem",
                      ["l_returnflag", "l_extendedprice"]).repartition(16)
    b = SK.approx_quantiles(li16, "l_returnflag",
                            "l_extendedprice").to_pandas()
    cols = ["l_returnflag", "q_pct"]
    pd.testing.assert_frame_equal(
        a.sort_values(cols).reset_index(drop=True),
        b.sort_values(cols).reset_index(drop=True))
