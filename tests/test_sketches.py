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


def test_misra_gries_top_tokens_bounds(ray_session):
    """Heavy hitters: with capacity >> per-batch vocab the result is exact;
    with a TIGHT capacity the reported counts must bracket the exact counts
    within the carried eps bound and still surface every true heavy
    hitter whose margin exceeds the bound."""
    from cdrc_semantic_search_ray.pipelines.queries import q53_approx_top_tokens

    exact = duckdb.sql(f"""
        WITH t AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
          FROM '{SF_DIR}/documents.parquet')
        SELECT tok, count(*) AS n
        FROM t GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """).df()
    exact_map = dict(zip(exact["tok"], exact["n"]))

    wide = q53_approx_top_tokens(SF_DIR, k=20, capacity=100_000).to_pandas()
    assert list(wide["item"]) == list(exact["tok"])
    assert list(wide["cnt"]) == list(exact["n"])
    assert (wide["eps_bound"] == 0).all()

    # vocab at sf0.01 is 31 tokens — capacity 8 forces per-batch pruning
    tight = q53_approx_top_tokens(SF_DIR, k=20, capacity=8).to_pandas()
    eps = int(tight["eps_bound"].iloc[0])
    assert eps > 0  # the prune path actually exercised
    for item, cnt in zip(tight["item"], tight["cnt"]):
        true = exact_map.get(item)
        if true is not None:  # reported count brackets the truth
            assert cnt <= true <= cnt + eps, (item, cnt, true, eps)
    # every unambiguous heavy hitter (beats the 20th + eps) must appear
    floor = int(exact["n"].iloc[-1]) + eps
    must = set(exact[exact["n"] > floor]["tok"])
    assert must <= set(tight["item"])


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
