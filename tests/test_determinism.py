"""Partition-order invariance of fixed-point aggregates (round-2 gate for
the q10 class of flakes): the same query must produce IDENTICAL values no
matter how the input is split into blocks/batches, because every float
column that gets summed is cast to exact int64 fixed-point per row first
(pipelines/queries.py ``_cents`` discipline).

Round-1 failure mode this guards: ``partial_groupby`` summed float64 in
batch-partition-dependent order, and half-up rounding of the sum flipped a
half-way case between num_cpus=8 and num_cpus=32 (VERDICT.md round 1).
"""

from __future__ import annotations

import pandas as pd
import pytest

from cdrc_semantic_search_ray.pipelines import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname", ["q10_window_hourly", "q01_pricing_summary",
                                   "q06_count_by_group"])
def test_fx_query_invariant_under_block_structure(ray_session, qname):
    """Run a _fx-sum query under two radically different block layouts and
    assert bit-identical results."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    orig = ctx.target_max_block_size

    base = _canon(Q.QUERIES[qname](SF_DIR).to_pandas())
    try:
        # tiny blocks → many partitions → different partial-sum order
        ctx.target_max_block_size = 16 * 1024
        small = _canon(Q.QUERIES[qname](SF_DIR).to_pandas())
    finally:
        ctx.target_max_block_size = orig

    pd.testing.assert_frame_equal(base, small)


def test_q10_matches_duckdb_exactly(ray_session):
    """Value-level oracle check (the driver's gate, in-process)."""
    import duckdb

    got = _canon(Q.QUERIES["q10_window_hourly"](SF_DIR).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/events.parquet')")
    want = _canon(con.sql(Q.ORACLE_SQL["q10_window_hourly"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
