"""Join-path conformance: the bucketed-shuffle semi/anti path must produce
exactly the broadcast path's rows (round-2 item: no driver-side key
collection for unbounded key domains)."""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc

from cdrc_semantic_search_ray.pipelines import relational as R

SF_DIR = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_semi_join_shuffle_matches_broadcast(ray_session):
    li = R.read_table(SF_DIR, "lineitem", ["l_partkey"])
    part = R.read_table(SF_DIR, "part", ["p_partkey", "p_brand"])
    bcast = R.semi_join(part, "p_partkey", li, "l_partkey",
                        broadcast_limit=10_000_000).to_pandas()
    li2 = R.read_table(SF_DIR, "lineitem", ["l_partkey"])
    part2 = R.read_table(SF_DIR, "part", ["p_partkey", "p_brand"])
    shuf = R.semi_join(part2, "p_partkey", li2, "l_partkey",
                       broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(_canon(bcast), _canon(shuf))
    assert len(bcast) > 0


def test_anti_join_shuffle_matches_broadcast(ray_session):
    orders = R.read_table(SF_DIR, "orders", ["o_custkey", "o_orderstatus"])
    pending = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "P")),
        batch_format="pyarrow")
    cust = R.read_table(SF_DIR, "customer", ["c_custkey", "c_name"])
    bcast = R.anti_join(cust, "c_custkey", pending, "o_custkey",
                        broadcast_limit=10_000_000).to_pandas()
    orders2 = R.read_table(SF_DIR, "orders", ["o_custkey", "o_orderstatus"])
    pending2 = orders2.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "P")),
        batch_format="pyarrow")
    cust2 = R.read_table(SF_DIR, "customer", ["c_custkey", "c_name"])
    shuf = R.anti_join(cust2, "c_custkey", pending2, "o_custkey",
                       broadcast_limit=0).to_pandas()
    pd.testing.assert_frame_equal(_canon(bcast), _canon(shuf))
    assert len(bcast) > 0


def test_hash_join_string_keys(ray_session):
    """The vectorized string-key bucket path (pd.util.hash_array) joins
    correctly: documents ⨝ distinct(lang) built from the same table."""
    docs = R.read_table(SF_DIR, "documents", ["doc_id", "lang"])
    langs = R.distinct(R.read_table(SF_DIR, "documents", ["lang"]),
                       ["lang"]).map_batches(
        lambda b: b.rename_columns(["lang_r"]), batch_format="pyarrow")
    joined = R.hash_join(docs, langs, "lang", "lang_r",
                         num_buckets=8).to_pandas()
    base = R.read_table(SF_DIR, "documents",
                        ["doc_id", "lang"]).to_pandas()
    assert len(joined) == len(base)
    assert sorted(joined["doc_id"]) == sorted(base["doc_id"])
