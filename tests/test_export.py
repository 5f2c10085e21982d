"""Shuffled-shard export: the permutation must be a pure function of
(id, seed) — invariant to input partitioning — and the sharded write must
round-trip completely (round-2 VERDICT missing #3)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from cdrc_semantic_search_ray.pipelines import export as EX
from cdrc_semantic_search_ray.pipelines.relational import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_assign_shards_partition_invariance(ray_session):
    docs = read_table(SF_DIR, "documents", ["doc_id"])
    a = EX.assign_shards(docs, "doc_id", seed=42, num_shards=8).to_pandas()
    docs16 = read_table(SF_DIR, "documents", ["doc_id"]).repartition(16)
    b = EX.assign_shards(docs16, "doc_id", seed=42, num_shards=8).to_pandas()
    cols = ["shard", "pos"]
    pd.testing.assert_frame_equal(
        a.sort_values(cols).reset_index(drop=True),
        b.sort_values(cols).reset_index(drop=True))
    # a permutation: every doc exactly once, positions dense per shard
    assert a["doc_id"].is_unique
    for s, grp in a.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_assign_shards_seed_changes_permutation(ray_session):
    docs = read_table(SF_DIR, "documents", ["doc_id"])
    a = EX.assign_shards(docs, "doc_id", seed=42).to_pandas()
    docs2 = read_table(SF_DIR, "documents", ["doc_id"])
    b = EX.assign_shards(docs2, "doc_id", seed=7).to_pandas()
    am = dict(zip(a["doc_id"], zip(a["shard"], a["pos"])))
    bm = dict(zip(b["doc_id"], zip(b["shard"], b["pos"])))
    assert am.keys() == bm.keys()
    assert any(am[k] != bm[k] for k in am)  # different seed → different order


def test_write_shuffled_shards_roundtrip(ray_session, tmp_path):
    docs = read_table(SF_DIR, "documents", ["doc_id", "lang"])
    out = EX.write_shuffled_shards(docs, str(tmp_path / "shards"),
                                   "doc_id", seed=42, num_shards=4)
    back = pq.read_table(out)
    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "lang"])
    assert back.num_rows == src.num_rows
    assert sorted(back["doc_id"].to_pylist()) == \
        sorted(src["doc_id"].to_pylist())
    shards = set(
        int(str(s)) for s in back["shard"].to_pylist())
    assert shards <= set(range(4)) and len(shards) == 4
