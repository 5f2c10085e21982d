"""Property-based join conformance: the bucketed distributed hash_join must
equal a single driver-side Acero join on ANY input — random key domains,
duplicates on both sides, empty intersections, every supported join type,
single and composite keys."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdrc_semantic_search_ray.pipelines.relational import hash_join

KEYS = st.integers(min_value=0, max_value=8)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:  # None vs NaN normalization for outer joins
        df[c] = df[c].astype("object").where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@st.composite
def join_case(draw):
    n_l = draw(st.integers(min_value=0, max_value=12))
    n_r = draw(st.integers(min_value=0, max_value=12))
    lk = [draw(st.lists(KEYS, min_size=n_l, max_size=n_l)),
          draw(st.lists(KEYS, min_size=n_l, max_size=n_l))]
    rk = [draw(st.lists(KEYS, min_size=n_r, max_size=n_r)),
          draw(st.lists(KEYS, min_size=n_r, max_size=n_r))]
    jt = draw(st.sampled_from(
        ["inner", "left outer", "left semi", "left anti",
         "right outer", "full outer"]))
    composite = draw(st.booleans())
    return lk, rk, jt, composite


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(join_case())
def test_hash_join_matches_acero(ray_session, case):
    import ray.data as rd

    lk, rk, jt, composite = case
    lt = pa.table({"k1": pa.array(lk[0], pa.int64()),
                   "k2": pa.array(lk[1], pa.int64()),
                   "lv": pa.array(range(len(lk[0])), pa.int64())})
    rt = pa.table({"rk1": pa.array(rk[0], pa.int64()),
                   "rk2": pa.array(rk[1], pa.int64()),
                   "rv": pa.array(range(len(rk[0])), pa.int64())})
    if composite:
        keys_l, keys_r = ["k1", "k2"], ["rk1", "rk2"]
    else:
        keys_l, keys_r = "k1", "rk1"
        lt = lt.drop_columns(["k2"])
        rt = rt.drop_columns(["rk2"])

    got = hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    keys_l, keys_r, num_buckets=4,
                    join_type=jt).to_pandas()
    want = lt.join(rt, keys=[keys_l] if isinstance(keys_l, str) else keys_l,
                   right_keys=[keys_r] if isinstance(keys_r, str) else keys_r,
                   join_type=jt).to_pandas()
    if len(want) == 0:
        # row-level contract: an all-empty pipeline may surface no schema
        assert len(got) == 0
        return
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
