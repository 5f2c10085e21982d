"""Generation-path analogues (pipelines/genai.py): M11 response splitter,
C4 answer generator, C5 relevancy-evaluation sweep.

Each is oracle-checked end-to-end with the driver's own compare (row
count + columns + order-insensitive value hash vs DuckDB) plus targeted
semantic assertions the hash alone wouldn't explain on failure.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df) -> str:
    from conftest import driver_value_hash

    return driver_value_hash(df)


def _oracle(sql):
    from conftest import duckdb_oracle

    return duckdb_oracle(sql, SF_DIR)


@pytest.mark.parametrize("name", ["q55_response_split",
                                  "q56_generate_answers", "q57_eval_sweep"])
def test_genai_oracle(ray_session, name):
    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL[name])
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_split_marks_malformed_parts_null(ray_session):
    """Parts rendered without the Summary/Relevance markers (the LLM
    skipping the requested structure — streamlit_app.py:40-41 maps them
    to None) must surface as NULL fields, everything else extracted."""
    from cdrc_semantic_search_ray.pipelines.genai import (_MALFORMED_MOD,
                                                          N_PARTS,
                                                          q55_response_split)

    df = q55_response_split(SF_DIR).to_pandas()
    assert set(df["part_idx"]) == set(range(1, N_PARTS + 1))
    bad = (df["doc_id"] + df["part_idx"]) % _MALFORMED_MOD == 0
    assert df.loc[bad, "summary"].isna().all()
    assert df.loc[bad, "relevance_pct"].isna().all()
    assert df.loc[~bad, "summary"].notna().all()
    ok = df.loc[~bad]
    assert (ok["relevance_pct"] == (ok["doc_id"] * ok["part_idx"]) % 100).all()


def test_generator_answer_shape(ray_session):
    """Answers quote the sorted matched terms, capped at ANSWER_TERMS;
    n_matched counts the full intersection."""
    from cdrc_semantic_search_ray.pipelines.genai import (ANSWER_TERMS,
                                                          EVAL_QUERIES,
                                                          q56_generate_answers)

    df = q56_generate_answers(SF_DIR).to_pandas()
    assert set(df["query_id"]) == {qid for qid, _ in EVAL_QUERIES}
    quoted = df["answer"].str.extract(r"matches \[(.*)\]$")[0]
    n_quoted = quoted.map(lambda s: 0 if s == "" else len(s.split(", ")))
    assert (n_quoted == df["n_matched"].clip(upper=ANSWER_TERMS)).all()
    # terms appear sorted
    assert quoted.map(
        lambda s: s.split(", ") == sorted(s.split(", "))).all()


def test_judge_verdict_unit():
    """RelevancyJudge: the pass threshold is ≥ JUDGE_MIN_SHARED distinct
    shared tokens between the query text and the context."""
    from cdrc_semantic_search_ray.pipelines.genai import (JUDGE_MIN_SHARED,
                                                          RelevancyJudge)

    judge = RelevancyJudge({1: {"table", "value", "scan"}})
    batch = pa.table({
        "query_id": pa.array([1, 1, 1], pa.int64()),
        "alpha_pct": pa.array([75, 75, 75], pa.int64()),
        "text": pa.array(["table value row", "table row agg", "x y z"]),
    })
    out = judge(batch).to_pandas()
    assert out["shared_terms"].tolist() == [2, 1, 0]
    assert out["ctx_passing"].tolist() == [
        int(2 >= JUDGE_MIN_SHARED), int(1 >= JUDGE_MIN_SHARED), 0]


def test_eval_sweep_shape(ray_session):
    """One row per (query, alpha); n_passing ≤ n_ctx ≤ k; passing is the
    max over contexts — the RelevancyEvaluator one-verdict-per-query
    contract (reference evaluation.py:69-74)."""
    from cdrc_semantic_search_ray.pipelines.genai import (EVAL_ALPHAS,
                                                          EVAL_K, EVAL_NQ,
                                                          q57_eval_sweep)

    df = q57_eval_sweep(SF_DIR).to_pandas()
    assert len(df) == EVAL_NQ * len(EVAL_ALPHAS)
    assert (df["n_ctx"] <= EVAL_K).all()
    assert (df["n_passing"] <= df["n_ctx"]).all()
    assert ((df["passing"] == 1) == (df["n_passing"] > 0)).all()
