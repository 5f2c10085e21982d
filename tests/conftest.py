"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_corpus(tmp_path_factory):
    """Deterministic unit-scale fixture corpus (FIXTURES.md scales)."""
    from cdrc_semantic_search_ray.fixtures import generate_corpus

    return generate_corpus(tmp_path_factory.mktemp("corpus") / "unit",
                           n_convs=50, seed=42)


@pytest.fixture(scope="session")
def golden_result(unit_corpus):
    from cdrc_semantic_search_ray.golden import run_golden

    return run_golden(unit_corpus)


@pytest.fixture(scope="session")
def kg_artifacts(ray_session, unit_corpus):
    from cdrc_semantic_search_ray.pipelines.kg import run_kg

    return run_kg(unit_corpus)


# ---------------------------------------------------------------------------
# Shared driver-compare helpers (one definition of the external driver's
# hash contract: sorted columns, sorted repr rows, md5 — round-4 review
# finding: three test modules carried private copies)
# ---------------------------------------------------------------------------
ORACLE_TABLES = ("documents", "embeddings", "orders", "lineitem", "events",
                 "region", "nation", "customer", "supplier", "part")


def driver_value_hash(df) -> str:
    import hashlib

    df = df[sorted(df.columns)]
    rows = sorted(tuple(repr(v) for v in row)
                  for row in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def duckdb_oracle(sql: str, sf_dir: str, tables=ORACLE_TABLES):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()
