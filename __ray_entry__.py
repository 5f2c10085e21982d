"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ``ray.init``/``ray.shutdown`` — the
driver owns the session. Query implementations live in
``cdrc_semantic_search_ray/pipelines/queries.py``; oracle-less entries are
non-SQL-expressible (KG stages over synthetic transcripts, LSH/minhash
approximations, stubbed multimodal decode) and are correctness-checked by
``python -m pytest tests/ -x -q`` against the sequential golden oracle
instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline at sf0.001 scale.

    Input transcripts follow BASELINE.json's input_hint schema
    (conv_id, turn_idx, role, text, tool, ts) and are synthesized
    deterministically (seed=42) — read → reassemble → extract → link →
    canonicalize → materialize. Returns the graph edge table.
    """
    from cdrc_semantic_search_ray.pipelines.queries import kg_edges

    return kg_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from cdrc_semantic_search_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray results; see float-discipline notes in queries.py)."""
    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
