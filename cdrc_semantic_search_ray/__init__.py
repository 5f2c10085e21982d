"""cdrc_semantic_search_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference repo ``cjber/cdrc-semantic-search`` (see SURVEY.md), re-expressed
Ray-Data-first: transcript ingestion → conversation reassembly → mention
detection → (subj, pred, obj) triple extraction → embedding-based entity
linking → LSH-blocked canonicalization (union-find) → node/edge Parquet
materialization, with lineage manifests and checkpoint/resume.

Everything here is built from public knowledge only: the Ray Data / pyarrow
public APIs and the reference repo's observable behavior.

Layout
------
- ``functions/`` pure deterministic kernels (embedding, hashing, text stats,
  extraction core) shared by the distributed stages and the sequential golden
  oracle.
- ``stages/``   Ray Data stage definitions (stateless ``map_batches`` fns and
  stateful actor-pool classes).
- ``pipelines/`` end-to-end Dataset compositions (kg, dedup, similarity,
  relational, text, multimodal).
- ``sources/``  readers/writers (parquet helpers, partitioned sinks).
- ``state/``    lineage manifest + checkpoint/resume.
- ``fixtures.py`` deterministic synthetic transcript/catalogue generator.
- ``golden.py`` sequential single-process golden extractor (the P/R oracle).

No module in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"

# Cap polars' rayon pool BEFORE any worker's first polars import (this
# module loads when a UDF deserializes). Our only polars use is
# hash_rows over per-block frames — memory-bandwidth-bound, no win from
# intra-frame parallelism — while the default pool is one thread per
# core PER WORKER: 32 workers × 32 threads ≈ 1000 threads, and a
# resource-pressured worker that fails to spawn its pool poisons every
# polars-using UDF scheduled on it (observed once as transient
# UserCodeExceptions in two unrelated queries of a full sweep).
# Respect an explicit caller override.
import os as _os

_os.environ.setdefault("POLARS_MAX_THREADS", "2")
