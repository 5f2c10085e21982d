"""Paginated JSON source/sink — the reference's catalogue-API ingestion
shape (S1: a paged JSON API crawled page by page,
/root/reference/src/query_api.py:38 — here the pages land on disk and
``ray.data.read_json`` streams them; swapping the page writer for an HTTP
fetcher is the documented network seam, out of sandbox scope).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow as pa


def write_json_pages(table: pa.Table, out_dir: str | Path,
                     page_size: int = 8) -> str:
    """Materialize a (small, API-response-sized) table as numbered JSONL
    pages — the on-disk stand-in for the paged catalogue API. Atomic per
    page (temp + rename); page numbering is deterministic."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = table.to_pylist()
    for pno, lo in enumerate(range(0, len(rows), page_size)):
        page = rows[lo:lo + page_size]
        path = out / f"page-{pno:05d}.jsonl"
        tmp = path.with_name(f".{path.name}.{os.getpid()}.tmp")
        tmp.write_text("\n".join(json.dumps(r, default=str) for r in page)
                       + "\n")
        os.replace(tmp, path)
    return str(out)


def read_json_pages(dir_path: str | Path):
    """ray.data.read_json over the page directory → Dataset (one block per
    file group; schema inferred from the JSON)."""
    import ray.data as rd

    return rd.read_json(str(dir_path))
