"""Line-oriented text source/sink (SURVEY.md S10 — the reference's actual
log input is raw text files, /root/reference/src/cdrc_logs.py:8-10,23-25).

``read_log_lines`` wraps ``ray.data.read_text`` (streaming, one block per
file group, pushdown-friendly on shared storage); ``write_text_lines`` is
the matching partitioned sink — each task writes its own part file
ATOMICALLY (temp + ``os.replace``, so a task killed mid-write can never
leave a truncated part behind) under a content-digest name, so retried
tasks are idempotent. When the batch carries an id column the digest
includes it, which makes the name unique per LOGICAL batch — two distinct
batches that happen to serialize to identical text can then never collapse
into one file.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import pyarrow as pa


def write_text_lines(ds, out_dir: str | Path, col: str = "text",
                     id_col: str | None = "doc_id") -> str:
    """Write one line per row of ``col`` into per-task ``part-*.log`` files.

    Embedded newlines are flattened to spaces (a LINE sink). Writes are
    atomic (temp file + rename) and skipped when the target already exists
    — a retried task re-produces the identical file name, so resume is
    idempotent. Pass the batch's unique id column via ``id_col`` (included
    in the digest when present) so identical-content batches stay distinct.
    Returns the output directory."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        lines = [t.replace("\n", " ").replace("\r", " ")
                 for t in batch[col].to_pylist()]
        data = ("\n".join(lines) + "\n").encode() if lines else b""
        if data:
            h = hashlib.md5(data)
            if id_col and id_col in batch.column_names:
                for v in batch[id_col].to_pylist():
                    h.update(str(v).encode())
                    h.update(b"\x1e")
            path = out / f"part-{h.hexdigest()[:20]}.log"
            if not path.exists():  # idempotent retry/resume
                tmp = path.with_name(f".{path.name}.{os.getpid()}.tmp")
                tmp.write_bytes(data)
                os.replace(tmp, path)  # atomic: never a truncated part
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    # consume fully (distributed writes happen inside the tasks)
    ds.map_batches(_write, batch_format="pyarrow").sum("n")
    return str(out)


def read_log_lines(paths: str | list[str]):
    """ray.data.read_text over a file/directory → Dataset with a ``text``
    column (one row per line). The real S10 source operator."""
    import ray.data as rd

    return rd.read_text(paths)
