"""Line-oriented text source/sink (SURVEY.md S10 — the reference's actual
log input is raw text files, /root/reference/src/cdrc_logs.py:8-10,23-25).

``read_log_lines`` wraps ``ray.data.read_text`` (streaming, one block per
file group, pushdown-friendly on shared storage); ``write_text_lines`` is
the matching partitioned sink — each task writes its own file named by a
content digest, so re-runs are idempotent and a failed run can resume by
skipping existing parts (same layout discipline as the parquet sinks).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pyarrow as pa


def write_text_lines(ds, out_dir: str | Path, col: str = "text") -> str:
    """Write one line per row of ``col`` into per-task ``part-*.log`` files.

    Embedded newlines are flattened to spaces (a LINE sink). File names are
    content digests — deterministic and idempotent; concurrent tasks never
    collide. Returns the output directory."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        lines = [t.replace("\n", " ").replace("\r", " ")
                 for t in batch[col].to_pylist()]
        data = ("\n".join(lines) + "\n").encode() if lines else b""
        if data:
            name = hashlib.md5(data).hexdigest()[:20]
            path = out / f"part-{name}.log"
            if not path.exists():  # idempotent resume
                path.write_bytes(data)
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    # consume fully (distributed writes happen inside the tasks)
    ds.map_batches(_write, batch_format="pyarrow").sum("n")
    return str(out)


def read_log_lines(paths: str | list[str]):
    """ray.data.read_text over a file/directory → Dataset with a ``text``
    column (one row per line). The real S10 source operator."""
    import ray.data as rd

    return rd.read_text(paths)
