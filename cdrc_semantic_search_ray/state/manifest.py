"""Per-partition lineage manifest: the checkpoint/resume substrate.

Generalizes the reference's change-detection manifest
(``file_list.json`` diff at /root/reference/src/query_api.py:55-70 and its
skip-if-exists download guard :113-115 — SURVEY.md R8) to stage/partition
granularity:

- every completed (stage, partition) appends one JSON line
  {stage, partition_id, rows, checksum, wall_s} — written AFTER the
  partition's output is durably on disk, so a crash can only lose manifest
  rows for work that then safely re-runs (idempotent overwrite);
- resume = anti-join of the input partition ids against the manifest's
  completed set (``pending()``);
- appends are atomic at the filesystem level (single line, O_APPEND), and a
  ``stage_done`` marker row closes a stage.

JSON-lines keeps the manifest human-auditable; a parquet mirror would be
trivial but the manifest is tiny by construction (#stages × #partitions).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class Manifest:
    def __init__(self, run_dir: str | Path):
        self.path = Path(run_dir) / "_manifest.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def _rows(self) -> list[dict]:
        if not self.path.exists():
            return []
        out = []
        for line in self.path.read_text().splitlines():
            line = line.strip()
            if line:
                out.append(json.loads(line))
        return out

    def record(self, stage: str, partition_id: int, rows: int,
               checksum: str = "", wall_s: float = 0.0) -> None:
        entry = {"stage": stage, "partition_id": partition_id, "rows": rows,
                 "checksum": checksum, "wall_s": round(wall_s, 3),
                 "recorded_at": time.time()}
        with self.path.open("a") as f:
            f.write(json.dumps(entry) + "\n")

    def mark_stage_done(self, stage: str) -> None:
        self.record(stage, -1, 0, checksum="__stage_done__")

    def completed(self, stage: str) -> set[int]:
        return {r["partition_id"] for r in self._rows()
                if r["stage"] == stage and r["partition_id"] >= 0}

    def stage_done(self, stage: str) -> bool:
        return any(r["stage"] == stage and r.get("checksum") == "__stage_done__"
                   for r in self._rows())

    def pending(self, stage: str, all_partitions: range | list[int]) -> list[int]:
        """The resume anti-join: input partitions minus completed ones."""
        done = self.completed(stage)
        return [p for p in all_partitions if p not in done]

    def stats(self) -> dict:
        rows = [r for r in self._rows() if r["partition_id"] >= 0]
        by_stage: dict[str, dict] = {}
        for r in rows:
            s = by_stage.setdefault(r["stage"],
                                    {"partitions": 0, "rows": 0, "wall_s": 0.0})
            s["partitions"] += 1
            s["rows"] += r["rows"]
            s["wall_s"] += r["wall_s"]
        return by_stage
