"""Non-parquet sources/sinks: line-text logs (S10), binary payload files
(multimodal ingestion), and paginated JSON (the S1 catalogue-API shape).
Parquet/CSV go through ray.data builtins directly."""

from .binary import read_payload_files, write_payload_files  # noqa: F401
from .jsonl import read_json_pages, write_json_pages  # noqa: F401
from .text import read_log_lines, write_text_lines  # noqa: F401
