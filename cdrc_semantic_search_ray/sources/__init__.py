"""Non-parquet sources/sinks: line-text logs (S10) and binary payload files
(multimodal ingestion). Parquet/CSV go through ray.data builtins directly."""

from .binary import read_payload_files, write_payload_files  # noqa: F401
from .text import read_log_lines, write_text_lines  # noqa: F401
