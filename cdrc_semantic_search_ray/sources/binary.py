"""Binary-file source/sink for multimodal payloads (SURVEY.md binary
ingestion — the reference reads PDF bytes from disk,
/root/reference/src/query_api.py:116-118).

``read_payload_files`` is the real source operator: ``ray.data.
read_binary_files(include_paths=True)`` then a vectorized path → (item_id,
media_type) parse, producing the multimodal PAYLOAD_SCHEMA consumed by
``pipelines/multimodal.decode_features``. ``write_payload_files`` writes the
deterministic fixture layout (``<item_id>.<media_type>``) the source reads
back — idempotent, one file per item.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

from ..pipelines.multimodal import PAYLOAD_SCHEMA, build_payloads

_KINDS = ("image", "audio", "video")


def write_payload_files(docs, out_dir: str | Path,
                        id_col: str = "doc_id", text_col: str = "text") -> str:
    """documents → one payload file per row: ``<id:08d>.<kind>`` holding a
    CDR1 container (13-byte parsed header + utf-8 text bytes as the opaque
    body — see pipelines/multimodal.py). Deterministic fixture; a real
    deployment points read_payload_files at actual media directories."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        import os

        ids = batch[id_col].to_pylist()
        payloads = build_payloads(
            ids, [t.encode("utf-8") for t in batch[text_col].to_pylist()])
        for i, p in zip(ids, payloads):
            path = out / f"{i:08d}.{_KINDS[i % 3]}"
            if not path.exists():  # idempotent resume
                tmp = path.with_name(f".{path.name}.{os.getpid()}.tmp")
                tmp.write_bytes(p)
                os.replace(tmp, path)  # atomic: never a truncated payload
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    docs.map_batches(_write, batch_format="pyarrow").sum("n")
    return str(out)


def read_payload_files(dir_path: str | Path):
    """ray.data.read_binary_files → PAYLOAD_SCHEMA Dataset.

    item_id and media_type are parsed from the file name (vectorized arrow
    string kernels); payload bytes stay an opaque binary column."""
    import pyarrow.compute as pc
    import ray.data as rd

    raw = rd.read_binary_files(str(dir_path), include_paths=True)

    def _parse(batch: pa.Table) -> pa.Table:
        path = batch["path"].combine_chunks().cast(pa.string())
        # anchored to the writer's exact layout (kind ∈ _KINDS, '/' before
        # the stem): a stale atomic-write temp file ('.0042.image.<pid>.tmp')
        # or any foreign file must NOT parse as a phantom payload row
        pat = rf"/(?P<stem>[0-9]+)\.(?P<kind>{'|'.join(_KINDS)})$"
        fname = pc.extract_regex(path, pat)
        ok = pc.is_valid(fname)
        fname = fname.filter(ok)
        payload = batch["bytes"].combine_chunks().filter(ok)
        return pa.table({
            "item_id": pc.struct_field(fname, "stem").cast(pa.int64()),
            "media_type": pc.struct_field(fname, "kind"),
            "payload": payload,
            "n_bytes": pc.binary_length(payload).cast(pa.int64()),
        }, schema=PAYLOAD_SCHEMA)

    return raw.map_batches(_parse, batch_format="pyarrow")
