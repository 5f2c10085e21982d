"""Multimodal columns: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — ``RealDecoder`` raises NotImplementedError and documents the
swap), but the Ray-side plumbing is real and tested: binary Arrow columns,
small batches for wide rows, actor-pool decode stages with load-once setup,
fixed output schemas. Swapping the stub for PIL/ffmpeg changes ONE class.
"""

from __future__ import annotations

import hashlib
import zlib

import pyarrow as pa

PAYLOAD_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("payload", pa.binary()),      # opaque encoded bytes
    ("n_bytes", pa.int64()),
])

FEATURE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("checksum", pa.string()),
    ("width", pa.int32()),         # fake-decoded dimensions (deterministic)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_payloads(docs):
    """documents → fake binary payloads (deterministic: payload = utf-8 bytes
    of the text, media_type from doc_id). Stands in for read_binary_files."""

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads = [t.encode("utf-8") for t in texts]
        kinds = ["image", "audio", "video"]
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "media_type": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }, schema=PAYLOAD_SCHEMA)

    return docs.map_batches(_make, batch_format="pyarrow")


class StubDecoder:
    """Actor-pool decode stage with a DETERMINISTIC FAKE decode.

    Real deployment swaps ``_decode`` for PIL.Image.open / libav frame
    sampling; ``__init__`` is where the codec/model handles load (once per
    actor). Batches must stay SMALL for wide binary rows — set
    ``batch_size`` accordingly at the call site.
    """

    def __init__(self):
        self._ready = True  # codec handle slot (load-once seam)

    @staticmethod
    def _decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
        h = zlib.crc32(payload)
        if media_type == "image":
            return 64 + h % 1857, 64 + (h >> 11) % 1017, 0
        if media_type == "audio":
            return 0, 0, 500 + h % 600_000
        return 320 + h % 1600, 240 + (h >> 7) % 840, 1000 + h % 3_600_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in FEATURE_SCHEMA.names}
        for item_id, mt, payload in zip(batch["item_id"].to_pylist(),
                                        batch["media_type"].to_pylist(),
                                        batch["payload"].to_pylist()):
            w, hgt, dur = self._decode(payload, mt)
            rows["item_id"].append(item_id)
            rows["media_type"].append(mt)
            rows["n_bytes"].append(len(payload))
            rows["checksum"].append(hashlib.md5(payload).hexdigest())
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["duration_ms"].append(dur)
        return pa.table(rows, schema=FEATURE_SCHEMA)


class RealDecoder(StubDecoder):
    """The documented production seam — requires PIL / torchaudio / PyAV."""

    @staticmethod
    def _decode(payload: bytes, media_type: str):
        raise NotImplementedError(
            "real media decode needs PIL/torchaudio/PyAV, which are not in "
            "this container; StubDecoder provides the deterministic stand-in")


def decode_features(payloads, batch_size: int = 64, concurrency: int = 4,
                    decoder=StubDecoder):
    """payloads → per-item features. Small batch_size on purpose: binary
    rows are wide, and batch × concurrency must fit in worker heaps."""
    return payloads.map_batches(decoder, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=(1, concurrency))
