"""Source/sink operators: text-line roundtrip (S10), binary payload
roundtrip, and the HTML stripper on text that actually contains HTML."""

from __future__ import annotations

import pyarrow as pa


def test_text_lines_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from cdrc_semantic_search_ray.sources import (read_log_lines,
                                                  write_text_lines)

    lines = [f"log line number {i} with payload" for i in range(257)]
    ds = rd.from_arrow(pa.table({"text": pa.array(lines, pa.string())}))
    out = write_text_lines(ds, tmp_path / "logs")
    back = read_log_lines(out).to_pandas()
    assert sorted(back["text"]) == sorted(lines)


def test_payload_files_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from cdrc_semantic_search_ray.sources import (read_payload_files,
                                                  write_payload_files)

    tab = pa.table({
        "doc_id": pa.array(range(9), pa.int64()),
        "text": pa.array([f"payload {i}" for i in range(9)], pa.string()),
    })
    from cdrc_semantic_search_ray.pipelines.multimodal import (HEADER_LEN,
                                                               MAGIC)

    out = write_payload_files(rd.from_arrow(tab), tmp_path / "media")
    got = read_payload_files(out).to_pandas().sort_values("item_id") \
        .reset_index(drop=True)
    assert list(got["item_id"]) == list(range(9))
    assert got["media_type"].tolist() == [
        ("image", "audio", "video")[i % 3] for i in range(9)]
    # payload = 13-byte CDR1 header + the utf-8 body, byte-exact
    assert [p[:4] for p in got["payload"]] == [MAGIC] * 9
    assert [p[HEADER_LEN:] for p in got["payload"]] == [
        f"payload {i}".encode() for i in range(9)]
    assert (got["n_bytes"] == got["payload"].str.len()).all()


def test_header_decode_parses_payload_bytes(ray_session):
    """HeaderDecoder derives width/height/duration by PARSING the payload
    header bytes (round-4: decode is real, not a hash of the blob) — and
    rejects corrupt payloads loudly."""
    import numpy as np
    import pytest
    import ray.data as rd

    from cdrc_semantic_search_ray.pipelines import multimodal as MM

    ids = list(range(12))
    bodies = [f"body {i}".encode() for i in ids]
    payloads = MM.build_payloads(ids, bodies)
    tab = pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "media_type": pa.array([MM.KINDS[i % 3] for i in ids], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MM.PAYLOAD_SCHEMA)
    feats = MM.decode_features(rd.from_arrow(tab)).to_pandas() \
        .sort_values("item_id").reset_index(drop=True)

    ids_np = np.asarray(ids, dtype=np.int64)
    w, h, d = MM.media_dims(ids_np, ids_np % 3)
    assert feats["width"].tolist() == w.astype(int).tolist()
    assert feats["height"].tolist() == h.astype(int).tolist()
    assert feats["duration_ms"].tolist() == d.astype(int).tolist()
    assert (feats["n_bytes"] == [len(p) for p in payloads]).all()
    # checksum = md5 of the WHOLE payload (header + body) — the one column
    # the q29 SQL oracle can't mirror (DuckDB has no md5(BLOB)), so its
    # value is pinned here
    import hashlib

    assert feats["checksum"].tolist() == [
        hashlib.md5(p).hexdigest() for p in payloads]

    # corrupt magic → loud failure
    bad = pa.table({
        "item_id": pa.array([0], pa.int64()),
        "media_type": pa.array(["image"], pa.string()),
        "payload": pa.array([b"XXXX" + payloads[0][4:]], pa.binary()),
        "n_bytes": pa.array([len(payloads[0])], pa.int64()),
    }, schema=MM.PAYLOAD_SCHEMA)
    with pytest.raises(Exception, match="CDR1"):
        MM.decode_features(rd.from_arrow(bad)).materialize()


def test_strip_html_actually_strips(ray_session):
    import ray.data as rd

    from cdrc_semantic_search_ray.pipelines.text import strip_html

    tab = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["<p>Hello <b>world</b></p>",
                          "no markup here"], pa.string()),
    })
    got = strip_html(rd.from_arrow(tab)).to_pandas().sort_values("doc_id")
    assert got["text_clean"].tolist() == ["Hello world", "no markup here"]
