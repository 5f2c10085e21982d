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
    out = write_payload_files(rd.from_arrow(tab), tmp_path / "media")
    got = read_payload_files(out).to_pandas().sort_values("item_id") \
        .reset_index(drop=True)
    assert list(got["item_id"]) == list(range(9))
    assert got["media_type"].tolist() == [
        ("image", "audio", "video")[i % 3] for i in range(9)]
    assert got["payload"].tolist() == [f"payload {i}".encode()
                                       for i in range(9)]
    assert (got["n_bytes"] == got["payload"].str.len()).all()


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
