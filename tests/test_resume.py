"""Checkpoint/resume: kill-after-stage-k → rerun skips completed partitions
and produces identical outputs (BASELINE.md resumability target)."""

import shutil

import pyarrow.parquet as pq


def _triples(out_dir):
    t = pq.read_table(str(out_dir / "triples"))
    return set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                   t["subj"].to_pylist(), t["pred"].to_pylist(),
                   t["obj"].to_pylist()))


def test_checkpoint_run_and_resume(ray_session, unit_corpus, tmp_path,
                                   golden_result):
    from cdrc_semantic_search_ray.state.checkpoint import run_kg_checkpointed
    from cdrc_semantic_search_ray.state.manifest import Manifest

    out = tmp_path / "run"
    res1 = run_kg_checkpointed(unit_corpus, out, num_parts=4)
    assert res1["recomputed"]["triples_raw"] == [0, 1, 2, 3]
    full = _triples(out)
    assert full == golden_result["triples"]

    # simulate a crash: lose two resolved partitions + their manifest rows
    man_path = (out / "_manifest.jsonl")
    lines = [l for l in man_path.read_text().splitlines()
             if not ('"stage": "triples"' in l and
                     ('"partition_id": 1' in l or '"partition_id": 2' in l))]
    # also drop the edges stage (downstream of the lost partitions)
    lines = [l for l in lines if '"stage": "edges"' not in l]
    man_path.write_text("\n".join(lines) + "\n")
    shutil.rmtree(out / "triples" / "part_id=1")
    shutil.rmtree(out / "edges")

    res2 = run_kg_checkpointed(unit_corpus, out, num_parts=4)
    # only the lost partitions re-ran; completed ones were skipped
    assert sorted(res2["recomputed"]["triples"]) == [1, 2]
    assert "triples_raw" not in res2["recomputed"]
    assert _triples(out) == full

    man = Manifest(out)
    assert man.pending("triples", range(4)) == []
    assert man.stage_done("edges")


def test_manifest_anti_join(tmp_path):
    from cdrc_semantic_search_ray.state.manifest import Manifest

    m = Manifest(tmp_path)
    m.record("s", 0, 10)
    m.record("s", 2, 5)
    assert m.pending("s", range(4)) == [1, 3]
    assert m.completed("s") == {0, 2}
    assert not m.stage_done("s")
    m.mark_stage_done("s")
    assert m.stage_done("s")
    assert m.stats()["s"]["rows"] == 15


def test_scheme_guard_refuses_foreign_layout(ray_session, unit_corpus,
                                             tmp_path):
    """The partition hash is part of the on-disk layout: resuming a run dir
    written under a different scheme/num_parts must fail fast, not silently
    mix two hash layouts (round-4: _add_part_id vectorization changed the
    hash, so the layout is now versioned in _scheme.json)."""
    import json

    import pytest

    from cdrc_semantic_search_ray.state.checkpoint import (PART_SCHEME,
                                                           run_kg_checkpointed)

    out = tmp_path / "run_guard"
    run_kg_checkpointed(unit_corpus, out, num_parts=2)
    meta = json.loads((out / "_scheme.json").read_text())
    assert meta["part_scheme"] == PART_SCHEME
    assert meta["num_parts"] == 2
    # ADVICE r4: the scheme file must pin the OBSERVED hash behavior, not
    # just the scheme name (polars hash_rows is not cross-version-stable)
    assert len(meta["hash_probe"]) == 5

    # different num_parts → refuse
    with pytest.raises(ValueError, match="partition scheme"):
        run_kg_checkpointed(unit_corpus, out, num_parts=4)

    # drifted hash probe under the SAME scheme name (what a polars upgrade
    # would look like) → refuse
    drifted = dict(meta, hash_probe=["0"] * 5)
    (out / "_scheme.json").write_text(json.dumps(drifted))
    with pytest.raises(ValueError, match="hash_probe"):
        run_kg_checkpointed(unit_corpus, out, num_parts=2)
    (out / "_scheme.json").write_text(json.dumps(meta))

    # pre-probe v2 layout (scheme matches, no probe recorded): upgraded in
    # place, run proceeds
    (out / "_scheme.json").write_text(json.dumps(
        {"part_scheme": PART_SCHEME, "num_parts": 2}))
    run_kg_checkpointed(unit_corpus, out, num_parts=2)
    assert "hash_probe" in json.loads((out / "_scheme.json").read_text())

    # pre-v2 layout (manifest but no scheme marker) → refuse
    (out / "_scheme.json").unlink()
    with pytest.raises(ValueError, match="pre-v2"):
        run_kg_checkpointed(unit_corpus, out, num_parts=2)


def test_checkpoint_shuffled_resolve_gate(ray_session, unit_corpus, tmp_path,
                                          golden_result):
    """resolve_broadcast_limit=0 forces the bucketed-shuffle resolve inside
    the checkpointed run — outputs must be identical to the broadcast path
    (round-2: no unbounded driver state anywhere in the durable flow)."""
    import dataclasses

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG
    from cdrc_semantic_search_ray.state.checkpoint import run_kg_checkpointed

    cfg = dataclasses.replace(DEFAULT_CONFIG, resolve_broadcast_limit=0)
    out = tmp_path / "run_shuffled"
    run_kg_checkpointed(unit_corpus, out, cfg=cfg, num_parts=2)
    assert _triples(out) == golden_result["triples"]
