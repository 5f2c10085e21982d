"""Round-4 operators: S2 fetch analogue (sources/fetch.py), dictionary
redaction and sequence packing (pipelines/text.py).

Each registry entry is oracle-checked with the driver's own compare; the
fetch stage additionally pins the retry/auth semantics the hash can't
explain on failure.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df) -> str:
    from conftest import driver_value_hash

    return driver_value_hash(df)


def _oracle(sql):
    from conftest import duckdb_oracle

    return duckdb_oracle(sql, SF_DIR)


@pytest.mark.parametrize("name", ["q58_fetch_resources", "q59_redact_terms",
                                  "q60_sequence_packing"])
def test_round4_oracle(ray_session, name):
    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL[name])
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_fetch_retry_and_store(ray_session, tmp_path):
    """The injected transient failure must be retried (n_attempts == 2 for
    every 13th resource, 1 otherwise), the store build must be idempotent,
    and a wholly-missing resource must exhaust retries with a hard error."""
    from cdrc_semantic_search_ray.sources import fetch as F

    store = F.materialize_store(SF_DIR, mod=20)
    marker = Path(store) / ".complete"
    stamp = marker.read_text()
    assert F.materialize_store(SF_DIR, mod=20) == store  # idempotent
    assert marker.read_text() == stamp

    df = F.fetch_resources(F.catalogue(SF_DIR, store, mod=20)).to_pandas()
    flaky = df.resource_id % F.FLAKY_MOD == 0
    assert (df.loc[flaky, "n_attempts"] == 2).all()
    assert (df.loc[~flaky, "n_attempts"] == 1).all()
    assert flaky.any()  # the retry path actually ran

    # non-retryable exhaustion: a URI that never exists fails hard
    actor = F.FetcherActor()
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        actor._get(1, str(tmp_path / "missing.txt"))


def test_fetch_payload_roundtrip(ray_session):
    """keep_payload=True carries the raw bytes; digests must match the
    digest-only path (payloads never silently diverge from their md5)."""
    from cdrc_semantic_search_ray.sources import fetch as F

    store = F.materialize_store(SF_DIR, mod=20)
    df = F.fetch_resources(F.catalogue(SF_DIR, store, mod=20),
                           keep_payload=True).to_pandas()
    assert len(df) > 0
    for _, row in df.head(20).iterrows():
        # NB row["nbytes"], not row.nbytes — the attribute is pandas'
        # Series.nbytes (memory footprint), which shadows the column
        assert hashlib.md5(row["payload"]).hexdigest() == row["payload_md5"]
        assert len(row["payload"]) == row["nbytes"]


def test_sequence_packing_invariants(ray_session):
    """Packing must tile each shard: exclusive prefix within (source,
    doc_id order) == pack_id*budget + seq_offset, monotone per shard."""
    from cdrc_semantic_search_ray.pipelines import relational as R
    from cdrc_semantic_search_ray.pipelines.text import sequence_packing

    budget = 64
    df = sequence_packing(
        R.read_table(SF_DIR, "documents", ["doc_id", "source", "text"]),
        budget=budget).to_pandas().sort_values(["source", "doc_id"])
    for _, g in df.groupby("source"):
        excl = g.n_tokens.cumsum() - g.n_tokens
        assert (g.pack_id * budget + g.seq_offset == excl).all()
        assert g.pack_id.is_monotonic_increasing
        assert (g.seq_offset < budget).all()


@pytest.mark.parametrize("name", ["q61_incremental_dedup",
                                  "q62_stratified_sample"])
def test_round4b_oracle(ray_session, name):
    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL[name])
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_incremental_dedup_drops_planted_dups(ray_session):
    """With real duplicates planted across the old/new split, only the
    non-duplicated new rows survive — and bloom false positives (forced
    by a tiny filter) are RETAINED by the exact verify, never dropped."""
    import pyarrow as pa
    import ray.data as rd

    from cdrc_semantic_search_ray.pipelines.dedup import incremental_dedup

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"old text {i % 40}" for i in range(100)]),
    }))
    # new: ids 100-139 duplicate old texts 0-39; 140-199 are genuinely new
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100, 200), pa.int64()),
        "text": pa.array([f"old text {i - 100}" if i < 140
                          else f"new text {i}" for i in range(100, 200)]),
    }))
    # m_bits=256 over 40 distinct old keys → high FP rate: the verify join
    # must separate true dups from FPs exactly
    got = sorted(incremental_dedup(old, new, m_bits=256, k=2)
                 .to_pandas().doc_id)
    assert got == list(range(140, 200))


def test_build_bloom_no_false_negatives(ray_session):
    """Every old text must hit the merged bloom (bloom membership can
    over- but never under-approximate)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cdrc_semantic_search_ray.pipelines.dedup import (_text_hash2,
                                                          build_bloom)

    texts = [f"doc {i}" for i in range(500)]
    old = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(500), pa.int64()),
        "text": pa.array(texts)})).repartition(7)
    m_bits, k = 1 << 14, 4
    bloom = np.frombuffer(build_bloom(old, m_bits=m_bits, k=k),
                          dtype=np.uint8)
    h0, h1 = _text_hash2(pa.table({"text": pa.array(texts)}))
    for i in range(k):
        idx = (h0 + np.uint64(i) * h1) % np.uint64(m_bits)
        bit = (bloom[(idx >> np.uint64(3)).astype(np.int64)]
               >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        assert bit.all()


def test_stratified_rates(ray_session):
    """Per-language acceptance must track each stratum's threshold (a
    md5-uniformity sanity check, ±4 σ at 100 rows/stratum scale)."""
    from cdrc_semantic_search_ray.pipelines import relational as R
    from cdrc_semantic_search_ray.pipelines.queries import (_Q62_DEFAULT,
                                                            _Q62_RATES,
                                                            q62_stratified_sample)

    base = R.read_table(SF_DIR, "documents",
                        ["doc_id", "lang"]).to_pandas()
    got = q62_stratified_sample(SF_DIR).to_pandas()
    for lang, grp in base.groupby("lang"):
        rate = int(_Q62_RATES.get(lang, _Q62_DEFAULT), 16) / 256
        kept = (got.lang == lang).sum()
        n = len(grp)
        sigma = (n * rate * (1 - rate)) ** 0.5
        assert abs(kept - n * rate) < 4 * sigma + 1, (lang, kept, n, rate)


def test_decontaminate_oracle_and_sources(ray_session):
    from cdrc_semantic_search_ray.pipelines.queries import (_Q63_NPHRASES,
                                                            ORACLE_SQL,
                                                            QUERIES)

    got = QUERIES["q63_decontaminate"](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL["q63_decontaminate"])
    assert len(got) == len(want) > 0
    assert _value_hash(got) == _value_hash(want)
    # every eval phrase must at minimum flag its own source document
    pairs = set(map(tuple, got[["doc_id", "phrase_id"]].values))
    for pid in range(_Q63_NPHRASES):
        assert (pid, pid) in pairs


def test_quantize_oracle(ray_session):
    from cdrc_semantic_search_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = QUERIES["q64_quantize_embeddings"](SF_DIR).to_pandas()
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/embeddings.parquet')")
    want = con.sql(ORACLE_SQL["q64_quantize_embeddings"]).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want)


def test_quantized_topk_recall(ray_session):
    """int8-quantized retrieval must agree with the fp32 exact scan on
    nearly every neighbor (quantization noise may flip distant ties but
    recall@k stays high)."""
    from cdrc_semantic_search_ray.pipelines import relational as R
    from cdrc_semantic_search_ray.pipelines.similarity import (
        topk_bruteforce, topk_quantized)

    embs = R.read_table(SF_DIR, "embeddings", ["vec_id", "embedding"])
    qids = [0, 1, 2, 3, 4]
    k = 5
    exact = topk_bruteforce(embs, qids, k=k).to_pandas()
    quant = topk_quantized(
        R.read_table(SF_DIR, "embeddings", ["vec_id", "embedding"]),
        qids, k=k).to_pandas()
    hits = total = 0
    for q in qids:
        e = set(exact.loc[exact.query_id == q, "neighbor_id"])
        g = set(quant.loc[quant.query_id == q, "neighbor_id"])
        hits += len(e & g)
        total += len(e)
    assert total > 0 and hits / total >= 0.8, (hits, total)


def test_repetition_scores(ray_session):
    """Oracle match plus the semantic invariant the hash can't explain:
    a synthetic all-same-token doc maxes both signals, a all-distinct doc
    zeroes them."""
    import pyarrow as pa
    import ray.data as rd

    from cdrc_semantic_search_ray.pipelines.queries import (ORACLE_SQL,
                                                            QUERIES)
    from cdrc_semantic_search_ray.pipelines.text import repetition_scores

    got = QUERIES["q65_repetition_quality"](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL["q65_repetition_quality"])
    assert len(got) == len(want) > 0
    assert _value_hash(got) == _value_hash(want)

    synth = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["spam spam spam spam", "a b c d"]),
    }))
    df = repetition_scores(synth).to_pandas().set_index("doc_id")
    assert df.loc[0, "top1_share_e6"] == 1_000_000
    # 3 bigrams, 1 distinct → duplicate fraction (3-1)/3
    assert df.loc[0, "dup_bigram_e6"] == 666_667
    assert df.loc[1, "top1_share_e6"] == 250_000
    assert df.loc[1, "dup_bigram_e6"] == 0


def test_pack_sequences_consistency(ray_session):
    """Packed sequences must agree with the assignment (q60): same pack
    membership, token totals, and doc order within each pack's text."""
    from cdrc_semantic_search_ray.pipelines import relational as R
    from cdrc_semantic_search_ray.pipelines.queries import (ORACLE_SQL,
                                                            QUERIES)
    from cdrc_semantic_search_ray.pipelines.text import sequence_packing

    got = QUERIES["q66_pack_sequences"](SF_DIR).to_pandas()
    want = _oracle(ORACLE_SQL["q66_pack_sequences"])
    assert len(got) == len(want) > 0
    assert _value_hash(got) == _value_hash(want)

    assign = sequence_packing(
        R.read_table(SF_DIR, "documents", ["doc_id", "source", "text"]),
        budget=256).to_pandas()
    grp = assign.groupby(["source", "pack_id"]).agg(
        n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
    merged = got.set_index(["source", "pack_id"]).join(
        grp, rsuffix="_a", how="outer")
    assert len(merged) == len(got)
    assert (merged.n_docs == merged.n_docs_a).all()
    assert (merged.n_tokens == merged.n_tokens_a).all()
