"""Ground-truth conformance for the approximate dedup family (round-2 item:
q18/q19/q20 previously had no check at all).

Fixture: deterministic corpus with planted exact dups, strong near-dups
(small word mutations ⇒ true shingle-Jaccard ≳ 0.8) and unrelated docs.
Ground truth is brute-force over the SAME sketch kernels the pipelines use
(functions/hashing.py), so every assertion is exact or probability-bounded
with a fixed seed (no flake: everything is deterministic end to end).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cdrc_semantic_search_ray.functions import hashing as H
from cdrc_semantic_search_ray.pipelines import dedup as D

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
          "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
          "data ray arrow batch shuffle block actor parquet vector index "
          "graph entity mention triple edge node corpus token stream").split()


def _corpus() -> tuple[list[int], list[str]]:
    rng = np.random.RandomState(7)
    ids, texts = [], []
    base = []
    for i in range(40):
        words = [_WORDS[j] for j in rng.randint(0, len(_WORDS), size=30)]
        base.append(" ".join(words))
    did = 0
    for i, t in enumerate(base):
        ids.append(did); texts.append(t); did += 1
        if i % 4 == 0:  # exact duplicate
            ids.append(did); texts.append(t); did += 1
        if i % 5 == 0:  # strong near-dup: mutate 2 of 30 words
            w = t.split()
            for k in rng.randint(0, len(w), size=2):
                w[k] = _WORDS[rng.randint(0, len(_WORDS))]
            ids.append(did); texts.append(" ".join(w)); did += 1
    return ids, texts


@pytest.fixture(scope="module")
def dedup_docs(ray_session):
    import ray.data as rd

    ids, texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    return ds, ids, texts


def _true_shingle_jaccard(texts, k=5):
    sets = [set(H.char_shingle_codes(t, k).tolist()) for t in texts]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            out[(i, j)] = H.jaccard(sets[i], sets[j])
    return out


def test_minhash_lsh_precision_and_recall(dedup_docs):
    ds, ids, texts = dedup_docs
    tau = 0.30
    got = D.minhash_lsh_dedup(ds, tau=tau).to_pandas()
    pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
    truth = _true_shingle_jaccard(texts)

    # precision: est-Jaccard has std ~ sqrt(J(1-J)/64) ≈ 0.06 at the
    # threshold — no returned pair may have true Jaccard far below tau
    for a, b in pairs:
        assert truth[(a, b)] >= tau - 0.2, (a, b, truth[(a, b)])

    # recall: every strong pair (true J >= 0.8: exact dups at 1.0, planted
    # mutations) must be recovered — band-match prob >= 1-(1-.8^4)^16 ≈ .9998
    strong = {p for p, j in truth.items() if j >= 0.8}
    assert strong, "fixture must plant strong pairs"
    found = strong & pairs
    assert len(found) >= 0.9 * len(strong), (len(found), len(strong))
    # exact duplicates specifically can NEVER be missed (identical sigs)
    exact = {p for p, j in truth.items() if j == 1.0}
    assert exact <= pairs


def test_simhash_exact_vs_bruteforce(dedup_docs):
    """chunks=4 pigeonhole blocking GUARANTEES recall for hamming <= 3, and
    hamming verification is exact — the pipeline must equal brute force."""
    ds, ids, texts = dedup_docs
    got = D.simhash_dedup(ds, max_hamming=3, chunks=4).to_pandas()
    pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))

    hs = H.simhash64_batch(texts)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if H.hamming64(int(hs[i]), int(hs[j])) <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert pairs == want
    assert want, "fixture must contain close simhash pairs"


def test_ngram_jaccard_precision_exact_and_dup_recall(dedup_docs):
    ds, ids, texts = dedup_docs
    tau = 0.5
    got = D.ngram_jaccard_dedup(ds, n=3, tau=tau).to_pandas()
    gsets = [set(g.tolist())
             for g in H.word_ngram_codes_batch(texts, 3)]

    # precision is EXACT: the verify stage computes true gram Jaccard
    for a, b, j in zip(got["doc_id_a"], got["doc_id_b"], got["jaccard"]):
        true_j = H.jaccard(gsets[a], gsets[b])
        assert abs(true_j - j) < 1e-6
        assert true_j >= tau

    # identical texts share their min gram ⇒ same block ⇒ always found
    pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if texts[i] == texts[j]:
                assert (i, j) in pairs
    assert pairs, "fixture must contain ngram near-dups"


def test_batch_kernels_match_per_doc_reference(dedup_docs):
    """simhash64_batch is bit-identical to the per-doc reference kernel;
    minhash batch signatures equal per-doc signatures on the same codes."""
    _, _, texts = dedup_docs
    hs = H.simhash64_batch(texts)
    for t, h in zip(texts, hs):
        assert int(h) == H.simhash64(t.casefold().split())

    a, b = H.minhash_params(64)
    codes = [H.char_shingle_codes(t, 5) for t in texts]
    sigs = H.minhash_signatures_batch(codes, a, b)
    for i in (0, 1, len(texts) - 1):
        ref = H.minhash_signature(set(codes[i].tolist()), a, b)
        assert (sigs[i] == ref).all()
