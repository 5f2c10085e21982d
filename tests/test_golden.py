"""Golden-oracle validation: the sequential extractor must reproduce the
generator's INTENDED mentions/triples exactly (independent derivations —
the generator records what it embedded; the extractor re-derives it from
text). This pins the extraction semantics before any distribution enters."""

import pyarrow.parquet as pq


def _intended_triples_canonical(corpus):
    it = pq.read_table(corpus / "intended_triples.parquet")
    ct = pq.read_table(corpus / "canon_truth.parquet")
    canon = dict(zip(ct["entity_id"].to_pylist(), ct["canonical_id"].to_pylist()))
    return {
        (c, t, canon.get(s, s), p, canon.get(o, o))
        for c, t, s, p, o in zip(*[it[c].to_pylist() for c in
                                   ("conv_id", "turn_idx", "subj", "pred", "obj")])
    }


def test_golden_triples_match_intended(unit_corpus, golden_result):
    intended = _intended_triples_canonical(unit_corpus)
    got = golden_result["triples"]
    assert got == intended
    assert len(got) > 100  # corpus actually contains a workload


def test_golden_mentions_match_intended(unit_corpus, golden_result):
    im = pq.read_table(unit_corpus / "intended_mentions.parquet")
    intended = {
        (c, t, s, a, b)
        for c, t, s, a, b in zip(*[im[c].to_pylist() for c in
                                   ("conv_id", "turn_idx", "surface", "start", "end")])
    }
    got = {(m[0], m[1], m[2], m[4], m[5]) for m in golden_result["mentions"]}
    assert got == intended


def test_golden_canon_matches_truth(unit_corpus, golden_result):
    ct = pq.read_table(unit_corpus / "canon_truth.parquet")
    truth = dict(zip(ct["entity_id"].to_pylist(), ct["canonical_id"].to_pylist()))
    assert golden_result["canon"] == truth
    # and it actually merges something
    assert sum(1 for k, v in truth.items() if k != v) >= 20


def test_mention_matcher_fast_path_matches_regex(unit_corpus):
    """The word-span n-gram scanner must reproduce the reference regex
    alternation (leftmost-longest, word-bounded, case-insensitive) exactly,
    including hyphenated surfaces."""
    import pyarrow.parquet as pq

    from cdrc_semantic_search_ray.functions.extract_core import MentionMatcher

    lex = pq.read_table(unit_corpus / "lexicon.parquet",
                        columns=["norm", "kind"])
    m = MentionMatcher(dict(zip(lex["norm"].to_pylist(),
                                lex["kind"].to_pylist())))
    texts = pq.read_table(unit_corpus / "transcripts",
                          columns=["text"])["text"].to_pylist()
    texts += [
        "",
        "greta  dubois saw nothing.",       # double space must NOT match (regex is literal)
        "the tessera-ml kit beat drift-kits.",  # hyphen + plural suffix
        "G DUBOIS met w ibarra; it helped.",
    ]
    for x in texts:
        assert m.find(x) == m.find_regex(x), repr(x)
