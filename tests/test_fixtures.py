"""Fixture-generator invariants (SURVEY.md §5, FIXTURES.md)."""

import pyarrow.parquet as pq

from cdrc_semantic_search_ray import vocab
from cdrc_semantic_search_ray.fixtures import (build_catalogue,
                                               detector_lexicon,
                                               exact_link_map,
                                               generate_corpus)
from cdrc_semantic_search_ray.functions.extract_core import normalize_surface


def test_vocab_universes_disjoint():
    ents = build_catalogue(42, 64)
    name_tokens = {t for e in ents for s in e.surfaces()
                   for t in normalize_surface(s).split()}
    assert not name_tokens & vocab.predicate_words()
    assert not name_tokens & set(vocab.DISTRACTOR_WORDS)
    assert not set(vocab.DISTRACTOR_WORDS) & vocab.predicate_words()


def test_catalogue_deterministic():
    a = build_catalogue(42, 64)
    b = build_catalogue(42, 64)
    assert [(e.entity_id, e.name, e.aliases, e.typos) for e in a] == \
        [(e.entity_id, e.name, e.aliases, e.typos) for e in b]


def test_lexicon_and_link_map_consistent():
    ents = build_catalogue(42, 64)
    lex = detector_lexicon(ents)
    link = exact_link_map(ents)
    # every exact-linkable surface is detectable
    assert set(link) <= set(lex)
    # typos are detectable but NOT exact-linkable
    typo_norms = {normalize_surface(t) for e in ents for t in e.typos}
    assert typo_norms and not (typo_norms & set(link))


def test_corpus_layout(unit_corpus):
    tdir = unit_corpus / "transcripts"
    files = sorted(tdir.glob("*.parquet"))
    assert len(files) >= 2, "transcripts must span several files (forces shuffle)"
    t = pq.read_table(tdir)
    assert t.column_names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # rows are NOT grouped by conversation within a file
    first = pq.read_table(files[0], columns=["conv_id"])["conv_id"].to_pylist()
    assert len(set(first)) > len(first) // 4

    # (conv_id, turn_idx) unique and dense per conversation
    pairs = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    assert len(pairs) == len(set(pairs))


def test_corpus_regeneration_identical(tmp_path):
    a = generate_corpus(tmp_path / "a", n_convs=5, seed=7)
    b = generate_corpus(tmp_path / "b", n_convs=5, seed=7)
    ta = pq.read_table(a / "transcripts").sort_by([("conv_id", "ascending"),
                                                  ("turn_idx", "ascending")])
    tb = pq.read_table(b / "transcripts").sort_by([("conv_id", "ascending"),
                                                  ("turn_idx", "ascending")])
    assert ta.equals(tb)
