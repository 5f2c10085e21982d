"""Deterministic synthetic fixture generator (FIXTURES.md F1-F4).

Generates, from ``(seed, n_convs)`` only (no wall clock, no global RNG):

- ``catalogue.parquet``   entity KB: entity_id, name, kind, aliases, vec
  (analogue of the reference's Pinecone index content,
  /root/reference/src/datastore.py:106-123)
- ``lexicon.parquet``     detector surface lexicon: norm → entity_id, kind,
  exact_link flag (typo variants are detectable but NOT exact-linkable —
  they exercise the embedding-cosine linker path)
- ``canon_truth.parquet`` injected near-duplicate entity groups → expected
  union-find representative (min entity_id)
- ``transcripts/*.parquet`` the F1 input table
  (conv_id, turn_idx, role, text, tool, ts), rows SHUFFLED across several
  files so conversation reassembly genuinely requires a shuffle
- ``intended_triples.parquet`` / ``intended_mentions.parquet`` the
  generator's OWN record of what it embedded in the text — an oracle that is
  independent of the extractor implementation (tests/test_golden.py checks
  golden extractor == intended; the distributed pipeline is then checked
  against golden).

Entity frequency is Zipf(s≈1.2) → a few hot entities dominate, exercising
salted LSH blocking (SURVEY.md §7.3).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import vocab
from .functions.embed import embed_texts
from .functions.extract_core import normalize_surface

BASE_TS = datetime(2026, 1, 1, 0, 0, 0)
ZIPF_S = 1.2


# --------------------------------------------------------------------------
# entity catalogue
# --------------------------------------------------------------------------
@dataclass
class Entity:
    entity_id: str
    name: str
    kind: str
    aliases: list[str] = field(default_factory=list)  # exact-linkable (≠ name)
    typos: list[str] = field(default_factory=list)    # detect-only surfaces
    canonical_id: str = ""  # != entity_id for injected near-dups

    def surfaces(self) -> list[str]:
        return [self.name, *self.aliases, *self.typos]


def _person_alias(name: str) -> str:
    # dot-free initial form ("A Almeida") — a dotted "A." would collide with
    # the sentence-split rule; FIRST_NAMES initials are unique so this is
    # unambiguous per last name
    first, last = name.split(" ", 1)
    return f"{first[0]} {last}"


def build_catalogue(seed: int = 42, embed_dim: int = 64) -> list[Entity]:
    """Closed entity catalogue: ~490 base entities + 30 near-duplicates."""
    rng = random.Random(seed * 7919 + 1)
    ents: list[Entity] = []

    def add(name: str, kind: str, aliases: list[str] | None = None):
        ents.append(Entity(f"ent-{len(ents):04d}", name, kind, aliases or []))

    persons = [f"{f} {l}" for f in vocab.FIRST_NAMES for l in vocab.LAST_NAMES]
    rng.shuffle(persons)
    for name in persons[:150]:
        add(name, "person", [_person_alias(name)])

    orgs = [f"{p} {s}" for p in vocab.ORG_PREFIX for s in vocab.ORG_SUFFIX]
    rng.shuffle(orgs)
    for name in orgs[:90]:
        add(name, "org")

    tools = [f"{s}{x}" for s in vocab.TOOL_STEMS for x in vocab.TOOL_SUFFIX]
    rng.shuffle(tools)
    for name in tools[:80]:
        add(name, "tool")
    # hyphenated alias for tools (distinct norm): Fluxkit -> Flux-kit
    for e in ents:
        if e.kind == "tool":
            for stem in vocab.TOOL_STEMS:
                if e.name.startswith(stem) and len(e.name) > len(stem):
                    e.aliases = [f"{stem}-{e.name[len(stem):]}"]
                    break

    datasets = [f"{s} {x}" for s in vocab.DATASET_STEMS for x in vocab.DATASET_SUFFIX]
    rng.shuffle(datasets)
    for name in datasets[:80]:
        add(name, "dataset")

    # places/concepts are ALWAYS suffixed — a bare "Kestrelford" coexisting
    # with "Kestrelford Park" would be structurally indistinguishable from the
    # injected near-duplicates below and break the canon margin.
    places = [f"{s}{x}" for s in vocab.PLACE_STEMS
              for x in [" Park", " Quay", " Cross", " Vale", " Heath"]]
    rng.shuffle(places)
    for name in places[:50]:
        add(name, "place")

    concepts = [f"{s}{x}" for s in vocab.CONCEPT_STEMS
                for x in [" Gap", " Shift", " Trend", " Score", " Divide"]]
    rng.shuffle(concepts)
    for name in concepts[:40]:
        add(name, "concept")

    # injected near-duplicate entities (canon ground truth, FIXTURES.md F4):
    # long-named entities get a sibling with a SHORT suffix, so the hashed
    # embedding is near-parallel (shared char grams) → discoverable by
    # LSH + cosine >= canon_tau, while staying above any non-dup pair.
    dup_suffix = {"org": " Inc", "person": " Jr", "tool": " II",
                  "dataset": " II", "place": " II", "concept": " II"}
    candidates = [e for e in ents if len(e.name) >= 16]
    rng.shuffle(candidates)
    for base in candidates[:30]:
        dup = Entity(
            f"ent-{len(ents):04d}",
            base.name + dup_suffix[base.kind],
            base.kind,
            canonical_id=base.entity_id,
        )
        ents.append(dup)

    for e in ents:
        if not e.canonical_id:
            e.canonical_id = e.entity_id

    # typo variants (detect-only): swap two adjacent inner characters; keep
    # only typos whose hashed-embedding top-1 against the catalogue resolves
    # unambiguously to the right entity (so intended triples stay exact).
    names = [e.name for e in ents]
    mat = embed_texts(names, dim=embed_dim, seed=seed)
    norms_seen = {normalize_surface(s) for e in ents for s in (e.name, *e.aliases)}
    for i, e in enumerate(ents):
        if len(e.name) < 10 or rng.random() > 0.35:
            continue
        pos = rng.randrange(2, len(e.name) - 3)
        chars = list(e.name)
        if chars[pos] in " ." or chars[pos + 1] in " ." or chars[pos] == chars[pos + 1]:
            continue
        chars[pos], chars[pos + 1] = chars[pos + 1], chars[pos]
        typo = "".join(chars)
        tnorm = normalize_surface(typo)
        if tnorm in norms_seen:
            continue
        v = embed_texts([typo], dim=embed_dim, seed=seed)
        sims = (v @ mat.T)[0]
        top = int(np.argmax(sims))
        order = np.argsort(-sims)
        if top == i and sims[top] >= 0.70 and sims[order[1]] <= sims[top] - 0.05:
            e.typos.append(typo)
            norms_seen.add(tnorm)

    # canon-margin invariant: injected dup pairs must sit strictly above
    # canon_tau and every non-dup pair strictly below (checked with EXACT
    # all-pairs cosine so the LSH/union-find stage has a clean target)
    vec = embed_texts([e.name for e in ents], dim=embed_dim, seed=seed)
    sims = vec @ vec.T
    canon_of = {e.entity_id: e.canonical_id for e in ents}
    dup_min, nondup_max = 1.0, 0.0
    for i, a in enumerate(ents):
        for j in range(i + 1, len(ents)):
            s = float(sims[i, j])
            if canon_of[a.entity_id] == canon_of[ents[j].entity_id]:
                dup_min = min(dup_min, s)
            else:
                nondup_max = max(nondup_max, s)
    from .config import DEFAULT_CONFIG
    tau = DEFAULT_CONFIG.canon_tau
    assert dup_min > tau + 0.005 and nondup_max < tau - 0.005, (
        f"canon margin collapsed around tau={tau}: "
        f"dup_min={dup_min:.3f} nondup_max={nondup_max:.3f}")

    # invariants the grammar relies on
    all_norms = [normalize_surface(s) for e in ents for s in e.surfaces()]
    assert len(all_norms) == len(set(all_norms)), "surface norm collision"
    name_tokens = {t for e in ents for t in normalize_surface(e.name).split()}
    assert not (name_tokens & vocab.predicate_words()), "entity/predicate overlap"
    assert not (name_tokens & set(vocab.DISTRACTOR_WORDS)), "entity/distractor overlap"
    return ents


def exact_link_map(ents: list[Entity]) -> dict[str, str]:
    """norm(canonical surface) → entity_id (the linker's sparse fast path)."""
    out: dict[str, str] = {}
    for e in ents:
        for s in (e.name, *e.aliases):
            out[normalize_surface(s)] = e.entity_id
    return out


def detector_lexicon(ents: list[Entity]) -> dict[str, str]:
    """norm(any surface incl. typos) → kind label (the gazetteer)."""
    return {normalize_surface(s): e.kind for e in ents for s in e.surfaces()}


# --------------------------------------------------------------------------
# transcript grammar
# --------------------------------------------------------------------------
def _zipf_weights(n: int) -> list[float]:
    return [1.0 / (r ** ZIPF_S) for r in range(1, n + 1)]


def _cased(rng: random.Random, s: str) -> str:
    p = rng.random()
    if p < 0.60:
        return s
    if p < 0.80:
        return s.lower()
    if p < 0.90:
        return s.upper()
    return s.title()


@dataclass
class _ConvState:
    rows: list[dict]
    mentions: list[dict]
    triples: list[dict]


def _gen_conversation(
    conv_id: str, conv_index: int, seed: int, ents: list[Entity],
    ent_weights: list[float], link_map: dict[str, str],
) -> _ConvState:
    rng = random.Random((seed << 20) ^ (conv_index * 2654435761))
    n_turns = rng.randint(4, 12)
    st = _ConvState([], [], [])
    carried_subj_ent: str | None = None  # entity_id of last triple's subject

    for turn_idx in range(n_turns):
        role = vocab.ROLES[rng.randrange(4)] if rng.random() < 0.2 else \
            ("user" if turn_idx % 2 == 0 else "assistant")
        tool = rng.choice(vocab.TOOL_COLUMN_VALUES) if role in ("assistant", "tool") else ""
        sentences: list[str] = []
        turn_mentions: list[tuple[str, int, int, str]] = []  # rel. to turn text later
        turn_triples: list[tuple[str, str, str]] = []
        offset = 0

        def emit_mention(surface: str, label: str):
            turn_mentions.append((surface, offset, offset + len(surface), label))

        n_sent = rng.randint(1, 3)
        for _ in range(n_sent):
            kind = rng.random()
            if kind < 0.45:
                # plain SVO triple sentence
                subj = rng.choices(ents, weights=ent_weights, k=1)[0]
                obj = rng.choices(ents, weights=ent_weights, k=1)[0]
                pred = rng.choice(vocab.PREDICATES)
                s_sur = _cased(rng, rng.choice(subj.surfaces())
                               if rng.random() < 0.4 else subj.name)
                o_sur = _cased(rng, rng.choice(obj.surfaces())
                               if rng.random() < 0.4 else obj.name)
                sent = f"{s_sur} {pred} {o_sur}."
                emit_mention(s_sur, subj.kind)
                offset += len(s_sur) + 1 + len(pred) + 1
                emit_mention(o_sur, obj.kind)
                offset += len(o_sur) + 2  # "." + joining space
                turn_triples.append((subj.entity_id, pred, obj.entity_id))
                carried_subj_ent = subj.entity_id
            elif kind < 0.55 and carried_subj_ent is not None:
                # coref sentence: subject carried from the conversation so far
                obj = rng.choices(ents, weights=ent_weights, k=1)[0]
                pred = rng.choice(vocab.PREDICATES)
                o_sur = _cased(rng, obj.name)
                head = f"{vocab.COREF_PRONOUN} also {pred} "
                sent = f"{head}{o_sur}."
                offset += len(head)
                emit_mention(o_sur, obj.kind)
                offset += len(o_sur) + 2
                turn_triples.append((carried_subj_ent, pred, obj.entity_id))
            elif kind < 0.65:
                # mention-only sentence (entity, no predicate → no triple)
                ent = rng.choices(ents, weights=ent_weights, k=1)[0]
                sur = _cased(rng, ent.name)
                tail = " looks stable today."
                sent = f"{sur}{tail}"
                emit_mention(sur, ent.kind)
                offset += len(sent) + 1
            else:
                # distractor sentence, no entities, no predicates
                words = rng.choices(vocab.DISTRACTOR_WORDS, k=rng.randint(5, 10))
                sent = (" ".join(words)).capitalize() + "."
                offset += len(sent) + 1
            sentences.append(sent)

        text = " ".join(sentences)
        ts = BASE_TS + timedelta(seconds=conv_index * 3600 + turn_idx * 37)
        st.rows.append(dict(conv_id=conv_id, turn_idx=turn_idx, role=role,
                            text=text, tool=tool, ts=ts))
        for sur, s0, s1, label in turn_mentions:
            assert text[s0:s1] == sur, "fixture offset bookkeeping broke"
            st.mentions.append(dict(conv_id=conv_id, turn_idx=turn_idx,
                                    surface=sur, start=s0, end=s1, label=label))
        for s_ent, pred, o_ent in turn_triples:
            st.triples.append(dict(conv_id=conv_id, turn_idx=turn_idx,
                                   subj=s_ent, pred=pred, obj=o_ent))
    return st


# --------------------------------------------------------------------------
# corpus writer
# --------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def generate_corpus(out_dir: str | Path, n_convs: int, seed: int = 42,
                    embed_dim: int = 64, n_files: int | None = None) -> Path:
    """Write the full fixture corpus under ``out_dir``; returns the path.

    Idempotent: if ``out_dir/_COMPLETE`` exists the corpus is reused (the
    marker records (n_convs, seed, embed_dim) and mismatches regenerate).
    """
    out = Path(out_dir)
    marker = out / "_COMPLETE"
    stamp = f"n_convs={n_convs} seed={seed} embed_dim={embed_dim} v=3"
    if marker.exists() and marker.read_text() == stamp:
        return out
    out.mkdir(parents=True, exist_ok=True)

    ents = build_catalogue(seed, embed_dim)
    link_map = exact_link_map(ents)
    vecs = embed_texts([e.name for e in ents], dim=embed_dim, seed=seed)

    pq.write_table(pa.table({
        "entity_id": [e.entity_id for e in ents],
        "name": [e.name for e in ents],
        "kind": [e.kind for e in ents],
        "aliases": pa.array([[*e.aliases] for e in ents], type=pa.list_(pa.string())),
        "vec": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), embed_dim),
    }), out / "catalogue.parquet")

    lex_rows = [(normalize_surface(s), e.entity_id, e.kind, s_i < 1 + len(e.aliases))
                for e in ents for s_i, s in enumerate(e.surfaces())]
    pq.write_table(pa.table({
        "norm": [r[0] for r in lex_rows],
        "entity_id": [r[1] for r in lex_rows],
        "kind": [r[2] for r in lex_rows],
        "exact_link": [r[3] for r in lex_rows],
    }), out / "lexicon.parquet")

    pq.write_table(pa.table({
        "entity_id": [e.entity_id for e in ents],
        "canonical_id": [e.canonical_id for e in ents],
    }), out / "canon_truth.parquet")

    # entity sampling weights: Zipf over a seed-shuffled entity order
    order = list(range(len(ents)))
    random.Random(seed * 31 + 5).shuffle(order)
    shuffled = [ents[i] for i in order]
    weights = _zipf_weights(len(shuffled))

    rows: list[dict] = []
    mentions: list[dict] = []
    triples: list[dict] = []
    for c in range(n_convs):
        st = _gen_conversation(f"conv-{c:06d}", c, seed, shuffled, weights, link_map)
        rows.extend(st.rows)
        mentions.extend(st.mentions)
        triples.extend(st.triples)

    def _tbl(recs: list[dict], schema: pa.Schema | None = None) -> pa.Table:
        cols = {k: [r[k] for r in recs] for k in recs[0]} if recs else {}
        return pa.table(cols, schema=schema) if schema else pa.table(cols)

    pq.write_table(_tbl(mentions, pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("surface", pa.string()), ("start", pa.int32()), ("end", pa.int32()),
        ("label", pa.string()),
    ])), out / "intended_mentions.parquet")
    pq.write_table(_tbl(triples, pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ])), out / "intended_triples.parquet")

    # transcripts: global row shuffle, split over several files → the
    # reassembly groupby is a real shuffle (FIXTURES.md F1)
    perm = list(range(len(rows)))
    random.Random(seed * 101 + 9).shuffle(perm)
    rows = [rows[i] for i in perm]
    if n_files is None:
        n_files = max(2, min(64, n_convs // 128))
    tdir = out / "transcripts"
    tdir.mkdir(exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for f in range(n_files):
        chunk = rows[f * per:(f + 1) * per]
        if not chunk:
            continue
        pq.write_table(_tbl(chunk, TRANSCRIPT_SCHEMA),
                       tdir / f"part-{f:04d}.parquet")

    marker.write_text(stamp)
    return out
