"""Sequential single-process golden oracle (SURVEY.md §5 item 2).

Runs the SAME extraction/linking/canonicalization semantics as the
distributed pipeline, but as one plain Python loop over conversations — no
Ray, no batching, no shuffles. The distributed pipeline must reproduce this
module's (conv_id, turn_idx, subj, pred, obj) set at P/R >= 0.95
(BASELINE.json:2; exact match expected since both are deterministic).

The extraction core (``functions/extract_core.py``) is shared, so the
golden/distributed comparison isolates the distribution machinery; the
extraction semantics themselves are independently validated against the
generator's intended outputs (tests/test_golden.py).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from .config import DEFAULT_CONFIG, EngineConfig
from .functions.embed import embed_texts
from .functions.extract_core import MentionMatcher, extract_conversation


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic representative: lexicographic min
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def load_corpus(corpus_dir: str | Path) -> dict:
    d = Path(corpus_dir)
    lex = pq.read_table(d / "lexicon.parquet")
    cat = pq.read_table(d / "catalogue.parquet")
    turns = pq.read_table(d / "transcripts", columns=["conv_id", "turn_idx", "text"])
    return {"lexicon": lex, "catalogue": cat, "turns": turns}


def golden_links(norms: list[str], lexicon, catalogue,
                 cfg: EngineConfig = DEFAULT_CONFIG) -> dict[str, str]:
    """norm → entity_id (or "unk:<norm>"), same rule as stages/linker.py:
    exact alias map wins; else hashed-embed cosine top-1 >= link_tau."""
    exact = {n: e for n, e, ok in zip(
        lexicon["norm"].to_pylist(), lexicon["entity_id"].to_pylist(),
        lexicon["exact_link"].to_pylist()) if ok}
    ent_ids = catalogue["entity_id"].to_pylist()
    mat = np.asarray(catalogue["vec"].combine_chunks().flatten()
                     .to_numpy().reshape(len(ent_ids), -1), dtype=np.float32)
    out: dict[str, str] = {}
    pending = [n for n in set(norms) if n not in exact]
    for n in set(norms) & exact.keys():
        out[n] = exact[n]
    if pending:
        q = embed_texts(pending, dim=mat.shape[1], seed=cfg.embed_seed)
        sims = q @ mat.T
        for i, n in enumerate(pending):
            j = int(np.argmax(sims[i]))
            out[n] = ent_ids[j] if sims[i, j] >= cfg.link_tau else f"unk:{n}"
    return out


def golden_canon(catalogue, cfg: EngineConfig = DEFAULT_CONFIG) -> dict[str, str]:
    """entity_id → canonical_id via EXACT all-pairs cosine >= canon_tau and
    union-find with min-id representatives. The distributed pipeline
    approximates the pair generation with LSH blocking; this oracle does the
    O(N^2) exact version (fine for the small catalogue side)."""
    ent_ids = catalogue["entity_id"].to_pylist()
    mat = np.asarray(catalogue["vec"].combine_chunks().flatten()
                     .to_numpy().reshape(len(ent_ids), -1), dtype=np.float32)
    sims = mat @ mat.T
    uf = UnionFind()
    n = len(ent_ids)
    ii, jj = np.where(np.triu(sims, k=1) >= cfg.canon_tau)
    for a, b in zip(ii.tolist(), jj.tolist()):
        uf.union(ent_ids[a], ent_ids[b])
    return {e: uf.find(e) for e in ent_ids}


def run_golden(corpus_dir: str | Path,
               cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Full sequential pipeline. Returns dict with:

    - ``mentions``: [(conv_id, turn_idx, surface, norm, start, end, label)]
    - ``raw_triples``: [(conv_id, turn_idx, subj_norm, pred, obj_norm)]
    - ``links``: norm → entity-or-unk id
    - ``canon``: entity_id → canonical_id
    - ``triples``: set of (conv_id, turn_idx, subj_id, pred, obj_id) — the
      P/R-checked artifact (FIXTURES.md F3)
    """
    c = load_corpus(corpus_dir)
    lex = c["lexicon"]
    matcher = MentionMatcher(dict(zip(lex["norm"].to_pylist(),
                                      lex["kind"].to_pylist())))

    by_conv: dict[str, list[tuple[int, str]]] = defaultdict(list)
    t = c["turns"]
    for conv, idx, text in zip(t["conv_id"].to_pylist(),
                               t["turn_idx"].to_pylist(),
                               t["text"].to_pylist()):
        by_conv[conv].append((idx, text))

    mentions, raw_triples = [], []
    for conv in sorted(by_conv):
        turns = sorted(by_conv[conv])
        ms, ts = extract_conversation(turns, matcher)
        mentions.extend((conv, ti, m.surface, m.norm, m.start, m.end, m.label)
                        for ti, m in ms)
        raw_triples.extend((conv, ti, tr.subj_norm, tr.pred, tr.obj_norm)
                           for ti, tr in ts)

    norms = [r[2] for r in raw_triples] + [r[4] for r in raw_triples]
    links = golden_links(norms, lex, c["catalogue"], cfg)
    canon = golden_canon(c["catalogue"], cfg)

    def resolve(norm: str) -> str:
        e = links[norm]
        return canon.get(e, e)

    triples = {(conv, ti, resolve(s), p, resolve(o))
               for conv, ti, s, p, o in raw_triples}
    return {"mentions": mentions, "raw_triples": raw_triples,
            "links": links, "canon": canon, "triples": triples}
