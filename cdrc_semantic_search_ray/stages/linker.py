"""Entity linker: replicated catalogue index inside an actor pool.

Ray Data mapping of the reference's index build + top-k ANN retrieval
(/root/reference/src/model.py:63-79 — ``VectorStoreIndex.from_vector_store``
+ ``as_retriever(similarity_top_k, alpha).retrieve``, SURVEY.md R1/R2/P7):

- R1 (index build) happens ONCE per actor in ``__init__``: the catalogue
  Parquet (the small side) is loaded into an exact-alias hash map (the
  reference's "sparse" retrieval half) and a row-normalized numpy matrix
  (the "dense" half).
- R2 (retrieval) is a vectorized matmul top-k per batch of mention norms.

Broadcast-small-side pattern: every actor holds a full replica (catalogue ≪
data), so linking needs NO shuffle. The catalogue can be passed as a parquet
path (each actor reads it — scales to many nodes via shared storage) or as a
``ray.put`` ObjectRef.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.embed import cosine_topk, embed_texts

LINK_SCHEMA = pa.schema([
    ("norm", pa.string()),
    ("entity_id", pa.string()),
    ("score", pa.float32()),
    ("rank", pa.int32()),
    ("method", pa.string()),  # "exact" | "embed" | "none"
])


def load_catalogue_index(catalogue) -> tuple[dict[str, str], list[str], np.ndarray]:
    """→ (exact norm→entity map, entity_ids, row-normalized (N, D) matrix)."""
    import pyarrow.parquet as pq

    from ..functions.extract_core import normalize_surface

    if isinstance(catalogue, str):
        table = pq.read_table(catalogue)
    elif isinstance(catalogue, pa.Table):
        table = catalogue
    else:  # ObjectRef
        import ray

        return load_catalogue_index(ray.get(catalogue))

    ids = table["entity_id"].to_pylist()
    exact: dict[str, str] = {}
    for eid, name, aliases in zip(ids, table["name"].to_pylist(),
                                  table["aliases"].to_pylist()):
        exact[normalize_surface(name)] = eid
        for a in aliases or []:
            exact[normalize_surface(a)] = eid
    vec = table["vec"].combine_chunks()
    mat = np.array(vec.flatten().to_numpy().reshape(len(ids), -1),
                   dtype=np.float32)  # copy: normalize in place below
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    return exact, ids, mat


def _link_table(batch: pa.Table, exact: dict, ids: list, mat: np.ndarray,
                top_k: int, cfg: EngineConfig) -> pa.Table:
    norms = batch["norm"].to_pylist()
    out: dict[str, list] = {n: [] for n in LINK_SCHEMA.names}

    pending: list[str] = []
    for n in norms:
        eid = exact.get(n)
        if eid is not None:
            out["norm"].append(n)
            out["entity_id"].append(eid)
            out["score"].append(1.0)
            out["rank"].append(0)
            out["method"].append("exact")
        else:
            pending.append(n)

    if pending:
        q = embed_texts(pending, dim=cfg.embed_dim, seed=cfg.embed_seed)
        idx, score = cosine_topk(q, mat, top_k)
        for i, n in enumerate(pending):
            linked = False
            for r in range(idx.shape[1]):
                s = float(score[i, r])
                if s < cfg.link_tau:
                    break
                out["norm"].append(n)
                out["entity_id"].append(ids[int(idx[i, r])])
                out["score"].append(s)
                out["rank"].append(r)
                out["method"].append("embed")
                linked = True
            if not linked:
                out["norm"].append(n)
                out["entity_id"].append(f"unk:{n}")
                out["score"].append(0.0)
                out["rank"].append(0)
                out["method"].append("none")
    return pa.table(out, schema=LINK_SCHEMA)


def _file_sig(path: str) -> tuple[int, int]:
    """(mtime_ns, size) content signature — part of every per-worker cache
    key so an in-place rewrite of the catalogue between runs on a warm
    cluster can never silently reuse a stale index."""
    import os

    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


@functools.lru_cache(maxsize=4)
def _cached_index_sig(catalogue_path: str, sig: tuple):
    return load_catalogue_index(catalogue_path)


def _cached_index(catalogue_path: str):
    """Index build once per worker PROCESS (task path; workers are reused),
    keyed by path + file signature."""
    return _cached_index_sig(catalogue_path, _file_sig(catalogue_path))


def link_batch(batch: pa.Table, *, catalogue: str, top_k: int = 1,
               cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Task-path linker: per-worker cached replicated index (R1) + batched
    top-k retrieval (R2). Same semantics as the ``Linker`` actor class."""
    exact, ids, mat = _cached_index(catalogue)
    return _link_table(batch, exact, ids, mat, top_k, cfg)


class Linker:
    """Batch linker over a ``norm`` column → LINK_SCHEMA rows (top-k).

    Actor-pool seam for an EXPENSIVE index (FAISS/HNSW on a big catalogue
    per the north star): index built once per actor in ``__init__``."""

    def __init__(self, catalogue, top_k: int = 1,
                 cfg: EngineConfig = DEFAULT_CONFIG):
        self.exact, self.ids, self.mat = load_catalogue_index(catalogue)
        self.top_k = top_k
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _link_table(batch, self.exact, self.ids, self.mat,
                           self.top_k, self.cfg)


# ---------------------------------------------------------------------------
# hybrid dense+sparse retrieval (round 2) — the reference's actual retrieval
# mode: vector_store_query_mode="hybrid", alpha=0.75
# (/root/reference/config/config.toml:13-15, /root/reference/src/model.py:73-79)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _cached_sparse_sig(catalogue_path: str, sig: tuple):
    """Per-entity token sets (name + aliases, normalized) and an
    entity_id → row-position map — the 'sparse' half of the hybrid index,
    built once per worker alongside the dense matrix."""
    import pyarrow.parquet as pq

    from ..functions.extract_core import normalize_surface

    t = pq.read_table(catalogue_path, columns=["entity_id", "name", "aliases"])
    toks: list[frozenset] = []
    for name, aliases in zip(t["name"].to_pylist(), t["aliases"].to_pylist()):
        s = set(normalize_surface(name).split())
        for a in aliases or []:
            s |= set(normalize_surface(a).split())
        toks.append(frozenset(s))
    pos = {e: i for i, e in enumerate(t["entity_id"].to_pylist())}
    return toks, pos


def _cached_sparse(catalogue_path: str):
    return _cached_sparse_sig(catalogue_path, _file_sig(catalogue_path))


def hybrid_link_batch(batch: pa.Table, *, catalogue: str,
                      alpha: float = 0.75, top_k: int = 3,
                      cfg: EngineConfig = DEFAULT_CONFIG,
                      shortlist: int = 64) -> pa.Table:
    """α-blended dense+sparse linking (SURVEY.md R2 hybrid mode):

        score(norm, e) = α · cosine(embed(norm), vec(e))
                       + (1−α) · Jaccard(tokens(norm), tokens(e))

    Candidates = dense top-``shortlist`` ∪ the exact-alias hit, so the
    sparse side is only evaluated on a bounded set (the scale knob; set
    ``shortlist`` ≥ catalogue size for exact sparse ranking — the golden
    test does). α=1 reduces to the pure dense path, α=0 to sparse-over-
    shortlist. Ties break on entity_id. Emits LINK_SCHEMA with
    method='hybrid'."""
    exact, ids, mat = _cached_index(catalogue)
    toks, pos = _cached_sparse(catalogue)
    norms = batch["norm"].to_pylist()
    out: dict[str, list] = {n: [] for n in LINK_SCHEMA.names}
    if norms:
        q = embed_texts(norms, dim=cfg.embed_dim, seed=cfg.embed_seed)
        m = min(max(shortlist, top_k), len(ids))
        idx, dscore = cosine_topk(q, mat, m)
        for i, n in enumerate(norms):
            ntoks = frozenset(n.split())
            cands = {int(j): float(dscore[i, r])
                     for r, j in enumerate(idx[i])}
            e_hit = exact.get(n)
            if e_hit is not None and pos[e_hit] not in cands:
                j = pos[e_hit]
                cands[j] = float(q[i] @ mat[j])
            scored = []
            for j, dense in cands.items():
                et = toks[j]
                inter = len(ntoks & et)
                union = len(ntoks | et)
                sparse = inter / union if union else 0.0
                scored.append((alpha * dense + (1 - alpha) * sparse, ids[j]))
            scored.sort(key=lambda t: (-t[0], t[1]))
            for r, (s, eid) in enumerate(scored[:top_k]):
                out["norm"].append(n)
                out["entity_id"].append(eid)
                out["score"].append(s)
                out["rank"].append(r)
                out["method"].append("hybrid")
    return pa.table(out, schema=LINK_SCHEMA)


def link_norms_hybrid(norms, catalogue_path: str, alpha: float = 0.75,
                      top_k: int = 3, cfg: EngineConfig = DEFAULT_CONFIG,
                      shortlist: int = 64):
    """Dataset wrapper: hybrid linking as a task map_batches stage with the
    per-worker cached dense+sparse index (same seam as link_batch)."""
    return norms.map_batches(
        hybrid_link_batch,
        fn_kwargs={"catalogue": catalogue_path, "alpha": alpha,
                   "top_k": top_k, "cfg": cfg, "shortlist": shortlist},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
