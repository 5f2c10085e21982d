"""Golden conformance for hybrid α-blended dense+sparse linking (round-2
item #7 — the reference's retrieval mode: alpha=0.75 hybrid,
/root/reference/config/config.toml:13-15, src/model.py:73-79).

Brute-force oracle: score every (norm, entity) pair in pure Python over the
SAME embedder + token sets, for α ∈ {0, 0.75, 1}, and require the pipeline
(run with shortlist = full catalogue, so no candidate pruning) to reproduce
ids, ranks and scores exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdrc_semantic_search_ray.config import DEFAULT_CONFIG as CFG
from cdrc_semantic_search_ray.functions.embed import embed_texts
from cdrc_semantic_search_ray.functions.extract_core import normalize_surface


def _brute_hybrid(norms, catalogue_path, alpha, top_k):
    t = pq.read_table(catalogue_path)
    ids = t["entity_id"].to_pylist()
    toks = []
    for name, aliases in zip(t["name"].to_pylist(), t["aliases"].to_pylist()):
        s = set(normalize_surface(name).split())
        for a in aliases or []:
            s |= set(normalize_surface(a).split())
        toks.append(frozenset(s))
    mat = np.asarray(t["vec"].combine_chunks().flatten().to_numpy()
                     .reshape(len(ids), -1), dtype=np.float32)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = np.divide(mat, nrm, where=nrm > 0)
    q = embed_texts(norms, dim=CFG.embed_dim, seed=CFG.embed_seed)
    out = {}
    for i, n in enumerate(norms):
        ntoks = frozenset(n.split())
        scored = []
        for j, eid in enumerate(ids):
            dense = float(q[i] @ mat[j])
            union = len(ntoks | toks[j])
            sparse = len(ntoks & toks[j]) / union if union else 0.0
            scored.append((alpha * dense + (1 - alpha) * sparse, eid))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[n] = scored[:top_k]
    return out


@pytest.mark.parametrize("alpha", [0.0, 0.75, 1.0])
def test_hybrid_link_matches_bruteforce(ray_session, unit_corpus, alpha):
    import ray.data as rd

    from cdrc_semantic_search_ray.stages.linker import link_norms_hybrid

    catalogue = str(unit_corpus / "catalogue.parquet")
    cat = pq.read_table(catalogue, columns=["entity_id", "name"])
    n_entities = cat.num_rows
    # query norms: some exact names, some mutated, some garbage
    names = [normalize_surface(x) for x in cat["name"].to_pylist()[:5]]
    norms = names + [names[0] + " extra", "completely unrelated junk query"]

    ds = rd.from_arrow(pa.table({"norm": pa.array(norms, pa.string())}))
    got = link_norms_hybrid(ds, catalogue, alpha=alpha, top_k=3,
                            shortlist=n_entities).to_pandas()
    want = _brute_hybrid(norms, catalogue, alpha, top_k=3)

    for n in norms:
        rows = got[got["norm"] == n].sort_values("rank")
        expect = want[n]
        assert list(rows["entity_id"]) == [e for _, e in expect], (alpha, n)
        for s_got, (s_want, _) in zip(rows["score"], expect):
            assert abs(float(s_got) - s_want) < 1e-5
        assert (rows["method"] == "hybrid").all()
