"""Distributed connected components (union-find) via min-label propagation.

Ray Data has no union-find primitive (SURVEY.md §7.4); this implements the
classic iterative min-label propagation entirely with ``sort``-partitioned
shuffles — no driver-side edge materialization:

    label(n) ← min(label(n), min over neighbors m of label(m))

repeated to fixpoint. Each round is two key-partitioned shuffles: one that
co-locates every node's label row with the edges leaving it (a tagged union
instead of a join — every row is either a label row or an edge row, keyed by
node), one that takes the min over proposed labels per node. Within a block
everything is vectorized (arrow local hash-join + group_by min — see
stages/keyblocks.py); each node's OLD label rides along as the tagged self
proposal, so every round counts exactly how many labels changed (labels only
decrease) — fixpoint ⟺ changed == 0, no collidable checksum. Rounds are
bounded by ``max_rounds`` (component diameter bounds the true round count);
exhausting the budget before the fixpoint raises (a silently split
component would break the union-find equivalence guarantee).

For star-shaped near-duplicate clusters this converges in 2 rounds. The
representative of each component is its lexicographically smallest node id —
identical to golden.UnionFind's choice, so distributed and sequential
canonicalization agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyblocks import group_aggregate, map_key_blocks

_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])
_PROP_SCHEMA = pa.schema([("node", pa.string()), ("cand", pa.string()),
                          ("is_self", pa.bool_())])


def _arr(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _init_labels(edges):
    def nodes_of(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([_arr(batch["a"]), _arr(batch["b"])])
        u = pc.unique(vals)
        return pa.table({"node": u, "label": u}, schema=_LABEL_SCHEMA)

    cand = edges.map_batches(nodes_of, batch_format="pyarrow")

    def uniq(block: pa.Table) -> pa.Table:
        keys = block.group_by("node").aggregate([])["node"]
        return pa.table({"node": keys, "label": keys}, schema=_LABEL_SCHEMA)

    return map_key_blocks(cand, ["node"], uniq)


def _collapse_on_driver(edges):
    """Small-edge-set fast path: classic union-find on the driver.

    SURVEY.md §7.4 allows collapsing a small residual graph on one node; we
    apply the same size gate up front — when the candidate-pair table fits
    trivially in driver memory, 10+ Ray jobs of label-propagation rounds are
    pure overhead. Semantics are identical to the distributed path (and to
    golden.UnionFind): component representative = lexicographically smallest
    node id.
    """
    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    seen: set[str] = set()
    for batch in edges.iter_batches(batch_format="pyarrow",
                                    batch_size=65536):
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            seen.add(a)
            seen.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # min-label representative

    # every edge-seen node gets a row (incl. self-rooted ones) — identical
    # row set to the distributed path, so the two are interchangeable
    items = [{"node": n, "label": find(n)} for n in sorted(seen)]
    if not items:  # keep a typed, empty Dataset
        return rd.from_arrow(pa.table({"node": [], "label": []},
                                      schema=_LABEL_SCHEMA))
    return rd.from_arrow(pa.Table.from_pylist(items, schema=_LABEL_SCHEMA))


def connected_components(edges, max_rounds: int = 16,
                         driver_threshold: int = 2_000_000,
                         strict: bool = True):
    """edges Dataset (a:string, b:string, ...) → labels Dataset (node, label).

    Only nodes that appear in at least one edge are returned (isolated nodes
    are their own components by definition; callers default missing nodes to
    label = node).

    Edge sets at or below ``driver_threshold`` rows collapse on the driver
    (same result, none of the per-round shuffle overhead); larger ones run
    the distributed min-label propagation below. Pass ``driver_threshold=0``
    to force the distributed path (the conformance tests do).

    If the round budget is exhausted before the exact fixpoint (changed
    label count == 0), the labels are NOT union-find-equivalent: raises
    RuntimeError when ``strict`` (default), else logs an error and returns
    the non-converged labels.
    """
    if driver_threshold:
        edges = edges.materialize()
        if edges.count() <= driver_threshold:
            return _collapse_on_driver(edges)

    labels = _init_labels(edges).materialize()

    # symmetric edge view, reused every round
    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = _arr(batch["a"]), _arr(batch["b"])
        return pa.table({
            "key": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        })

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    converged = False

    for _ in range(max_rounds):
        # tagged union: label rows (key=node, dst=null) + edge rows (key=src)
        lab_rows = labels.map_batches(
            lambda t: pa.table({
                "key": t["node"].combine_chunks(),
                "dst": pa.nulls(len(t), pa.string()),
                "label": t["label"].combine_chunks(),
            }),
            batch_format="pyarrow")
        edge_rows = sym.map_batches(
            lambda t: pa.table({
                "key": t["key"].combine_chunks(),
                "dst": t["dst"].combine_chunks(),
                "label": pa.nulls(len(t), pa.string()),
            }),
            batch_format="pyarrow")

        def propose(block: pa.Table) -> pa.Table:
            """Block holds, per node key, its (single) label row and every
            outgoing edge. Proposals: (key → label, tagged is_self — the
            node's OLD label) and (dst → label) — a block-local vectorized
            hash join instead of per-group Python."""
            is_lab = pc.is_valid(block["label"])
            labs = block.filter(is_lab).select(["key", "label"])
            edge = block.filter(pc.invert(is_lab)).select(["key", "dst"])
            self_rows = pa.table(
                {"node": labs["key"], "cand": labs["label"],
                 "is_self": pa.array(np.ones(len(labs), dtype=bool))},
                schema=_PROP_SCHEMA)
            if len(edge) == 0:
                return self_rows
            joined = edge.join(labs, keys="key", join_type="inner")
            nbr_rows = pa.table(
                {"node": joined["dst"], "cand": joined["label"],
                 "is_self": pa.array(np.zeros(len(joined), dtype=bool))},
                schema=_PROP_SCHEMA)
            return pa.concat_tables([self_rows, nbr_rows])

        proposals = map_key_blocks(lab_rows.union(edge_rows), ["key"], propose)

        def take_min(block: pa.Table) -> pa.Table:
            """New label = min proposal; changed ⟺ new ≠ the is_self (old)
            proposal — an EXACT per-round change count, not a checksum."""
            new = group_aggregate(block, ["node"], [("cand", "min")],
                                  rename={"cand_min": "label"})
            old = block.filter(block["is_self"].combine_chunks()) \
                       .select(["node", "cand"]) \
                       .rename_columns(["node", "old"])
            j = new.join(old, keys="node", join_type="inner")
            changed = pc.cast(pc.not_equal(j["label"], j["old"]), pa.int64())
            return pa.table({"node": j["node"], "label": j["label"],
                             "changed": changed})

        labels = map_key_blocks(proposals, ["node"], take_min).materialize()
        n_changed = labels.sum("changed") or 0
        labels = labels.select_columns(["node", "label"]).materialize()
        if n_changed == 0:
            converged = True
            break

    if not converged:
        msg = (f"connected_components: round budget ({max_rounds}) exhausted "
               "before fixpoint — a component with diameter > max_rounds "
               "would get split labels; raise max_rounds (cfg."
               "canon_max_rounds)")
        if strict:
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).error(msg)
    return labels
