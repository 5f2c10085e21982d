"""Distributed connected components (union-find) via min-label propagation.

Ray Data has no union-find primitive (SURVEY.md §7.4); this implements the
classic iterative min-label propagation entirely with ``groupby`` shuffles —
no driver-side edge materialization:

    label(n) ← min(label(n), min over neighbors m of label(m))

repeated to fixpoint. Each round is two hash shuffles: one groupby(key) to
join labels onto edge endpoints (a tagged union instead of a join — every row
is either a label row or an edge row, grouped by node), one groupby(node) to
take the min over proposed labels. Labels only decrease, so a cheap
deterministic checksum (sum of crc32(node:label)) detects the fixpoint;
rounds are bounded by ``max_rounds`` (component diameter bounds the true
round count).

For star-shaped near-duplicate clusters this converges in 2 rounds. The
representative of each component is its lexicographically smallest node id —
identical to golden.UnionFind's choice, so distributed and sequential
canonicalization agree exactly.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def _arr(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _init_labels(edges):
    def nodes_of(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([_arr(batch["a"]), _arr(batch["b"])])
        u = pc.unique(vals)
        return pa.table({"node": u, "label": u}, schema=_LABEL_SCHEMA)

    cand = edges.map_batches(nodes_of, batch_format="pyarrow")
    return cand.groupby("node").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


def _checksum(labels) -> int:
    def part(batch: pa.Table) -> pa.Table:
        s = 0
        for n, l in zip(batch["node"].to_pylist(), batch["label"].to_pylist()):
            s += zlib.crc32(f"{n}:{l}".encode())
        return pa.table({"c": pa.array([s], type=pa.int64())})

    return int(labels.map_batches(part, batch_format="pyarrow").sum("c"))


def connected_components(edges, max_rounds: int = 16):
    """edges Dataset (a:string, b:string, ...) → labels Dataset (node, label).

    Only nodes that appear in at least one edge are returned (isolated nodes
    are their own components by definition; callers default missing nodes to
    label = node).
    """
    labels = _init_labels(edges).materialize()
    prev = _checksum(labels)

    # symmetric edge view, reused every round
    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = _arr(batch["a"]), _arr(batch["b"])
        return pa.table({
            "key": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        })

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

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

        def propose(group: pa.Table) -> pa.Table:
            labs = [x for x in group["label"].to_pylist() if x is not None]
            if not labs:  # node had no label row (cannot happen after init)
                return pa.table({"node": [], "cand": []},
                                schema=pa.schema([("node", pa.string()),
                                                  ("cand", pa.string())]))
            lab = min(labs)
            key = group["key"][0].as_py()
            nodes = [key]
            cands = [lab]
            for d in group["dst"].to_pylist():
                if d is not None:
                    nodes.append(d)
                    cands.append(lab)
            return pa.table({"node": pa.array(nodes, type=pa.string()),
                             "cand": pa.array(cands, type=pa.string())})

        proposals = lab_rows.union(edge_rows).groupby("key").map_groups(
            propose, batch_format="pyarrow")

        def take_min(group: pa.Table) -> pa.Table:
            return pa.table({
                "node": group["node"].slice(0, 1).combine_chunks(),
                "label": pa.array([pc.min(group["cand"]).as_py()],
                                  type=pa.string()),
            }, schema=_LABEL_SCHEMA)

        labels = proposals.groupby("node").map_groups(
            take_min, batch_format="pyarrow").materialize()
        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
