"""Distributed PageRank (power iteration) over an edge Dataset.

Scale shape: edges are the big table and NEVER move after the initial
per-src out-degree fold — each iteration is

  1. map_batches over edges: contribution partials
     (dst, rank[src] / outdeg[src]) pre-summed per dst within the block
     (the combiner pattern), with rank/outdeg looked up in a broadcast
     (ray.put) vector keyed by node id;
  2. groupby(dst).sum — a node-sized exchange, |nodes| << |edges|;
  3. driver fold: new_rank = (1-d)/N + d*(contrib + dangling/N).

The rank vector is O(|nodes|): at web scale (~10^8 registered domains,
8 B/rank) the broadcast is ~1 GB per node — viable; past that the swap is
:func:`pagerank_join` / :func:`cc_join` below — rank/degree/label live in
a node-keyed DATASET and every iteration is a hash join against edges, so
NO driver structure scales with |nodes| (a 10^10-node page-level graph
works).  The broadcast variants stay the default under
``JOIN_PATH_NODE_THRESHOLD`` because a broadcast lookup is strictly
cheaper than a shuffle join while the vector fits worker heaps.

``pagerank_reference`` is the dense numpy power iteration with identical
damping/dangling handling; tests pin distributed == reference to 1e-12
and the join path == broadcast path to the same bound.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pagerank_reference(edges: list[tuple[int, int]], n_nodes: int,
                       damping: float = 0.85, n_iter: int = 20) -> np.ndarray:
    out = np.zeros(n_nodes, np.float64)
    for s, _d in edges:
        out[s] += 1
    rank = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(n_iter):
        contrib = np.zeros(n_nodes, np.float64)
        for s, d in edges:
            contrib[d] += rank[s] / out[s]
        dangling = rank[out == 0].sum()
        rank = (1 - damping) / n_nodes + damping * (
            contrib + dangling / n_nodes)
    return rank


def pagerank_distributed(edges_ds, n_nodes: int, damping: float = 0.85,
                         n_iter: int = 20) -> np.ndarray:
    """edges Dataset with int64 ``src``/``dst`` in [0, n_nodes) -> rank
    vector.  Node ids must be pre-densified (a groupby-distinct + driver
    enumeration for the bounded node set)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("src").aggregate([("src", "count")])
        return g.rename_columns(["src", "pn"])

    deg_df = (edges_ds.map_batches(deg_partial, batch_format="pyarrow")
              .groupby("src").aggregate(Sum("pn", alias_name="n"))
              .to_pandas())  # bounded by |nodes|
    out = np.zeros(n_nodes, np.float64)
    out[deg_df["src"].to_numpy()] = deg_df["n"].to_numpy()

    rank = np.full(n_nodes, 1.0 / n_nodes)
    out_ref = _ray.put(out)
    for _ in range(n_iter):
        rank_ref = _ray.put(rank)

        class _Contrib:
            def __init__(self):
                self.rank = _ray.get(rank_ref)
                self.out = _ray.get(out_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                src = t.column("src").to_numpy()
                dst = t.column("dst").to_numpy()
                w = self.rank[src] / self.out[src]
                g = (pa.table({"dst": pa.array(dst, pa.int64()),
                               "w": pa.array(w, pa.float64())})
                     .group_by("dst").aggregate([("w", "sum")]))
                return g.rename_columns(["dst", "pw"])

        cont_df = (edges_ds.map_batches(_Contrib, batch_format="pyarrow",
                                        concurrency=(1, 4))
                   .groupby("dst").aggregate(Sum("pw", alias_name="w"))
                   .to_pandas())  # bounded by |nodes|
        contrib = np.zeros(n_nodes, np.float64)
        contrib[cont_df["dst"].to_numpy()] = cont_df["w"].to_numpy()
        dangling = rank[out == 0].sum()
        rank = (1 - damping) / n_nodes + damping * (
            contrib + dangling / n_nodes)
    return rank


# ---------------------------------------------------------------------------
# connected components: iterative min-label propagation
# ---------------------------------------------------------------------------

def cc_reference(edges: list[tuple[int, int]], n_nodes: int) -> np.ndarray:
    """Union-find reference: component id = min node id in the component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.fromiter((find(i) for i in range(n_nodes)), dtype=np.int64,
                       count=n_nodes)


def connected_components_distributed(edges_ds, n_nodes: int,
                                     max_iter: int = 50) -> np.ndarray:
    """Min-label propagation over an undirected edge Dataset: each round,
    every edge proposes min(label[src], label[dst]) to both endpoints —
    per-block min partials (the combiner pattern), one node-sized
    groupby-min exchange, then a driver fold that also pointer-jumps
    (label[i] = label[label[i]]), which collapses long chains in
    O(log diameter) rounds instead of O(diameter).  Labels broadcast via
    ray.put per round, same scale contract as PageRank's rank vector.
    Converged when a round changes nothing; the result equals union-find's
    min-id components exactly."""
    import ray as _ray
    from ray.data.aggregate import Min

    labels = np.arange(n_nodes, dtype=np.int64)
    for _ in range(max_iter):
        lab_ref = _ray.put(labels)

        class _Propose:
            def __init__(self):
                self.lab = _ray.get(lab_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                src = t.column("src").to_numpy()
                dst = t.column("dst").to_numpy()
                m = np.minimum(self.lab[src], self.lab[dst])
                node = np.concatenate([src, dst])
                prop = np.concatenate([m, m])
                g = (pa.table({"node": pa.array(node, pa.int64()),
                               "p": pa.array(prop, pa.int64())})
                     .group_by("node").aggregate([("p", "min")]))
                return g.rename_columns(["node", "pm"])

        prop_df = (edges_ds.map_batches(_Propose, batch_format="pyarrow",
                                        concurrency=(1, 4))
                   .groupby("node").aggregate(Min("pm", alias_name="m"))
                   .to_pandas())  # bounded by |nodes|
        new = labels.copy()
        nodes = prop_df["node"].to_numpy()
        np.minimum.at(new, nodes, prop_df["m"].to_numpy())
        new = new[new]  # pointer jump
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


# ---------------------------------------------------------------------------
# join-based variants: node state lives in a Dataset, NOT a driver array.
# The scale path past ~10^8 nodes (page-level graphs) — every iteration is
# a hash join of the edge table against the node-keyed state table, so the
# only driver-resident values are scalars (dangling mass, convergence sum).
# ---------------------------------------------------------------------------

JOIN_PATH_NODE_THRESHOLD = 50_000_000  # ~0.5 GB of rank vector per worker


def _graph_parts() -> int:
    from ..config import cluster_cpus
    return max(2, min(16, cluster_cpus() // 2))


def pagerank_join(edges_ds, n_nodes: int, damping: float = 0.85,
                  n_iter: int = 20, num_partitions: int | None = None):
    """Join-based PageRank: returns a ``(node:int64, rank:float64)`` Dataset
    over all nodes in ``[0, n_nodes)``.

    Per iteration: (1) edges ⋈ state on src — contributions rank/outdeg,
    pre-summed per dst inside each block (combiner) before the node-sized
    ``groupby(dst).sum``; (2) dangling mass via a per-block partial-sum →
    scalar aggregate (the ONLY driver value); (3) state ⟕ contrib on node
    → new rank column.  State is materialized per round to keep lineage
    flat.  Same damping/dangling semantics as :func:`pagerank_reference`.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayops import fit_for_join

    nparts = num_partitions or _graph_parts()
    state_schema = pa.schema([("node", pa.int64()), ("outdeg", pa.int64()),
                              ("rank", pa.float64())])
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    edges = fit_for_join(edges_ds.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"),
        edge_schema).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("src").aggregate([("src", "count")])
        return g.rename_columns(["node", "pn"])

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("pn", alias_name="outdeg")))
    r0 = 1.0 / n_nodes

    def init_state(t: pa.Table) -> pa.Table:
        deg_col = t.column("outdeg")
        if deg_col.null_count:
            deg_col = pc.fill_null(deg_col, 0)
        return pa.table({
            "node": t.column("id").cast(pa.int64()),
            "outdeg": deg_col.cast(pa.int64()),
            "rank": pa.array(np.full(t.num_rows, r0), pa.float64())})

    nodes = rd.range(n_nodes)
    state = fit_for_join(
        nodes.join(fit_for_join(deg, pa.schema(
            [("node", pa.int64()), ("outdeg", pa.int64())])),
            join_type="left_outer", num_partitions=nparts,
            on=("id",), right_on=("node",))
        .map_batches(init_state, batch_format="pyarrow"),
        state_schema).materialize()

    def dangling_partial(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("outdeg"), 0)
        s = pc.sum(pc.if_else(mask, t.column("rank"), 0.0)).as_py() or 0.0
        return pa.table({"s": pa.array([s], pa.float64())})

    def contrib_partial(t: pa.Table) -> pa.Table:
        w = pc.divide(t.column("rank"),
                      pc.cast(t.column("outdeg"), pa.float64()))
        g = (pa.table({"dst": t.column("dst"), "w": w})
             .group_by("dst").aggregate([("w", "sum")]))
        return g.rename_columns(["dst", "pw"])

    contrib_schema = pa.schema([("dst", pa.int64()), ("w", pa.float64())])
    for _ in range(n_iter):
        dangling = (state.map_batches(dangling_partial,
                                      batch_format="pyarrow").sum("s")
                    or 0.0)
        contrib = (edges.join(state, join_type="inner",
                              num_partitions=nparts,
                              on=("src",), right_on=("node",))
                   .map_batches(contrib_partial, batch_format="pyarrow")
                   .groupby("dst").aggregate(Sum("pw", alias_name="w")))
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def fold(t: pa.Table, _base=base) -> pa.Table:
            w = pc.fill_null(t.column("w"), 0.0)
            rank = pc.add(pc.multiply(w, damping), _base)
            return pa.table({"node": t.column("node"),
                             "outdeg": t.column("outdeg").cast(pa.int64()),
                             "rank": rank})

        state = fit_for_join(
            state.join(fit_for_join(contrib, contrib_schema),
                       join_type="left_outer", num_partitions=nparts,
                       on=("node",), right_on=("dst",))
            .map_batches(fold, batch_format="pyarrow"),
            state_schema).materialize()
    return state.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")


def cc_join(edges_ds, src: str = "src", dst: str = "dst",
            num_partitions: int | None = None, max_iter: int = 50):
    """Join-based connected components over ARBITRARY (sparse) int64 node
    ids: returns a ``(node:int64, label:int64)`` Dataset where label = min
    node id of the component, for every node that appears in an edge.

    Per round: symmetric edges ⋈ labels on u (neighbor labels), per-block
    min partials, union own labels, one node-sized ``groupby.min``; then a
    pointer-jump SELF-join (label ⋈ node) that collapses chains in
    O(log diameter) rounds.  Labels only decrease, so the scalar label-sum
    is a sound convergence signal (unchanged sum ⇔ fixed point) — the only
    value the driver holds.  Result equals union-find min-id components
    exactly (``cluster_pairs`` / :func:`cc_reference`).
    """
    from ray.data.aggregate import Min

    from ..rayops import fit_for_join

    nparts = num_partitions or _graph_parts()
    lab_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    sym_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def symmetrize(t: pa.Table) -> pa.Table:
        s = t.column(src).cast(pa.int64()).combine_chunks()
        d = t.column(dst).cast(pa.int64()).combine_chunks()
        if isinstance(s, pa.ChunkedArray):
            empty = pa.array([], pa.int64())
            s = s.chunk(0) if s.num_chunks else empty
            d = d.chunk(0) if d.num_chunks else empty
        return pa.table({
            "u": pa.concat_arrays([s, d]),
            "v": pa.concat_arrays([d, s])})

    sym = fit_for_join(edges_ds.map_batches(symmetrize,
                                            batch_format="pyarrow"),
                       sym_schema).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("u"))
        return pa.table({"node": u, "label": u})

    labels = fit_for_join(
        sym.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label")),
        lab_schema).materialize()
    prev_sum = labels.sum("label")

    def propose_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"node": t.column("v"), "p": t.column("label")})
             .group_by("node").aggregate([("p", "min")]))
        return g.rename_columns(["node", "pm"])

    def own_partial(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "pm": t.column("label")})

    def jump(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "label": t.column("j_label")})

    for _ in range(max_iter):
        props = (sym.join(labels, join_type="inner", num_partitions=nparts,
                          on=("u",), right_on=("node",))
                 .map_batches(propose_partial, batch_format="pyarrow")
                 .union(labels.map_batches(own_partial,
                                           batch_format="pyarrow"))
                 .groupby("node").aggregate(Min("pm", alias_name="label")))
        props = fit_for_join(props, lab_schema)
        jtab = fit_for_join(props.map_batches(
            lambda t: t.rename_columns(["j_node", "j_label"]),
            batch_format="pyarrow"),
            pa.schema([("j_node", pa.int64()), ("j_label", pa.int64())]))
        labels = fit_for_join(
            props.join(jtab, join_type="inner", num_partitions=nparts,
                       on=("label",), right_on=("j_node",))
            .map_batches(jump, batch_format="pyarrow"),
            lab_schema).materialize()
        s = labels.sum("label")
        if s == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = s
    return labels
