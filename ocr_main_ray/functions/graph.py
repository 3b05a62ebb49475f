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
8 B/rank) the broadcast is ~1 GB per node — viable; past that the
documented swap is a hash-join of the rank table against edges instead of
the broadcast (same plan shape as pipelines/queries._join_parts joins).

``pagerank_reference`` is the dense numpy power iteration with identical
damping/dangling handling; tests pin distributed == reference to 1e-12.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


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
