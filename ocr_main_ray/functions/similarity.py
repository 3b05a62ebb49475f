"""Similarity search over embedding columns (list<float>).

- Brute-force cosine top-k: the baseline — row-normalize per batch, numpy
  matmul against the broadcast query matrix (ray.put once, fetched per
  actor), per-batch local top-k, driver-side merge of k*n_blocks candidates.
  No shuffle at all.
- LSH-bucketed variant (the scale path): random-hyperplane signatures
  (Charikar) bucket vectors; queries probe only their own bucket (and
  optionally neighbors), turning the scan into a groupby-key lookup.  At
  10^12 scale the buckets are the partition key; the plane matrix is tiny
  and broadcast.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_rows(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64, copy=False)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def batch_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    return np.stack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


class BruteForceTopK:
    """map_batches actor: holds the normalized query matrix (broadcast)."""

    def __init__(self, queries_ref, k: int = 10):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = normalize_rows(q)          # (Q, D)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"q_idx": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        m = normalize_rows(batch_embeddings(batch))       # (N, D)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = self.q @ m.T                               # (Q, N)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        q_idx, vec_id, cos = [], [], []
        for qi in range(sims.shape[0]):
            for ci in top[qi]:
                q_idx.append(qi)
                vec_id.append(int(ids[ci]))
                cos.append(float(sims[qi, ci]))
        return pa.table({"q_idx": pa.array(q_idx, pa.int32()),
                         "vec_id": pa.array(vec_id, pa.int64()),
                         "cos_sim": pa.array(cos, pa.float64())})


def knn_topk(ds, query_matrix: np.ndarray, k: int = 10, concurrency=(1, 4)):
    """-> pandas (q_idx, vec_id, cos_sim), exact top-k per query.

    Local top-k per batch; the driver merges k*n_blocks candidates — the
    same no-global-sort shape as the relational top-k operator."""
    import ray

    ref = ray.put(np.asarray(query_matrix))
    cand = ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    ).to_pandas()
    out = (cand.sort_values(["q_idx", "cos_sim", "vec_id"],
                            ascending=[True, False, True])
           .groupby("q_idx", as_index=False).head(k).reset_index(drop=True))
    return out


class HyperplaneLSH:
    """Random-hyperplane signatures: sign pattern of x @ planes.T."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    def signatures(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0                    # (N, P)
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)


def lsh_bucket_column(ds, dim: int, n_planes: int = 12, col: str = "embedding"):
    """Append an lsh_bucket column — the partition key for bucketed ANN."""
    lsh = HyperplaneLSH(dim, n_planes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("lsh_bucket", pa.array([], pa.int64()))
        m = batch_embeddings(batch, col)
        sigs = lsh.signatures(m).astype(np.int64)
        return batch.append_column("lsh_bucket", pa.array(sigs, pa.int64()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


class IVFIndex:
    """IVF-flat: k-means coarse quantizer over a training sample; vectors
    bucket to their nearest centroid; queries probe the nprobe nearest
    centroid buckets.  The centroid matrix is tiny and broadcast; the
    bucket id is the partition key at scale (same shape as the LSH
    variant, but data-adaptive).  Deterministic: fixed seed, fixed
    iteration count."""

    def __init__(self, train: np.ndarray, n_lists: int = 16, iters: int = 10,
                 seed: int = 42):
        m = normalize_rows(np.asarray(train))
        rng = np.random.RandomState(seed)
        n_lists = min(n_lists, len(m))
        centroids = m[rng.choice(len(m), n_lists, replace=False)].copy()
        for _ in range(iters):
            assign = (m @ centroids.T).argmax(axis=1)
            for c in range(n_lists):
                sel = m[assign == c]
                if len(sel):
                    centroids[c] = sel.mean(axis=0)
            centroids = normalize_rows(centroids)
        self.centroids = centroids

    def assign(self, m: np.ndarray) -> np.ndarray:
        return (normalize_rows(m) @ self.centroids.T).argmax(axis=1)

    def probe_lists(self, q: np.ndarray, nprobe: int = 4) -> np.ndarray:
        sims = normalize_rows(np.atleast_2d(q)) @ self.centroids.T
        return np.argsort(-sims, axis=1)[:, :nprobe]


def ivf_bucket_column(ds, index: IVFIndex, col: str = "embedding"):
    """Append an ivf_list column — the IVF partition key."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("ivf_list", pa.array([], pa.int32()))
        m = batch_embeddings(batch, col)
        return batch.append_column(
            "ivf_list", pa.array(index.assign(m).astype(np.int32), pa.int32()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def ivf_knn(ds, index: IVFIndex, query: np.ndarray, k: int = 10,
            nprobe: int = 4):
    """Approximate top-k: scan only the nprobe probed IVF lists.

    Returns (pandas result, scanned_fraction) so callers can report the
    scan saving; recall vs brute force rises with nprobe."""
    lists = set(int(x) for x in index.probe_lists(query, nprobe)[0])
    bucketed = ivf_bucket_column(ds, index)
    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("ivf_list"),
                                    value_set=pa.array(sorted(lists), pa.int32()))),
        batch_format="pyarrow",
    ).materialize()  # count + scan would otherwise re-run the lineage twice
    total = ds.count()
    scanned = cand.count()
    out = knn_topk(cand, np.atleast_2d(query), k=k)
    return out, scanned / max(1, total)


def embedding_near_dup_pairs(ds, threshold: float = 0.9, block: int = 4096):
    """All pairs (a < b) with cosine >= threshold — brute force blockwise
    matmul (fine up to ~10^5 rows; beyond that, run within lsh buckets)."""
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=block, batch_format="pyarrow")]
    )
    m = normalize_rows(batch_embeddings(tbl))
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    out_a, out_b, out_s = [], [], []
    for i0 in range(0, len(m), block):
        sims = m[i0 : i0 + block] @ m.T
        ai, bi = np.nonzero(sims >= threshold)
        for a, b in zip(ai, bi):
            ga = i0 + a
            if ga < b:
                out_a.append(int(ids[ga])); out_b.append(int(ids[b]))
                out_s.append(float(sims[a, b]))
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "cos_sim": pa.array(out_s, pa.float64())})
