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
