"""Distributed logistic regression (full-batch gradient descent) for
model-based quality filtering — the iterative-optimization family beyond
``similarity.kmeans_fit``.

Shape: the FEATURE blocks are loaded ONCE into a pool of resident
gradient actors (one read of the feature dataset, blocks pinned in
worker heaps for the whole fit); each iteration ships the O(d) weight
vector to every actor and gets back one (d+2)-float partial per block —
grad sums, loss sum, row count, tagged with bstart — and the driver
folds the partials in bstart order so the reduce is run-to-run
DETERMINISTIC (float addition is non-associative; an unordered tree
reduce would wobble in the last ulp).  Vectors and documents never move
after load; an iteration exchanges O(actors * blocks_per_actor * d)
bytes, with NO dataset re-scan (the earlier one-``map_batches``-pass-per-
iteration form re-read the features ``iters`` times and paid a fresh
execution-plan launch each pass — 60 iterations cost ~18 s of pure plan
overhead at sf0.1; the resident pool runs the same 60 rounds in <1 s).

At 100 TB this is the textbook allreduce shape: the resident state is
only the NUMERIC feature matrix (n_rows x (d+1) float64 — ~32 GB per
10^9 docs at d=3, trivially sharded across a cluster's worker heaps,
never the text), O(d) model state broadcast per round.  The
classic use is a FastText/fasttext-style quality classifier trained on
"gold" (e.g. curated reference corpus) vs "raw" labels; here the feature
extraction is pluggable and the tests use deterministic text signals.

Reference analogy: the reference repo scores documents with fixed
thresholds (image_analyzer quality heuristics); this module LEARNS the
cut from labeled rows instead.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable piecewise form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def feature_stats(ds, feature_cols, id_col: str):
    """Distributed per-feature mean/std (population) with the same
    bstart-ordered deterministic fold as the gradient pass: each block
    emits (n, sum-vector, sumsq-vector), the driver folds in id order.
    GD on unstandardized features crawls (the gradient is dominated by
    the bias-correlated direction), so fit pipelines z-score first."""
    cols = list(feature_cols)

    def stats_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bstart": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sbuf": pa.array([], pa.large_binary()),
                             "qbuf": pa.array([], pa.large_binary())})
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False)
             .astype(np.float64) for c in cols])
        bstart = int(batch.column(id_col)
                     .to_numpy(zero_copy_only=False).min())
        return pa.table({
            "bstart": pa.array([bstart], pa.int64()),
            "n": pa.array([len(X)], pa.int64()),
            "sbuf": pa.array([X.sum(axis=0).tobytes()], pa.large_binary()),
            "qbuf": pa.array([(X * X).sum(axis=0).tobytes()],
                             pa.large_binary())})

    parts = (ds.map_batches(stats_partial, batch_format="pyarrow")
             .to_pandas().sort_values("bstart"))
    s = np.zeros(len(cols))
    q = np.zeros(len(cols))
    for sb, qb in zip(parts["sbuf"], parts["qbuf"]):
        s = s + np.frombuffer(sb, np.float64)
        q = q + np.frombuffer(qb, np.float64)
    n = int(parts["n"].sum())
    mu = s / n
    var = q / n - mu * mu
    sd = np.sqrt(np.maximum(var, 0.0))
    sd[sd == 0] = 1.0  # constant features pass through centered
    return mu, sd


@ray.remote(num_cpus=1)
class _GradWorker:
    """Holds a set of feature blocks resident (X with bias column, y,
    bstart per block) and answers gradient rounds.  Per-block arithmetic
    (sigmoid, X.T @ (p - y), sklearn-style clipped log-loss) matches the
    single-process mirror per block, so the bstart-ordered driver fold
    reproduces it bit-for-bit."""

    def __init__(self, block_refs, feature_cols, label_col, id_col):
        self.blocks = []
        for t in ray.get(list(block_refs)):
            if t.num_rows == 0:
                continue
            X = np.column_stack(
                [t.column(c).to_numpy(zero_copy_only=False)
                 .astype(np.float64) for c in feature_cols])
            X = np.column_stack([X, np.ones(len(X))])
            y = (t.column(label_col).to_numpy(zero_copy_only=False)
                 .astype(np.float64))
            bstart = int(t.column(id_col)
                         .to_numpy(zero_copy_only=False).min())
            self.blocks.append((bstart, X, y))

    def grad(self, w: np.ndarray):
        out = []
        eps = 1e-15
        for bstart, X, y in self.blocks:
            p = _sigmoid(X @ w)
            g = X.T @ (p - y)
            pc_ = np.clip(p, eps, 1 - eps)
            loss = float(-(y * np.log(pc_)
                           + (1 - y) * np.log(1 - pc_)).sum())
            out.append((bstart, len(X), g.tobytes(), loss))
        return out


def logreg_fit(ds, feature_cols, label_col: str, id_col: str,
               iters: int = 50, lr: float = 0.5, l2: float = 0.0,
               ) -> tuple[np.ndarray, list[float]]:
    """Fit w (len(feature_cols) + 1, bias last) by full-batch GD.

    Returns (weights, per-iteration mean log-loss).  Deterministic: the
    per-block partials are folded in bstart order, so two runs over the
    same Dataset produce bitwise-identical weights regardless of task
    scheduling or actor placement.  ``id_col`` must be a column whose
    per-block minimum orders the blocks stably (any unique id works).

    The dataset is read exactly once: its blocks are parked in a pool of
    resident gradient actors (block boundaries preserved — one partial
    per input block, same granularity the single-process mirror folds),
    then every iteration is one O(d)-payload round over the pool."""
    d = len(feature_cols) + 1
    w = np.zeros(d)
    history: list[float] = []
    refs = ds.to_arrow_refs()
    if not refs:
        return w, history
    n_actors = max(1, min(len(refs),
                          int(ray.cluster_resources().get("CPU", 8)) - 2))
    workers = [
        _GradWorker.remote(refs[i::n_actors], list(feature_cols),
                           label_col, id_col)
        for i in range(n_actors)]
    try:
        for _ in range(iters):
            rounds = ray.get([a.grad.remote(w) for a in workers])
            rows = [p for part in rounds for p in part]
            if not rows:
                break
            parts = pd.DataFrame(
                rows, columns=["bstart", "n", "gbuf", "loss"]
            ).sort_values("bstart")
            g = np.zeros(d)
            for buf in parts["gbuf"]:
                g = g + np.frombuffer(buf, np.float64)
            n = int(parts["n"].sum())
            if n == 0:
                break
            history.append(float(parts["loss"].sum()) / n)
            w = w - lr * (g / n + l2 * w)
    finally:
        for a in workers:
            ray.kill(a)
    return w, history


def logreg_predict(ds, w: np.ndarray, feature_cols,
                   threshold: float = 0.5):
    """Append (prob:float64, pred:int8) per row — broadcast weights, one
    vectorized pass, no shuffle."""
    ref = ray.put(np.asarray(w, np.float64))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            b = batch.append_column("prob", pa.array([], pa.float64()))
            return b.append_column("pred", pa.array([], pa.int8()))
        ww = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        X = np.column_stack(
            [batch.column(c).to_numpy(zero_copy_only=False)
             .astype(np.float64) for c in feature_cols])
        X = np.column_stack([X, np.ones(len(X))])
        p = _sigmoid(X @ ww)
        b = batch.append_column("prob", pa.array(p, pa.float64()))
        return b.append_column(
            "pred", pa.array((p >= threshold).astype(np.int8), pa.int8()))

    return ds.map_batches(score, batch_format="pyarrow")


def logreg_fit_reference(X: np.ndarray, y: np.ndarray, block_starts,
                         iters: int = 50, lr: float = 0.5,
                         l2: float = 0.0) -> np.ndarray:
    """Single-process mirror folding per-block partials in the same bstart
    order — used by tests to pin the distributed path bit-for-bit."""
    Xb = np.column_stack([X, np.ones(len(X))])
    w = np.zeros(Xb.shape[1])
    blocks = sorted(block_starts)  # rows are id-ordered, so start == bstart
    for _ in range(iters):
        g = np.zeros(len(w))
        for s, e in blocks:
            p = _sigmoid(Xb[s:e] @ w)
            g = g + Xb[s:e].T @ (p - y[s:e])
        w = w - lr * (g / len(Xb) + l2 * w)
    return w
