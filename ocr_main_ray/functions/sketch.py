"""HyperLogLog count-distinct sketch (distributed, mergeable).

The reference has no approximate aggregates (its dataplane is
document-at-a-time; see SURVEY.md §2 G) — this is one of the added
training-data-pipeline operators: estimating the distinct count of a
key over a 100-TB table without shuffling every key.  The sketch is the
textbook HyperLogLog (Flajolet et al. 2007) with the standard small-range
linear-counting correction:

- each worker hashes its batch's keys (vectorized splitmix64 finalizer),
  updates a local 2^p register array, and emits only the NONZERO
  ``(register, rho)`` pairs — at most 2^p rows per batch regardless of
  batch size;
- merging is ``groupby(register).max(rho)`` — Ray Data's built-in
  partial/final Max aggregate, an all-to-all of at most 2^p tiny rows;
- the driver folds <= 2^p rows into the estimate.

Memory/network cost is O(2^p) per worker and O(2^p) total shuffle volume,
independent of input size — the property that makes COUNT(DISTINCT) safe
at scale where the exact groupby (q_distinct_sources) would shuffle every
distinct key once.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

HLL_P = 12                 # 4096 registers -> ~1.6 % standard error
HLL_M = 1 << HLL_P
_NBITS = 64 - HLL_P        # bits feeding the rank (leading-zero) count


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants);
    uniform 64-bit hash of int64 keys, no Python loop."""
    z = (x.view(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(keys: np.ndarray) -> pa.Table:
    """One batch -> nonzero (register, rho) pairs (<= 2^p rows)."""
    h = _splitmix64(np.ascontiguousarray(keys, dtype=np.int64))
    reg = (h >> np.uint64(_NBITS)).astype(np.int64)
    w = h & np.uint64((1 << _NBITS) - 1)
    # bit_length via frexp: w < 2^52 is exactly representable in float64,
    # so the returned exponent IS the bit length (no log2 rounding risk)
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, _NBITS + 1, _NBITS + 1 - exp).astype(np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    nz = np.nonzero(regs)[0]
    return pa.table({"reg": pa.array(nz, pa.int64()),
                     "rho": pa.array(regs[nz], pa.int64())})


def hll_estimate(reg_ids: np.ndarray, rhos: np.ndarray) -> float:
    """Fold merged (register, max-rho) rows into the cardinality estimate."""
    regs = np.zeros(HLL_M, dtype=np.float64)
    regs[np.asarray(reg_ids, dtype=np.int64)] = np.asarray(rhos, dtype=np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M / np.sum(np.exp2(-regs))
    zeros = HLL_M - np.count_nonzero(regs)
    if est <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * math.log(HLL_M / zeros)  # linear counting, small range
    return float(est)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable heavy-hitter
# frequency estimation.  Like the HLL above, the distributed shape is
# partial-sketch-per-batch -> additive merge (groupby(slot).sum) -> driver
# fold: shuffle volume is O(CMS_D * CMS_W) per batch regardless of input
# size, and the estimate err is one-sided (never under-counts), bounded by
# eps*N with eps = e/CMS_W at failure prob e^-CMS_D.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1  # mask products back into uint64 range
CMS_D = 4                  # rows (independent hash functions)
CMS_W = 1024               # buckets per row -> eps ~ 2.7e-3


def _string_hash64(words: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of a string object array (pandas siphash
    with its fixed default key — stable across processes and hosts)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(words, dtype=object),
                              categorize=False)


def cms_partial(words: np.ndarray, counts: np.ndarray) -> pa.Table:
    """One batch's pre-counted (word, count) pairs -> nonzero (slot, cnt)
    rows of the local d x w sketch (slot = row * CMS_W + bucket)."""
    base = _string_hash64(words)
    cnts = np.asarray(counts, dtype=np.int64)
    sk = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    for i in range(CMS_D):
        h = _splitmix64((base ^ np.uint64((0xA076_1D64_78BD_642F * (i + 1)) & _M64))
                        .view(np.int64))
        slot = i * CMS_W + (h % np.uint64(CMS_W)).astype(np.int64)
        np.add.at(sk, slot, cnts)
    nz = np.nonzero(sk)[0]
    return pa.table({"slot": pa.array(nz, pa.int64()),
                     "cnt": pa.array(sk[nz], pa.int64())})


def cms_query(slot_ids: np.ndarray, cnts: np.ndarray,
              words: np.ndarray) -> np.ndarray:
    """Fold merged (slot, sum-cnt) rows and point-query the given words:
    estimate = min over the d rows (classic CMS upper bound)."""
    sk = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    sk[np.asarray(slot_ids, dtype=np.int64)] = np.asarray(cnts, dtype=np.int64)
    base = _string_hash64(words)
    est = np.full(len(words), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(CMS_D):
        h = _splitmix64((base ^ np.uint64((0xA076_1D64_78BD_642F * (i + 1)) & _M64))
                        .view(np.int64))
        slot = i * CMS_W + (h % np.uint64(CMS_W)).astype(np.int64)
        est = np.minimum(est, sk[slot])
    return est


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership pre-filter for semi joins.  Built
# once from the (bounded) key side, shipped via ray.put as a bit array of
# m = 16*n bits with k = 8 probes (FP rate ~ 5.7e-4); batches test all keys
# vectorized.  A Bloom PASS is only a candidate — callers must verify
# against the exact key set (also broadcast) so results stay exact; the
# filter's job is to make the verify side cheap by discarding ~99.9 % of
# misses with bit probes instead of binary searches.
# ---------------------------------------------------------------------------

BLOOM_BITS_PER_KEY = 16
BLOOM_K = 8


def bloom_build(keys: np.ndarray) -> np.ndarray:
    """Pack the key set into a uint64 bit array (power-of-two sized)."""
    n = max(int(len(keys)), 1)
    m = 1 << int(np.ceil(np.log2(max(n * BLOOM_BITS_PER_KEY, 64))))
    bits = np.zeros(m // 64, dtype=np.uint64)
    h = _splitmix64(np.ascontiguousarray(keys, dtype=np.int64))
    for i in range(BLOOM_K):
        hi = _splitmix64((h ^ np.uint64((0x9E37_79B9_7F4A_7C15 * (i + 1)) & _M64))
                         .view(np.int64)) % np.uint64(m)
        np.bitwise_or.at(bits, (hi >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (hi & np.uint64(63)))
    return bits


def bloom_test(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe; True = candidate (may be FP)."""
    m = np.uint64(len(bits) * 64)
    h = _splitmix64(np.ascontiguousarray(keys, dtype=np.int64))
    out = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        hi = _splitmix64((h ^ np.uint64((0x9E37_79B9_7F4A_7C15 * (i + 1)) & _M64))
                         .view(np.int64)) % m
        word = bits[(hi >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (hi & np.uint64(63))) & np.uint64(1) != 0
    return out


# ---------------------------------------------------------------------------
# mergeable approximate-quantile sketch (stratified block summaries)
# ---------------------------------------------------------------------------
#
# Exact quantiles via the cents histogram (q_events_value_percentiles) need a
# BOUNDED value domain; this sketch is the unbounded-domain scale path.  Each
# block contributes <= QSK_K (value, weight) rows — the representative order
# statistic of each of k equal strata, with the stratum's EXACT integer count
# as weight — so the merge input is O(k x n_blocks) regardless of input size.
# Per-block rank error <= n_block/(2k); summed over blocks the total rank
# error is <= N/(2k), i.e. a 1/(2k) relative-rank guarantee (~0.2 % at
# k = 256).  Weights are exact, so weighted ranks never drift.

QSK_K = 256


def quantile_partial(values: np.ndarray, k: int = QSK_K) -> pa.Table:
    """One block -> <= k (qv, qw) rows; integer weights sum to len(values)."""
    v = np.sort(np.ascontiguousarray(values, dtype=np.int64))
    n = len(v)
    if n == 0:
        return pa.table({"qv": pa.array([], pa.int64()),
                         "qw": pa.array([], pa.int64())})
    k = min(k, n)
    edges = (np.arange(k + 1, dtype=np.int64) * n) // k
    mids = (edges[:-1] + edges[1:] - 1) // 2
    return pa.table({"qv": pa.array(v[mids], pa.int64()),
                     "qw": pa.array(np.diff(edges), pa.int64())})


def quantile_query(vals: np.ndarray, weights: np.ndarray,
                   qs: list[float]) -> list[int]:
    """Fold merged (value, weight) rows into nearest-rank quantile picks."""
    order = np.argsort(vals, kind="mergesort")
    v, w = vals[order], weights[order]
    cw = np.cumsum(w)
    total = int(cw[-1])
    out = []
    for q in qs:
        rank = min(total, max(1, math.ceil(q * total)))
        out.append(int(v[int(np.searchsorted(cw, rank))]))
    return out
