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
