"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public).

Weight each raw document by how target-like it is under hashed bag-of-
words language models:

    log w(x) = sum_{word in x} [ log p_target(h(word)) - log p_raw(h(word)) ]

with h = crc32 % NBINS (the paper's hashed n-gram trick: the model is a
fixed-size count vector, so "training" is one distributed counting pass
regardless of vocabulary size).

Distributed shape (all single streaming passes, nothing driver-heavy):

1. counts pass: per batch, ONE np.bincount(NBINS) over the batch's hashed
   words for the raw slice and one for the target slice, emitted as two
   fixed-size binary blob rows — the combiner pattern; the driver folds
   n_blocks * 2 blobs (NBINS ints each).
2. smoothing + log-ratio on the driver: add-1 smoothed probabilities,
   log-ratio vector of NBINS float64 — tiny, broadcast via ray.put.
3. scoring pass: per batch, vectorized hash + np.take of the broadcast
   ratio vector, segment-summed per doc with np.add.reduceat.

Determinism: crc32 is process-independent; bincount and reduceat are
exact-integer / fixed-order; the driver folds blob rows sorted by their
bstart key, so float work happens only in step 3's fixed-order per-doc sum.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

DSIR_NBINS = 1024


def _hash_words(words: list[str]) -> np.ndarray:
    return np.fromiter((zlib.crc32(w.encode()) % DSIR_NBINS for w in words),
                       dtype=np.int64, count=len(words))


def dsir_count_batch(b: pd.DataFrame, target_mask: np.ndarray) -> pd.DataFrame:
    """One partial-counts row per (slice) per batch: fixed-size blobs."""
    rows = []
    bstart = int(b["doc_id"].min()) if len(b) else -1
    for name, sel in (("target", target_mask), ("raw", np.ones(len(b), bool))):
        texts = b.loc[sel, "text"]
        words = [w for t in texts for w in t.split(" ")]
        counts = np.bincount(_hash_words(words), minlength=DSIR_NBINS) \
            if words else np.zeros(DSIR_NBINS, dtype=np.int64)
        rows.append({"slice": name, "bstart": bstart,
                     "counts": counts.astype(np.int64).tobytes()})
    return pd.DataFrame(rows)


def fold_counts(partials: pd.DataFrame) -> dict[str, np.ndarray]:
    out = {}
    for name, grp in partials.groupby("slice"):
        acc = np.zeros(DSIR_NBINS, dtype=np.int64)
        for buf in grp.sort_values("bstart")["counts"]:
            acc += np.frombuffer(buf, dtype=np.int64)
        out[name] = acc
    return out


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray) -> np.ndarray:
    """Add-1-smoothed log p_target(bin) - log p_raw(bin), float64 NBINS."""
    pt = (target_counts + 1) / float(target_counts.sum() + DSIR_NBINS)
    pr = (raw_counts + 1) / float(raw_counts.sum() + DSIR_NBINS)
    return np.log(pt) - np.log(pr)


def dsir_score_batch(b: pd.DataFrame, ratio_ref) -> pd.DataFrame:
    import ray

    ratio = ray.get(ratio_ref) if not isinstance(ratio_ref, np.ndarray) \
        else ratio_ref
    words_per_doc = b["text"].str.split(" ")
    lens = words_per_doc.str.len().to_numpy(dtype=np.int64)
    flat = _hash_words([w for ws in words_per_doc for w in ws])
    per_word = ratio[flat] if len(flat) else np.zeros(0)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    logw = np.add.reduceat(per_word, offsets) if len(per_word) \
        else np.zeros(len(b))
    logw = np.where(lens > 0, logw, 0.0)
    return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "log_weight": logw})


def dsir_weights(ds, target_langs=("en",)):
    """-> Dataset of (doc_id, log_weight): DSIR importance weights of every
    doc against the target slice (docs whose lang is in target_langs).

    Two streaming passes over the same pruned (doc_id, lang, text) lineage;
    the model state crossing the cluster is 2 x NBINS ints up and NBINS
    floats down, independent of corpus size."""
    import ray

    langs = set(target_langs)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        return dsir_count_batch(b, b["lang"].isin(langs).to_numpy())

    partials = ds.map_batches(count, batch_format="pandas").to_pandas()
    counts = fold_counts(partials)
    ratio = log_ratio(counts["target"], counts["raw"])
    ref = ray.put(ratio)
    return ds.map_batches(dsir_score_batch, fn_kwargs={"ratio_ref": ref},
                          batch_format="pandas")
