"""Corpus curation: the end-to-end keep/drop pipeline a training-data run
applies to a document table — exact dedup, near-dup clustering with
canonical-document election, and a quality floor, each drop tagged with its
reason.

The reference processes one document at a time and has no corpus-level
curation (SURVEY.md §2 G covers only its per-request dedup-by-name); this
module is part of the added training-data operator set, composed from the
engine's own primitives:

- exact duplicates: content-hash shuffle, keep the minimum doc_id per hash
  group (``stages/dedup.py`` semantics);
- near duplicates: MinHash-LSH candidates -> distributed exact-Jaccard
  verification (``functions/dedup.py``) -> union-find over the verified
  pairs -> canonical id = min doc_id per connected component;
- quality: the replicable composite score in ``functions/text.py``.

Scale notes: the text column never crosses a shuffle — hashing and quality
scoring happen scan-side, so the exact-dup exchange moves (doc_id, hash,
score) only.  The near-dup pair set is the OUTPUT of LSH + verification,
bounded by the near-dup rate (typically ~1 % of docs); while it fits the
``driver_pair_budget`` the union-find runs driver-side over int pairs and
the {doc: canonical} map is broadcast once via ``ray.put``.  Past the
budget the pipeline switches to :func:`cluster_pairs_distributed` — a
min-label-propagation over the pair set (``functions.graph.cc_join``)
whose labels live in a node-keyed Dataset, joined (not broadcast) onto the
flag table — so NO driver structure scales with the pair count.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def cluster_pairs(pairs: pa.Table) -> dict[int, int]:
    """Union-find (path-halving) over (a, b) int pairs -> {doc_id: canonical}
    where canonical = min doc_id of the connected component.  Only docs that
    appear in a pair are keys; everything else is implicitly its own
    canonical.  If the pair set ever outgrew driver memory the same result
    is an iterative min-label-propagation join; at real near-dup rates the
    pairs are orders of magnitude smaller than the corpus.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    a_col = pairs.column("a").to_numpy(zero_copy_only=False)
    b_col = pairs.column("b").to_numpy(zero_copy_only=False)
    seen: set[int] = set()
    for a, b in zip(a_col.tolist(), b_col.tolist()):
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps find() results stable as canonical ids
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def cluster_pairs_distributed(pairs_ds, num_partitions: int | None = None):
    """Distributed equivalent of :func:`cluster_pairs`: ``(a, b)`` pair
    Dataset -> ``(doc_id, canonical)`` Dataset via min-label propagation
    (``functions.graph.cc_join``).  Bit-equal to the union-find map — one
    row per doc that appears in a pair, canonical = min doc_id of its
    component — with no driver structure sized by the pair set."""
    from ..functions.graph import cc_join

    lab = cc_join(pairs_ds, src="a", dst="b", num_partitions=num_partitions)
    return lab.map_batches(
        lambda t: t.rename_columns(["doc_id", "canonical"]),
        batch_format="pyarrow")


def _verified_pairs_ds(docs_ds, threshold: float, num_perm: int = 128,
                       bands: int = 32):
    """MinHash-LSH candidates -> distributed exact-Jaccard verification;
    returns the verified-pair Dataset (a, b, jaccard)."""
    from ..functions.dedup import (minhash_candidate_pairs,
                                   verify_pairs_distributed)

    cand = minhash_candidate_pairs(docs_ds, num_perm=num_perm, bands=bands)
    return verify_pairs_distributed(cand, docs_ds, threshold=threshold)


def _pairs_to_dict(verified) -> dict[int, int]:
    from ..rayops import concat_batches

    pairs = concat_batches(
        verified.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    if pairs.num_rows == 0:
        return {}
    return cluster_pairs(pairs.select(["a", "b"]))


def near_dup_canonical_map(docs_ds, threshold: float = 0.5,
                           num_perm: int = 128, bands: int = 32):
    """MinHash-LSH -> distributed verify -> union-find; returns the
    {doc_id: canonical_doc_id} dict for verified-near-dup members."""
    return _pairs_to_dict(
        _verified_pairs_ds(docs_ds, threshold, num_perm, bands))


class _ClusterAssign:
    """Actor-pool stage: per-doc cluster id + canonical flag from the
    broadcast component map (fetched once per actor)."""

    def __init__(self, canon_ref):
        self.canon = ray.get(canon_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        cluster = (pd.Series(ids).map(self.canon).fillna(pd.Series(ids))
                   .astype("int64").to_numpy())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "cluster_id": pa.array(cluster, pa.int64()),
            "is_canonical": pa.array((cluster == ids).astype(np.int64),
                                     pa.int64()),
        })


def assign_clusters(docs_ds, canon: dict[int, int]):
    """documents -> (doc_id, cluster_id, is_canonical); singletons are their
    own canonical."""
    ref = ray.put(canon)
    return docs_ds.select_columns(["doc_id"]).map_batches(
        _ClusterAssign, fn_constructor_kwargs={"canon_ref": ref},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)


def _hash_quality_batch(batch: pd.DataFrame,
                        extended: bool = False) -> pd.DataFrame:
    """Scan-side prep: content hash + quality score (+ the extended-filter
    signals), text dropped BEFORE any shuffle (only ids/hashes/scores cross
    the exchange)."""
    from ..functions.text import quality_score

    out = pd.DataFrame({
        "doc_id": batch["doc_id"],
        "text_hash": [hashlib.md5(t.encode("utf-8")).hexdigest()
                      for t in batch["text"]],
        "q": [quality_score(t) for t in batch["text"]],
    })
    if extended:
        words = batch["text"].str.split()
        nw = words.str.len().fillna(0).astype("int64").to_numpy()
        ndw = words.apply(lambda ws: len(set(ws))
                          if isinstance(ws, list) else 0).to_numpy()
        out["distinct_ratio"] = np.where(nw > 0, ndw / np.maximum(nw, 1), 1.0)
        n = batch["text"].str.len().astype("int64").to_numpy()
        alpha = batch["text"].str.count(r"[A-Za-z]").astype("int64").to_numpy()
        out["alpha_ratio"] = np.where(n > 0, alpha / np.maximum(n, 1), 0.0)
    return out


def _hash_bucket(batch: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    import zlib

    batch = batch.copy()
    batch["hbucket"] = [zlib.crc32(h.encode()) % num_buckets
                        for h in batch["text_hash"]]
    return batch


def _exact_winners(g: pd.DataFrame) -> pd.DataFrame:
    """Whole coarse bucket at once (per-HASH map_groups would pay the UDF
    dispatch once per distinct document): sort by (hash, doc_id), first row
    per hash wins — one vectorized duplicated() pass."""
    g = g.sort_values(["text_hash", "doc_id"], kind="mergesort")
    g = g.copy()
    g["exact_dup"] = g["text_hash"].duplicated().astype("int64")
    keep_cols = ["doc_id", "q", "exact_dup"]
    for extra in ("distinct_ratio", "alpha_ratio"):
        if extra in g.columns:
            keep_cols.append(extra)
    return g[keep_cols]


def _verdict_frame(batch: pd.DataFrame, near_dup: "np.ndarray",
                   min_quality: float, min_distinct_ratio: float,
                   min_alpha_ratio: float) -> pd.DataFrame:
    """Shared per-doc verdict: drop-reason precedence is
    exact_dup > near_dup (non-canonical member) > low_quality >
    high_repetition > low_alpha."""
    exact_dup = batch["exact_dup"].to_numpy().astype(bool)
    low_q = (batch["q"] < min_quality).to_numpy()
    n = len(batch)
    rep = (batch["distinct_ratio"].to_numpy() < min_distinct_ratio
           if "distinct_ratio" in batch.columns else np.zeros(n, bool))
    sym = (batch["alpha_ratio"].to_numpy() < min_alpha_ratio
           if "alpha_ratio" in batch.columns else np.zeros(n, bool))
    reason = np.where(exact_dup, "exact_dup",
                      np.where(near_dup, "near_dup",
                               np.where(low_q, "low_quality",
                                        np.where(rep, "high_repetition",
                                                 np.where(sym, "low_alpha",
                                                          "")))))
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "keep": (reason == "").astype("int64"),
        "drop_reason": reason,
        "quality": batch["q"],
    })


class _CurationFlags:
    """Broadcast-map path: canonical ids fetched once per actor."""

    def __init__(self, canon_ref, min_quality: float,
                 min_distinct_ratio: float = 0.0,
                 min_alpha_ratio: float = 0.0):
        self.canon = ray.get(canon_ref)
        self.min_quality = min_quality
        self.min_distinct_ratio = min_distinct_ratio
        self.min_alpha_ratio = min_alpha_ratio

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"]
        cluster = ids.map(self.canon).fillna(ids).astype("int64")
        near_dup = (cluster != ids).to_numpy()
        return _verdict_frame(batch, near_dup, self.min_quality,
                              self.min_distinct_ratio, self.min_alpha_ratio)


def _flags_from_join(batch: pd.DataFrame, min_quality: float,
                     min_distinct_ratio: float = 0.0,
                     min_alpha_ratio: float = 0.0) -> pd.DataFrame:
    """Join path: ``canonical`` arrived as a column (left-outer join against
    the distributed label table; null -> own id)."""
    ids = batch["doc_id"]
    canonical = batch["canonical"].fillna(ids).astype("int64")
    near_dup = (canonical != ids).to_numpy()
    return _verdict_frame(batch, near_dup, min_quality,
                          min_distinct_ratio, min_alpha_ratio)


DRIVER_PAIR_BUDGET = 50_000_000  # ~800 MB of int64 pairs on the driver


def _curate_core(docs_ds, min_quality: float, near_dup_threshold: float,
                 extended: bool, min_distinct_ratio: float,
                 min_alpha_ratio: float, driver_pair_budget: int):
    """Shared plan: scan-side hash/quality prep, coarse-bucket exact-dup
    shuffle, then the near-dup verdict via EITHER the broadcast union-find
    map (pair set within ``driver_pair_budget``) or the distributed
    min-label-propagation table joined on (no driver structure sized by the
    pair set)."""
    from ..config import cluster_cpus

    verified = _verified_pairs_ds(docs_ds,
                                  threshold=near_dup_threshold).materialize()
    n_pairs = verified.count()

    nb = max(16, cluster_cpus() * 2)
    kwargs = {"extended": True} if extended else {}
    prepped = docs_ds.map_batches(
        _hash_quality_batch, fn_kwargs=kwargs,
        batch_format="pandas", batch_size=8192).map_batches(
        _hash_bucket, fn_kwargs={"num_buckets": nb}, batch_format="pandas")
    flagged = prepped.groupby("hbucket").map_groups(_exact_winners,
                                                    batch_format="pandas")

    if n_pairs <= driver_pair_budget:
        canon_ref = ray.put(_pairs_to_dict(verified))
        return flagged.map_batches(
            _CurationFlags,
            fn_constructor_kwargs={"canon_ref": canon_ref,
                                   "min_quality": min_quality,
                                   "min_distinct_ratio": min_distinct_ratio,
                                   "min_alpha_ratio": min_alpha_ratio},
            batch_format="pandas", concurrency=(1, 4), num_cpus=1)

    # distributed fallback: labels stay a Dataset, joined onto the flags
    from ..rayops import fit_for_join

    canon_ds = cluster_pairs_distributed(verified)
    flag_fields = [("doc_id", pa.int64()), ("q", pa.float64()),
                   ("exact_dup", pa.int64())]
    if extended:
        flag_fields += [("distinct_ratio", pa.float64()),
                        ("alpha_ratio", pa.float64())]
    nparts = max(2, min(16, cluster_cpus() // 2))
    joined = fit_for_join(flagged, pa.schema(flag_fields)).join(
        fit_for_join(canon_ds, pa.schema([("doc_id", pa.int64()),
                                          ("canonical", pa.int64())])),
        join_type="left_outer", num_partitions=nparts,
        on=("doc_id",), right_on=("doc_id",))
    return joined.map_batches(
        _flags_from_join,
        fn_kwargs={"min_quality": min_quality,
                   "min_distinct_ratio": min_distinct_ratio,
                   "min_alpha_ratio": min_alpha_ratio},
        batch_format="pandas")


def curate_documents(docs_ds, min_quality: float = 30.0,
                     near_dup_threshold: float = 0.5,
                     driver_pair_budget: int = DRIVER_PAIR_BUDGET):
    """documents(doc_id, text) -> (doc_id, keep, drop_reason, quality).

    One content-hash shuffle (ids + scores only); the near-dup canonical
    assignment is a single broadcast while the verified pair set fits
    ``driver_pair_budget``, else a distributed label join (identical
    output — tests pin both paths equal)."""
    return _curate_core(docs_ds, min_quality, near_dup_threshold,
                        extended=False, min_distinct_ratio=0.0,
                        min_alpha_ratio=0.0,
                        driver_pair_budget=driver_pair_budget)


def curate_documents_extended(docs_ds, min_quality: float = 30.0,
                              near_dup_threshold: float = 0.5,
                              min_distinct_ratio: float = 0.2,
                              min_alpha_ratio: float = 0.4,
                              driver_pair_budget: int = DRIVER_PAIR_BUDGET):
    """The Gopher/FineWeb-style extended filter chain: the base curation
    reasons plus high_repetition (distinct-word ratio floor) and low_alpha
    (symbol-soup floor).  Precedence: exact_dup > near_dup > low_quality >
    high_repetition > low_alpha.  Same exchange plan as curate_documents —
    the extra signals are scan-side integers riding the existing shuffle."""
    return _curate_core(docs_ds, min_quality, near_dup_threshold,
                        extended=True, min_distinct_ratio=min_distinct_ratio,
                        min_alpha_ratio=min_alpha_ratio,
                        driver_pair_budget=driver_pair_budget)
