"""Oracle-checked query pack: one entry per operator family of SURVEY.md §2.

Every Ray implementation here is deliberately scale-shaped:

- reads prune columns at the source (``read_parquet(columns=...)``) and push
  row filters into the scan;
- aggregations pre-combine inside ``map_batches`` (one partial row per key
  per batch) before the small shuffled ``groupby`` — the partial/combiner
  pattern;
- small-side joins broadcast the dimension table instead of shuffling;
- floating-point outputs are constructed hash-stably (integer cents, or a
  single division of exact integer sums), so the DuckDB oracle matches
  bit-for-bit.

Column names match the oracle SQL exactly (the driver hash-compares by
sorted column name).
"""
from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pds

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _join_parts(sf_dir: str, table: str, rows_per_part: int = 1_500_000) -> int:
    """AQE-style data-aware hash-join partition count: ceil(rows of the
    larger input table / rows_per_part), clamped to [2, cluster_cpus()].
    Each join partition is a hash-shuffle aggregator actor holding a CPU
    slot — at small inputs fewer actors start faster (measured 10.6 -> 7.5 s
    on the sf0.1 5-table join), while at 100-TB inputs the count grows with
    the data up to the cluster cap.  Row counts come from parquet metadata
    (free — no scan)."""
    import pyarrow.parquet as pq

    from ..config import cluster_cpus

    rows = pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
    need = -(-rows // rows_per_part)
    return int(max(2, min(max(2, cluster_cpus()), need)))


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# G1/G2/G3 — global aggregates
# ---------------------------------------------------------------------------

def q_doc_count(sf_dir: str):
    n = _docs(sf_dir, ["doc_id"]).count()
    return pa.table({"n": pa.array([n], pa.int64())})


def q_doc_chars_sum(sf_dir: str):
    s = _docs(sf_dir, ["n_chars"]).sum("n_chars")
    return pa.table({"total_chars": pa.array([s], pa.int64())})


def q_doc_chars_avg(sf_dir: str):
    ds = _docs(sf_dir, ["n_chars"])
    # exact ints -> single double division (bit-identical to the oracle)
    s, n = ds.sum("n_chars"), ds.count()
    return pa.table({"avg_chars": pa.array([s / n], pa.float64())})


# ---------------------------------------------------------------------------
# B11 — summary aggregate by group (count / sum / mean)
# ---------------------------------------------------------------------------

def _lang_partial(batch: pa.Table) -> pa.Table:
    g = batch.group_by("lang").aggregate([("n_chars", "sum"), ("n_chars", "count")])
    return g.rename_columns(["lang", "p_chars", "p_n"])


def q_summary_by_lang(sf_dir: str):
    # partial combine per batch, then a tiny shuffled groupby over partials
    partials = _docs(sf_dir, ["lang", "n_chars"]).map_batches(
        _lang_partial, batch_format="pyarrow"
    )
    out = (
        partials.groupby("lang")
        .aggregate(Sum("p_chars", alias_name="total_chars"),
                   Sum("p_n", alias_name="n_docs"))
        .to_pandas()
    )
    out["avg_chars"] = out["total_chars"].astype(float) / out["n_docs"].astype(float)
    return pa.Table.from_pandas(out[["lang", "n_docs", "total_chars", "avg_chars"]],
                                preserve_index=False)


# ---------------------------------------------------------------------------
# G5 / B7 — sort desc + limit (top-k)
# ---------------------------------------------------------------------------

def _topk(ds, by: str, tiebreak: str, k: int) -> pd.DataFrame:
    """Distributed top-k without a global sort: per-block local top-k, then a
    driver-side merge of <= k * n_blocks candidate rows."""
    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values([by, tiebreak], ascending=[False, True]).head(k)

    candidates = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    return (candidates.sort_values([by, tiebreak], ascending=[False, True])
            .head(k).reset_index(drop=True))


def _bucket_fold(ds, key: str, agg: dict, nb: int | None = None,
                 str_key: bool = False):
    """Exact integer groupby fold via ONE coarse-bucket map_groups
    (O(2·cpus) buckets, vectorized in-bucket pandas agg).

    Replaces ``Dataset.groupby(key).aggregate(...)`` where the partial
    table entering the fold is large: the built-in aggregate's
    accumulate was measured ~quadratic in rows per block (20 s for 155k
    rows across 64 blocks, 70 s in one block), while this fold is linear
    and shuffles the same rows once.  ``agg`` maps input column ->
    (output name, "sum" | "max").  Only order-independent INTEGER folds
    belong here — result is exactly the aggregate it replaces; float
    sums would reorder and must keep their existing deterministic
    paths."""
    from ..config import cluster_cpus

    nb = nb or max(16, cluster_cpus() * 2)
    if str_key:
        def add_b(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["_fb"] = (pd.util.hash_array(b[key].to_numpy(object))
                        % nb).astype(np.int32)
            return b

        bucketed = ds.map_batches(add_b, batch_format="pandas")
    else:
        def add_t(t: pa.Table) -> pa.Table:
            return t.append_column("_fb", _mod_bucket(t.column(key), nb))

        bucketed = ds.map_batches(add_t, batch_format="pyarrow")

    fns = {c: how for c, (_, how) in agg.items()}
    renames = {c: name for c, (name, _) in agg.items()}

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby(key, as_index=False).agg(fns)
        for c in fns:
            o[c] = o[c].astype("int64")
        return o.rename(columns=renames)

    return bucketed.groupby("_fb").map_groups(fold, batch_format="pandas")


def q_docs_topk_chars(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return _topk(ds, "n_chars", "doc_id", 20)[["doc_id", "n_chars"]]


def q_docs_page2(sf_dir: str):
    """B7 pagination: page 2 of the n_chars-descending listing (offset 20,
    limit 20) — local top-(offset+limit) per block, slice on the driver."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    top40 = _topk(ds, "n_chars", "doc_id", 40)
    return top40.iloc[20:40][["doc_id", "n_chars"]].reset_index(drop=True)


def q_docs_sample_mod(sf_dir: str):
    """Deterministic systematic sample (doc_id % 10 == 0): reproducible in
    SQL, unlike an RNG sample (G7 sampling analogue)."""
    def mod10_is_zero(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        rem = pc.subtract(ids, pc.multiply(pc.divide(ids, 10), 10))
        return t.filter(pc.equal(rem, 0))

    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return ds.map_batches(mod10_is_zero, batch_format="pyarrow").to_pandas()


def q_events_topk_value(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return _topk(ds, "value", "event_id", 50)[["event_id", "event_type", "value"]]


# ---------------------------------------------------------------------------
# D1-D5 — filters (pushed into the parquet scan)
# ---------------------------------------------------------------------------

def q_docs_filter(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pds.field("n_chars") >= 300) & (pds.field("lang") == "en"),
    )
    return ds.to_pandas()


# ---------------------------------------------------------------------------
# G6 — exact dedup by content hash (hash shuffle + keep-first)
# ---------------------------------------------------------------------------

def _md5_batch(batch: pa.Table) -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch.column("text").to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string())).drop(["text"])


def q_dedup_exact(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _md5_batch, batch_format="pyarrow", batch_size=8192
    )
    return (
        ds.groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )


# explicit ASCII whitespace class: Python re and DuckDB's RE2 read the
# class identically, where a bare \s would NOT (RE2 \s is ASCII-only,
# Python's is full-unicode) — the normalization must be bit-identical on
# both sides of the oracle
NORM_WS_CLASS = "[ \t\r\n]+"


def _norm_md5_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Canonical text form before hashing: collapse ASCII whitespace runs
    to one space, trim spaces, lowercase — then md5."""
    norm = (batch["text"].str.replace(NORM_WS_CLASS, " ", regex=True)
            .str.strip(" ").str.lower())
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "text_hash": [hashlib.md5(t.encode("utf-8")).hexdigest()
                      for t in norm]})


def q_norm_exact_dedup(sf_dir: str):
    """CCNet-style normalize-then-exact-dedup: whitespace-collapse + trim
    + lowercase BEFORE the content hash, so trivially re-formatted copies
    (double spaces, trailing newlines, case changes) collapse into one
    class.  Same scan-side-hash + one-hash-shuffle plan as q_dedup_exact;
    survivor = min doc_id per normalized class."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _norm_md5_batch, batch_format="pandas", batch_size=8192)
    return (
        ds.groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_copies"))
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# crawl-snapshot diff: classify every page across two crawl snapshots as
# added / removed / changed / unchanged — the standard incremental-crawl
# reconciliation step that decides what to re-extract.  Snapshot B derives
# DETERMINISTICALLY from the documents table (identical derivation in the
# SQL oracle): pages with doc_id%11==0 vanish, doc_id%7==0 come back
# re-crawled with new content, doc_id%13==0 spawn a brand-new page id.
# Texts never shuffle: each side reduces to (doc_id, md5) at the scan, the
# classification is one doc_id-keyed FULL OUTER hash join of the two
# digest tables, and only the 4-row status rollup reaches the driver.
# ---------------------------------------------------------------------------

CRAWL_NEW_ID_OFFSET = 1_000_000


def _crawl_snapshot_b(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic 'next crawl' of a documents batch (doc_id, text)."""
    b = batch[batch["doc_id"] % 11 != 0].copy()
    upd = b["doc_id"] % 7 == 0
    b.loc[upd, "text"] = b.loc[upd, "text"] + " [updated]"
    new = batch[batch["doc_id"] % 13 == 0]
    newdf = pd.DataFrame({
        "doc_id": (new["doc_id"] + CRAWL_NEW_ID_OFFSET).astype("int64"),
        "text": "new page " + new["doc_id"].astype(str)})
    return pd.concat([b[["doc_id", "text"]], newdf], ignore_index=True)


def q_crawl_diff(sf_dir: str):
    from ..rayops import fit_for_join

    def digests(ds, k, d, h):
        return ds.map_batches(
            _md5_batch, batch_format="pyarrow", batch_size=8192
        ).map_batches(
            lambda t: pa.table({k: t.column("doc_id"),
                                d: t.column("doc_id"),
                                h: t.column("text_hash")}),
            batch_format="pyarrow")

    # the doc_id payload copies (da/db) survive the join even though
    # Dataset.join drops the key columns themselves from its output
    a_schema = pa.schema([("ka", pa.int64()), ("da", pa.int64()),
                          ("ha", pa.large_string())])
    b_schema = pa.schema([("kb", pa.int64()), ("db", pa.int64()),
                          ("hb", pa.large_string())])
    a = fit_for_join(digests(_docs(sf_dir, ["doc_id", "text"]),
                             "ka", "da", "ha"), a_schema)
    b = fit_for_join(digests(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_crawl_snapshot_b, batch_format="pandas"),
        "kb", "db", "hb"), b_schema)
    joined = a.join(b, join_type="full_outer",
                    num_partitions=_join_parts(sf_dir, "documents"),
                    on=("ka",), right_on=("kb",))

    def classify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # one-sided partitions come back without the other side's columns
        in_a = (pc.is_valid(t.column("da")).to_numpy(zero_copy_only=False)
                if "da" in t.column_names else np.zeros(n, bool))
        in_b = (pc.is_valid(t.column("db")).to_numpy(zero_copy_only=False)
                if "db" in t.column_names else np.zeros(n, bool))
        both = in_a & in_b
        same = np.zeros(n, bool)
        if both.any():
            same[both] = (
                np.asarray(t.column("ha").to_pandas())[both]
                == np.asarray(t.column("hb").to_pandas())[both])
        status = np.where(~in_a, "added",
                          np.where(~in_b, "removed",
                                   np.where(same, "unchanged", "changed")))
        g = (pa.table({"status": pa.array(status, pa.string())})
             .group_by("status").aggregate([("status", "count")]))
        return g.rename_columns(["status", "pn"])

    out = (joined.map_batches(classify, batch_format="pyarrow")
           .groupby("status").aggregate(Sum("pn", alias_name="n_docs"))
           .to_pandas())
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("status").reset_index(drop=True)


# ---------------------------------------------------------------------------
# G8 — word count (vectorized pandas split)
# ---------------------------------------------------------------------------

def _wc_batch(batch: pd.DataFrame) -> pd.DataFrame:
    batch["n_words"] = batch["text"].str.split().str.len().astype("int64")
    return batch[["doc_id", "n_words"]]


def q_word_count(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_wc_batch, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# events aggregate by type — partial-combine inside map_batches, then a
# small groupby over partials (the pre-aggregation scale pattern)
# ---------------------------------------------------------------------------

def _events_partial(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64())
    t = batch.set_column(batch.schema.get_field_index("value"), "value_cents", cents)
    g = t.group_by("event_type").aggregate([("value_cents", "sum"), ("event_type", "count")])
    return g.rename_columns(["event_type", "partial_cents", "partial_n"])


def q_events_by_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    partials = ds.map_batches(_events_partial, batch_format="pyarrow", batch_size=65536)
    out = (
        partials.groupby("event_type")
        .aggregate(Sum("partial_cents", alias_name="total_value_cents"),
                   Sum("partial_n", alias_name="n_events"))
        .to_pandas()
    )
    return out


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary — filter + partial agg + groupby
# ---------------------------------------------------------------------------

def _q1_partial(batch: pa.Table) -> pa.Table:
    mask = pc.less_equal(batch.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
    t = batch.filter(mask)
    cents = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64())
    t = t.append_column("price_cents", cents)
    g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("l_quantity", "sum"), ("price_cents", "sum"), ("l_quantity", "count")]
    )
    return g.rename_columns(
        ["l_returnflag", "l_linestatus", "p_qty", "p_cents", "p_n"]
    )


def q_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    partials = ds.map_batches(_q1_partial, batch_format="pyarrow", batch_size=131072)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("p_qty", alias_name="sum_qty"),
                   Sum("p_cents", alias_name="sum_price_cents"),
                   Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    out["avg_qty"] = out["sum_qty"].astype(float) / out["n"].astype(float)
    return out


# ---------------------------------------------------------------------------
# broadcast hash join (sorted-array lookup fused into the orders scan) +
# grouped rollup; size-routed to a hash join past _BCAST_DIM_MAX_ROWS
# ---------------------------------------------------------------------------

def q_revenue_by_segment(sf_dir: str, *, route: str | None = None):
    """Size-routed like q_local_supplier_revenue: below _BCAST_DIM_MAX_ROWS
    the customer->segment map is broadcast once and the lookup fuses into
    the orders scan (one |segments|-row exchange total); past it the
    per-custkey order partials meet customer in a hash-partitioned join so
    nothing sized by the sf-scaled dimension is driver-read or broadcast."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    if route == "broadcast":
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        # sort ONCE on the driver; tasks ray.get a node-local zero-copy
        # view per batch — no actor-pool startup (A/B: see BASELINE.md)
        keys = cust.column("c_custkey").to_numpy()
        order = np.argsort(keys)
        cust_ref = ray.put((keys[order],
                            cust.column("c_mktsegment").to_numpy(
                                zero_copy_only=False)[order]))

        def seg_partial(batch: pa.Table) -> pa.Table:
            skeys, segs = ray.get(cust_ref)
            probe = batch.column("o_custkey").to_numpy()
            hit, segs_at = _sorted_lookup(skeys, segs, probe)
            cents = pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64())
            t = pa.table({"c_mktsegment": pa.array(segs_at[hit], pa.string()),
                          "cents": pa.array(cents.to_numpy()[hit],
                                            pa.int64())})
            g = t.group_by("c_mktsegment").aggregate([("cents", "sum"),
                                                      ("cents", "count")])
            return g.rename_columns(["c_mktsegment", "p_cents", "p_n"])

        partials = ds.map_batches(seg_partial, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        from ..rayops import fit_for_join

        def order_partial(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64())
            g = (pa.table({"o_custkey": t.column("o_custkey"),
                           "cents": cents})
                 .group_by("o_custkey")
                 .aggregate([("cents", "sum"), ("cents", "count")]))
            return g.rename_columns(["o_custkey", "p_cents", "p_n"])

        part_schema = pa.schema([("o_custkey", pa.int64()),
                                 ("p_cents", pa.int64()),
                                 ("p_n", pa.int64())])
        cust_schema = pa.schema([("c_custkey", pa.int64()),
                                 ("c_mktsegment", pa.large_string())])
        per_cust = fit_for_join(
            ds.map_batches(order_partial, batch_format="pyarrow"),
            part_schema)
        cust_ds = fit_for_join(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_mktsegment"]),
            cust_schema)
        joined = per_cust.join(cust_ds, join_type="inner",
                               num_partitions=_join_parts(sf_dir, "orders"),
                               on=("o_custkey",), right_on=("c_custkey",))

        def fold(t: pa.Table) -> pa.Table:
            g = (t.group_by("c_mktsegment")
                 .aggregate([("p_cents", "sum"), ("p_n", "sum")]))
            return g.rename_columns(["c_mktsegment", "p_cents", "p_n"])

        partials = joined.map_batches(fold, batch_format="pyarrow")
    return (
        partials.groupby("c_mktsegment")
        .aggregate(Sum("p_cents", alias_name="total_revenue_cents"),
                   Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# time-bucketed aggregate (the events table's "window" shape) — partial
# combine per batch, tiny groupby over partials
# ---------------------------------------------------------------------------

def _hourly_partial(batch: pa.Table) -> pa.Table:
    hour = pc.floor_temporal(batch.column("ts"), unit="hour")
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64())
    t = pa.table({"hour": hour, "cents": cents})
    g = t.group_by("hour").aggregate([("cents", "sum"), ("cents", "count")])
    return g.rename_columns(["hour", "p_cents", "p_n"])


def q_events_hourly(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    partials = ds.map_batches(_hourly_partial, batch_format="pyarrow")
    out = (
        partials.groupby("hour")
        .aggregate(Sum("p_cents", alias_name="total_value_cents"),
                   Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    # Ray's aggregate path downcasts hour-aligned timestamps to [s]; the
    # oracle's date_trunc emits timestamp[us] — pin the unit for the typed hash
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out


# ---------------------------------------------------------------------------
# min/max/count global stats — Ray's built-in partial+final aggregate
# ---------------------------------------------------------------------------

def q_events_value_stats(sf_dir: str):
    from ray.data.aggregate import Max

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    out = ds.aggregate(Min("value", alias_name="min_value"),
                       Max("value", alias_name="max_value"),
                       Count(alias_name="n_events"))
    return pa.table({
        "min_value": pa.array([out["min_value"]], pa.float64()),
        "max_value": pa.array([out["max_value"]], pa.float64()),
        "n_events": pa.array([out["n_events"]], pa.int64()),
    })


def q_distinct_sources(sf_dir: str):
    """Count-distinct via groupby (per-key partials shuffle, not a global
    set): n rows of the grouped table = the distinct count."""
    srcs = (_docs(sf_dir, ["source"]).groupby("source")
            .aggregate(Count(alias_name="n")))
    langs = (_docs(sf_dir, ["lang"]).groupby("lang")
             .aggregate(Count(alias_name="n")))
    return pa.table({
        "n_sources": pa.array([srcs.count()], pa.int64()),
        "n_langs": pa.array([langs.count()], pa.int64()),
    })


# ---------------------------------------------------------------------------
# month-bucketed rollup (coarser time window than events_hourly)
# ---------------------------------------------------------------------------

def _monthly_partial(batch: pa.Table) -> pa.Table:
    month = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
    cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)),
                    pa.int64())
    t = pa.table({"month": month, "cents": cents})
    g = t.group_by("month").aggregate([("cents", "sum"), ("cents", "count")])
    return g.rename_columns(["month", "p_cents", "p_n"])


def q_orders_by_month(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])
    out = (ds.map_batches(_monthly_partial, batch_format="pyarrow")
           .groupby("month")
           .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                      Sum("p_n", alias_name="n_orders"))
           .to_pandas())
    out["month"] = out["month"].astype("datetime64[us]")  # oracle date_trunc unit
    return out


# ---------------------------------------------------------------------------
# left-outer join: every customer with their order count (0 included)
# ---------------------------------------------------------------------------

def q_customer_order_counts(sf_dir: str):
    from ..config import cluster_cpus

    from ..rayops import fit_for_join

    nparts = _join_parts(sf_dir, "orders")
    counts_schema = pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    counts = fit_for_join(  # empty/zero-column blocks poison the join
        orders.map_batches(
            lambda t: t.group_by("o_custkey").aggregate([("o_custkey", "count")])
            .rename_columns(["o_custkey", "pn"]),
            batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("pn", alias_name="n")),
        counts_schema)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = cust.join(counts, join_type="left_outer", num_partitions=nparts,
                       on=("c_custkey",), right_on=("o_custkey",))
    out = joined.to_pandas()
    out["n_orders"] = out["n"].fillna(0).astype("int64")
    return out[["c_custkey", "n_orders"]].sort_values("c_custkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# multi-way rollup: orders -> customer -> nation; int-nationkey partials,
# 25-row name attach driver-side; size-routed past _BCAST_DIM_MAX_ROWS
# ---------------------------------------------------------------------------

def q_revenue_by_nation(sf_dir: str, *, route: str | None = None):
    """Size-routed: below _BCAST_DIM_MAX_ROWS the customer->nationkey map
    is broadcast once; past it per-custkey order partials meet customer in
    a hash-partitioned join.  Either way the exchange is int-nationkey
    partials and the 25-row nation name attach happens driver-side."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    if route == "broadcast":
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        keys = cust.column("c_custkey").to_numpy()
        order = np.argsort(keys)
        cust_ref = ray.put((keys[order],
                            cust.column("c_nationkey").to_numpy()[order]
                            .astype(np.int64)))

        def nat_partial(batch: pa.Table) -> pa.Table:
            nkeys, nat = ray.get(cust_ref)
            probe = batch.column("o_custkey").to_numpy()
            hit, nat_at = _sorted_lookup(nkeys, nat, probe)
            cents = pc.cast(pc.round(pc.multiply(
                batch.column("o_totalprice"), 100.0)), pa.int64())
            t = pa.table({"n_nationkey": pa.array(nat_at[hit], pa.int64()),
                          "cents": pa.array(cents.to_numpy()[hit],
                                            pa.int64())})
            g = t.group_by("n_nationkey").aggregate([("cents", "sum"),
                                                     ("cents", "count")])
            return g.rename_columns(["n_nationkey", "p_cents", "p_n"])

        partials = ds.map_batches(nat_partial, batch_format="pyarrow",
                                  batch_size=65536)
    else:
        from ..rayops import fit_for_join

        def order_partial(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64())
            g = (pa.table({"o_custkey": t.column("o_custkey"),
                           "cents": cents})
                 .group_by("o_custkey")
                 .aggregate([("cents", "sum"), ("cents", "count")]))
            return g.rename_columns(["o_custkey", "p_cents", "p_n"])

        part_schema = pa.schema([("o_custkey", pa.int64()),
                                 ("p_cents", pa.int64()),
                                 ("p_n", pa.int64())])
        cust_schema = pa.schema([("c_custkey", pa.int64()),
                                 ("c_nationkey", pa.int64())])
        per_cust = fit_for_join(
            ds.map_batches(order_partial, batch_format="pyarrow"),
            part_schema)
        cust_ds = fit_for_join(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"]),
            cust_schema)
        joined = per_cust.join(cust_ds, join_type="inner",
                               num_partitions=_join_parts(sf_dir, "orders"),
                               on=("o_custkey",), right_on=("c_custkey",))

        def fold(t: pa.Table) -> pa.Table:
            g = (t.group_by("c_nationkey")
                 .aggregate([("p_cents", "sum"), ("p_n", "sum")]))
            return g.rename_columns(["n_nationkey", "p_cents", "p_n"])

        partials = joined.map_batches(fold, batch_format="pyarrow")
    out = (partials.groupby("n_nationkey")
           .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                      Sum("p_n", alias_name="n_orders"))
           .to_pandas())
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    out = out.merge(nation, on="n_nationkey", how="inner")
    return (out[["n_name", "revenue_cents", "n_orders"]]
            .sort_values("n_name").reset_index(drop=True))


# ---------------------------------------------------------------------------
# HAVING-style post-aggregation filter
# ---------------------------------------------------------------------------

def q_brands_having(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
    g = (ds.map_batches(
        lambda t: t.group_by("p_brand").aggregate([("p_brand", "count")])
        .rename_columns(["p_brand", "pn"]),
        batch_format="pyarrow")
        .groupby("p_brand").aggregate(Sum("pn", alias_name="n_parts"))
        .to_pandas())
    return g[g["n_parts"] > 5].sort_values("p_brand").reset_index(drop=True)


# ---------------------------------------------------------------------------
# large-large hash join: native Dataset.join (hash-partitioned exchange of
# BOTH sides) — complements the broadcast join (revenue_by_segment) for the
# case where neither side fits in memory.  Pre-project to the join+agg
# columns before the shuffle (prune what moves).
# ---------------------------------------------------------------------------

def q_revenue_by_priority(sf_dir: str):
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda t: pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "cents": pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
                             pa.int64()),
        }),
        batch_format="pyarrow",
    )
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(od, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    partials = joined.map_batches(
        lambda t: t.group_by("o_orderpriority")
        .aggregate([("cents", "sum"), ("cents", "count")])
        .rename_columns(["o_orderpriority", "p_cents", "p_n"]),
        batch_format="pyarrow",
    )
    return (
        partials.groupby("o_orderpriority")
        .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                   Sum("p_n", alias_name="n_items"))
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# session windows (streaming-shaped op over the ordered events log):
# bucket users by hash -> vectorized sessionization within each bucket.
# Gap threshold 30 min; per session: start, end, count, value cents.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_buckets() -> int:
    """Bucket count scales with the cluster (hard-coding it strands 1/B of
    all users' events in one task at 100x scale — round-1 verdict fix #7)."""
    from ..config import cluster_cpus
    return max(16, cluster_cpus() * 2)


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """Vectorized inner-join lookup against a sorted key array.

    Returns ``(hit, vals_at)``: ``hit[i]`` is True iff ``probe[i]`` is
    present in ``keys``; ``vals_at[i]`` is the matching value where hit
    and an arbitrary in-bounds placeholder where not — callers must mask
    by ``hit``.  Empty-safe: a zero-length dimension yields all-miss
    instead of the IndexError a raw searchsorted-then-index produces on
    an empty (or out-of-range-probed) broadcast side.
    """
    n = len(keys)
    if n == 0:
        return (np.zeros(len(probe), dtype=bool),
                np.zeros(len(probe), dtype=vals.dtype))
    pos = np.searchsorted(keys, probe)
    np.clip(pos, 0, n - 1, out=pos)
    hit = keys[pos] == probe
    return hit, vals[pos]


def _mod_bucket(uid, num_buckets: int):
    """int64 ids -> int32 `id % num_buckets` bucket column (pc kernels:
    Arrow has no modulo)."""
    return pc.cast(
        pc.subtract(uid, pc.multiply(pc.divide(uid, num_buckets),
                                     num_buckets)),
        pa.int32())


def _bucket_users(batch: pa.Table, num_buckets: int) -> pa.Table:
    return batch.append_column(
        "ubucket", _mod_bucket(batch.column("user_id"), num_buckets))


def _sessionize_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "ts"]).reset_index(drop=True)
    ts_us = g["ts"].astype("int64")
    new_user = g["user_id"].ne(g["user_id"].shift())
    gap = ts_us.diff().gt(SESSION_GAP_US)
    session_id = (new_user | gap).cumsum()
    g["cents"] = (g["value"] * 100).round().astype("int64")
    out = g.groupby(session_id).agg(
        user_id=("user_id", "first"),
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("event_id", "count"),
        value_cents=("cents", "sum"),
    )
    return out.reset_index(drop=True)


def q_user_sessions(sf_dir: str):
    """Session-window aggregate: ordered per-user event log, gap > 30 min
    starts a new session.  Partition by user-hash bucket (co-locates each
    user's events), sessionize vectorized inside the bucket — the engine's
    windowed-aggregate shape for stream-like tables."""
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = ds.groupby("ubucket").map_groups(_sessionize_bucket, batch_format="pandas")
    return out.to_pandas()


# ---------------------------------------------------------------------------
# as-of (point-in-time) join: for each event, aggregate the user's orders
# up to the event timestamp.  TWO routes, size-selected from parquet
# metadata: broadcast index + searchsorted per batch (no shuffle) while
# orders fits a broadcast; past _BCAST_DIM_MAX_ROWS the two sides
# co-partition by user-hash bucket (the sessionization exchange) and the
# identical kernel runs bucket-locally — orders is a FACT table, so the
# broadcast cannot be the only plan at the 100x regime.  Routes pinned
# equal in tests/test_query_shapes.py.
# ---------------------------------------------------------------------------

def _asof_kernel(event_ids, users, ts_us, by_cust) -> pa.Table:
    """Shared as-of core: per-event count of the user's orders at/before
    ts plus the latest such order date.  One vectorized searchsorted per
    UNIQUE user (round-1 verdict fix #7: the per-row loop was the
    hot-path anti-pattern); argsort-grouping keeps it O(N log N)."""
    n = len(users)
    n_prior = np.zeros(n, dtype=np.int64)
    last_date = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
    valid = np.zeros(n, dtype=bool)
    order = np.argsort(users, kind="stable")
    bounds = np.nonzero(np.diff(users[order]))[0] + 1
    for sel in np.split(order, bounds):
        dates = by_cust.get(int(users[sel[0]]))
        if dates is None:
            continue
        ks = np.searchsorted(dates, ts_us[sel], side="right")
        n_prior[sel] = ks
        hit = sel[ks > 0]
        last_date[hit] = dates[ks[ks > 0] - 1]
        valid[hit] = True
    dates_series = pd.Series(np.where(valid, last_date, 0)
                             .astype("datetime64[us]"))
    dates_series[~valid] = pd.NaT
    return pa.table({
        "event_id": pa.array(event_ids, pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "last_order_date": pa.Array.from_pandas(dates_series,
                                                type=pa.timestamp("us")),
        "n_prior_orders": pa.array(n_prior, pa.int64()),
    })


class _AsofOrders:
    def __init__(self, orders_ref):
        import ray as _ray

        tbl = _ray.get(orders_ref)
        df = tbl.to_pandas().sort_values(["o_custkey", "o_orderdate"])
        self.by_cust = {
            k: g["o_orderdate"].astype("int64").to_numpy()
            for k, g in df.groupby("o_custkey")
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _asof_kernel(
            batch.column("event_id").to_numpy(),
            batch.column("user_id").to_numpy(),
            batch.column("ts").cast(pa.int64()).to_numpy(),
            self.by_cust)


def _asof_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Bucket-local as-of: the bucket holds BOTH sides for its users
    (kind 0 = events, kind 1 = orders), so the broadcast kernel runs
    unchanged on a bucket-local index."""
    ev = group[group["kind"] == 0]
    od = group[group["kind"] == 1].sort_values(["user_id", "ts_us"])
    out_schema = {"event_id": "int64", "user_id": "int64",
                  "last_order_date": "datetime64[us]",
                  "n_prior_orders": "int64"}
    if not len(ev):
        return pd.DataFrame({k: pd.Series([], dtype=v)
                             for k, v in out_schema.items()})
    by_cust = {int(k): g["ts_us"].to_numpy()
               for k, g in od.groupby("user_id")}
    t = _asof_kernel(ev["event_id"].to_numpy(), ev["user_id"].to_numpy(),
                     ev["ts_us"].to_numpy(), by_cust)
    return t.to_pandas()


def q_events_asof_orders(sf_dir: str, *, route: str | None = None):
    import pyarrow.parquet as pq

    if route is None:
        n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        route = ("broadcast" if n_orders <= _BCAST_DIM_MAX_ROWS
                 else "bucketed")
    if route == "broadcast":
        orders = pq.read_table(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate"])
        ref = ray.put(orders)
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
        out = ds.map_batches(
            _AsofOrders, fn_constructor_kwargs={"orders_ref": ref},
            batch_format="pyarrow", concurrency=(1, 4), num_cpus=1,
        )
        return out.to_pandas()

    nb = _session_buckets()

    def tag_events(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "ubucket": _mod_bucket(uid, nb),
            "kind": pa.array(np.zeros(t.num_rows, np.int8)),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "user_id": uid,
            "ts_us": pc.cast(t.column("ts"), pa.int64())})

    def tag_orders(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("o_custkey"), pa.int64())
        return pa.table({
            "ubucket": _mod_bucket(uid, nb),
            "kind": pa.array(np.ones(t.num_rows, np.int8)),
            "event_id": pa.array(np.full(t.num_rows, -1, np.int64)),
            "user_id": uid,
            "ts_us": pc.cast(t.column("o_orderdate"), pa.int64())})

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"]
                         ).map_batches(tag_events, batch_format="pyarrow")
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"]
                         ).map_batches(tag_orders, batch_format="pyarrow")
    out = (ev.union(od).groupby("ubucket")
           .map_groups(_asof_bucket, batch_format="pandas"))
    return out.to_pandas()


# ---------------------------------------------------------------------------
# text-analysis operators (functions/text.py) over documents
# ---------------------------------------------------------------------------

def q_quality_scores(sf_dir: str):
    from ..functions.text import quality_features

    def featurize(batch: pd.DataFrame) -> pd.DataFrame:
        feats = [quality_features(t) for t in batch["text"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", batch["doc_id"].values)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(featurize, batch_format="pandas")
        .to_pandas()
    )


def q_token_counts(sf_dir: str):
    from ..functions.text import bpe_token_count

    def count(batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_ws_tokens"] = batch["text"].str.split().str.len().astype("int64")
        batch["n_bpe_tokens"] = batch["text"].map(bpe_token_count).astype("int64")
        return batch[["doc_id", "n_ws_tokens", "n_bpe_tokens"]]

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(count, batch_format="pandas")
        .to_pandas()
    )


def q_lang_id(sf_dir: str):
    """Language-ID actor pool (profiles built once per actor) + rollup."""
    from ..functions.text import LangId

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )
    return (
        ds.groupby("lang_id").aggregate(Count(alias_name="n_docs")).to_pandas()
    )


def q_fingerprints(sf_dir: str):
    from ..functions.text import fingerprint

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch["fp"] = batch["text"].map(fingerprint).astype("int64")
        return batch[["doc_id", "fp"]]

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fp, batch_format="pandas")
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# near-duplicate family (functions/dedup.py)
# ---------------------------------------------------------------------------

def q_minhash_near_dups(sf_dir: str):
    """MinHash-LSH candidates -> DISTRIBUTED exact-Jaccard verification
    (j >= 0.5).  128 perms, 32 bands x 4 rows: P(candidate | j=0.5) ~ 0.87.
    Verification joins candidate pairs back to shingle sets (broadcast
    semi-join prune + hash join) — no driver-side text materialization."""
    from ..functions.dedup import minhash_candidate_pairs, verify_pairs_distributed

    ds = _docs(sf_dir, ["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, num_perm=128, bands=32)
    verified = verify_pairs_distributed(cand, _docs(sf_dir, ["doc_id", "text"]),
                                        threshold=0.5)
    from ..rayops import concat_batches

    out = concat_batches(
        verified.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    return out.take(pc.sort_indices(out, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard similarity pairs (j >= 0.3) over a bounded
    deterministic subset — the brute-force ground truth the MinHash-LSH
    pipeline approximates.  Shingle sets computed per batch in parallel;
    the pairwise comparison runs on the collected (small) shingle table."""
    from ..functions.dedup import jaccard, shingles

    def shingle_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "shingles": batch["text"].map(lambda t: sorted(shingles(t or ""))),
        })

    subset = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), 200)),
        batch_format="pyarrow",
    )
    sh = subset.map_batches(shingle_batch, batch_format="pandas").to_pandas()
    sets = {int(r.doc_id): set(r.shingles) for r in sh.itertuples(index=False)}
    ids = sorted(sets)
    a_l, b_l = [], []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if jaccard(sets[a], sets[b]) >= 0.3:
                a_l.append(a); b_l.append(b)
    return pa.table({"a": pa.array(a_l, pa.int64()), "b": pa.array(b_l, pa.int64())})


def q_jaccard_clusters(sf_dir: str):
    """Connected components over the brute-force 3-gram-Jaccard >= 0.3
    pair set (same bounded doc_id < 200 subset as q_ngram_jaccard_pairs),
    labeled by the DISTRIBUTED min-label-propagation join path
    (pipelines/curate.cluster_pairs_distributed -> functions/graph.
    cc_join) — which until round 5 was pinned only by unit tests.  The
    external oracle computes the same components as a recursive-CTE
    transitive closure in SQL: one row per doc appearing in a pair,
    canonical = min doc id of its component."""
    import ray.data as rd

    from .curate import cluster_pairs_distributed

    pairs = q_ngram_jaccard_pairs(sf_dir)
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "canonical": pa.array([], pa.int64())})
    out = cluster_pairs_distributed(rd.from_arrow(pairs)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_simhash_near_dups(sf_dir: str):
    """SimHash pigeonhole retrieval wired end-to-end: chunk-key groupby ->
    vectorized XOR-popcount Hamming verify (<= 3 bits of 64) -> pair dedup.
    Rows-only (signature algorithm, not SQL)."""
    from ..functions.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                 max_distance=3)
    from ..rayops import concat_batches

    tbl = concat_batches(
        out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()),
                   ("hamming", pa.int64())]))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


def q_simhash_signatures(sf_dir: str):
    from ..functions.dedup import simhash

    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        # two's-complement fold into int64 for the Arrow column
        batch["simhash"] = batch["text"].map(
            lambda t: (lambda s: s - (1 << 64) if s >= (1 << 63) else s)(simhash(t))
        ).astype("int64")
        return batch[["doc_id", "simhash"]]

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sig, batch_format="pandas")
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# similarity search (functions/similarity.py) over embeddings
# ---------------------------------------------------------------------------

def q_embedding_knn(sf_dir: str):
    """Exact cosine top-10 for the query vector vec_id=0 (broadcast matmul
    per batch, local top-k, driver merge).  Returns ids only: membership is
    float-stable, raw similarities are not bit-identical across engines."""
    import pyarrow.parquet as pq

    from ..functions.similarity import knn_topk

    # point read with row-group pushdown — the corpus never reaches the
    # driver (an unfiltered read_table here would at 100x scale)
    q0 = np.asarray(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"],
                      filters=[("vec_id", "==", 0)])
        .column("embedding").to_pylist()[0]
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = knn_topk(ds, q0[None, :], k=10)
    return out[["vec_id"]].astype("int64")


def q_embedding_ivf_knn(sf_dir: str):
    """Approximate top-10 via the IVF index (the ANN scale path): probes 8
    of 16 k-means lists instead of scanning everything.  The quantizer is
    trained on a BOUNDED deterministic sample (never the full table on the
    driver).  Rows-only — approximate membership is engine-specific by
    design."""
    import pyarrow.parquet as pq

    from ..functions.similarity import ivf_knn, train_ivf_from_dataset

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    idx = train_ivf_from_dataset(ds, n_lists=16, sample_size=4096)
    # point read with row-group pushdown (see q_embedding_knn)
    q0 = np.asarray(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"],
                      filters=[("vec_id", "==", 0)])
        .column("embedding").to_pylist()[0]
    )
    out, frac = ivf_knn(ds, idx, q0, k=10, nprobe=8)
    res = out[["vec_id"]].astype("int64")
    res["scanned_fraction"] = round(float(frac), 4)
    return res


def q_embedding_near_dups(sf_dir: str):
    """All pairs with cosine >= 0.45 (ids only, see q_embedding_knn).
    EXACT, computed distributed: one Ray task per block pair over
    materialized normalized blocks — the driver handles only ObjectRefs."""
    from ..functions.similarity import embedding_near_dup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_near_dup_pairs(ds, threshold=0.45).select(["a", "b"])


def q_embedding_near_dups_lsh(sf_dir: str):
    """Bucketed near-dup pairs — the 100-TB path and the curation-facing
    DEFAULT (the exact sibling is the oracle baseline; its O(n^2) block
    pairs stop being sensible past ~10^6 rows —
    similarity.embedding_near_dups_auto routes).  L=16 hyperplane tables
    of k=2 planes, within-bucket exact cosine, groupby dedup.
    Oracle-checked against the same brute-force cosine SQL as the exact
    query: at k=2/L=16 every qualifying pair collides in >= 1 table on
    this corpus, so the pair set is bit-equal."""
    from ..functions.similarity import embedding_near_dup_pairs_lsh

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs_lsh(ds, dim=64, threshold=0.45, k=2, L=16)
    from ..rayops import concat_batches

    tbl = concat_batches(
        out.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


# ---------------------------------------------------------------------------
# flagship extraction ops over the synthesized pages table (rows-only checks:
# the pages table is not a DuckDB view, and extraction is not SQL)
# ---------------------------------------------------------------------------

def q_extract_flagship(sf_dir: str):
    """Full pipeline: sniff -> dedup -> html/pdf/OCR extract over the whole
    pages corpus synthesized from this sf's documents table."""
    from ..pipelines.extract import extract_pages_table
    from ..sources.synth import pages_from_documents

    pages = pages_from_documents(sf_dir)
    out = extract_pages_table(pages).drop_columns(["processing_ms"])  # timing varies
    # return Arrow (not a Dataset): span_offsets is a nested list column
    # that naive pandas conversion chokes on
    tbl = pa.concat_tables(out.iter_batches(batch_size=4096, batch_format="pyarrow"))
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("url", "ascending")]))


def q_engine_info(sf_dir: str):
    """A8 — engine metadata + supported languages (driver-side manifest
    record in production; exposed as a deterministic table)."""
    from ..stages.ocr import DeterministicEngine

    eng = DeterministicEngine()
    info = eng.get_engine_info()
    langs = eng.get_supported_languages()
    return pa.table({
        "key": pa.array(list(info.keys()) + ["supported_languages"], pa.string()),
        "value": pa.array([str(v) for v in info.values()] + [",".join(langs)],
                          pa.string()),
    })


def q_media_features(sf_dir: str):
    """Multimodal stage plumbing: synthetic media corpus -> decode/feature
    actor pool -> feature table (codec calls stubbed deterministically;
    rows-only check)."""
    from ..functions.multimodal import media_feature_pipeline, synth_media_table

    tbl = synth_media_table(120)
    ds = rd.from_arrow(tbl).repartition(8)
    out = media_feature_pipeline(ds, concurrency=(1, 4), batch_size=8)
    # collect as Arrow: ragged list columns don't round-trip through pandas
    res = pa.concat_tables(out.iter_batches(batch_size=256, batch_format="pyarrow"))
    return res.take(pc.sort_indices(res, sort_keys=[("media_id", "ascending")]))


def q_media_features_real(sf_dir: str):
    """Multimodal stage with ALL THREE real pure-Python codecs (PNG via
    functions/png.py, WAV via functions/wav.py, YUV4MPEG2 via
    functions/y4m.py) over a deterministic real-payload corpus; corrupt
    rows degrade per-row (None features).  Rows-only check."""
    from ..functions.multimodal import (media_feature_pipeline,
                                        synth_real_media_table)

    tbl = synth_real_media_table(120)
    ds = rd.from_arrow(tbl).repartition(8)
    out = media_feature_pipeline(ds, concurrency=(1, 4), batch_size=8,
                                 image_mode="real", audio_mode="real",
                                 video_mode="real")
    res = pa.concat_tables(out.iter_batches(batch_size=256,
                                            batch_format="pyarrow"))
    return res.take(pc.sort_indices(res, sort_keys=[("media_id",
                                                     "ascending")]))


def q_extract_markdown(sf_dir: str):
    """B8/B9/B10 markdown rendering over extracted documents (rows-only:
    string templating is deterministic but payload-derived)."""
    from ..stages.assemble import render_markdown

    def to_md(batch: pd.DataFrame) -> pd.DataFrame:
        md = [
            render_markdown(u, t, tj, c, int(n), p, e, 300, lang)
            for u, t, tj, c, n, p, e, lang in zip(
                batch["url"], batch["extracted_text"], batch["tables_json"],
                batch["confidence"], batch["n_pages"], batch["processing_ms"],
                batch["engine"], batch["lang"])
        ]
        return pd.DataFrame({"url": batch["url"], "markdown": md,
                             "md_len": [len(m) for m in md]})

    from ..pipelines.extract import extract_pages_table
    from ..sources.synth import pages_from_documents

    pages = pages_from_documents(sf_dir, limit=100)
    out = extract_pages_table(pages)
    return out.map_batches(to_md, batch_format="pandas").to_pandas()


def q_extract_markdown_ref(sf_dir: str):
    """B8 reference-EXACT mode: the full markdown_generator.py template —
    'Información del Documento' header block + 'Información Técnica'
    footer — with the two non-deterministic fields (processed date,
    document id) INJECTED as fixed values so the column stays a pure
    function (rows-only; template bytes pinned in tests/test_assemble.py)."""
    import json as _json

    from ..stages.assemble import render_markdown_reference_exact

    def to_md(batch: pd.DataFrame) -> pd.DataFrame:
        md = [
            render_markdown_reference_exact(
                u, t, _json.loads(tj) if tj else [], int(n), c, p / 1000.0,
                processed_date="1970-01-01 00:00:00",
                document_id=u,  # url IS the stable document id here
                dpi=300, language=lang)
            for u, t, tj, c, n, p, lang in zip(
                batch["url"], batch["extracted_text"], batch["tables_json"],
                batch["confidence"], batch["n_pages"], batch["processing_ms"],
                batch["lang"])
        ]
        return pd.DataFrame({"url": batch["url"], "markdown": md,
                             "md_len": [len(m) for m in md]})

    from ..pipelines.extract import extract_pages_table
    from ..sources.synth import pages_from_documents

    pages = pages_from_documents(sf_dir, limit=100)
    out = extract_pages_table(pages)
    return out.map_batches(to_md, batch_format="pandas").to_pandas()


def q_pdf_classify(sf_dir: str):
    """C1 PDFType classifier histogram over the synthetic pdf payloads
    (rows-only; the 5-class taxonomy + thresholds of pdf_analyzer.py)."""
    from ..sources.synth import pages_from_documents
    from ..stages.sniff import classify_pdf_type

    def classify(batch: pa.Table) -> pa.Table:
        kinds = []
        for payload in batch.column("html").to_pylist():
            if payload[:5] == b"%PDF-" and len(payload) >= 1024:
                try:
                    kinds.append(classify_pdf_type(payload))
                except Exception:
                    kinds.append("error")
        return pa.table({"pdf_type": pa.array(kinds, pa.string())})

    pages = pages_from_documents(sf_dir, limit=500)
    ds = rd.from_arrow(pages).repartition(8).map_batches(
        classify, batch_format="pyarrow")
    return ds.groupby("pdf_type").aggregate(Count(alias_name="n")).to_pandas()


def q_extract_summary_md(sf_dir: str):
    """B11 summary-markdown artifact: the per-corpus statistics come from
    DISTRIBUTED aggregates over the extracted table (Count/Sum/Mean — the
    B11 aggregate op); the listed doc rows are a bounded top sample.
    Rows-only: the artifact embeds wall-clock processing times."""
    from ray.data.aggregate import Count, Mean, Sum

    from ..pipelines.extract import extract_pages_table
    from ..sources.synth import pages_from_documents
    from ..stages.assemble import render_summary_markdown

    pages = pages_from_documents(sf_dir, limit=100)
    out = extract_pages_table(pages).materialize()
    agg = out.aggregate(Count(alias_name="n"),
                        Sum("n_pages", alias_name="pages"),
                        Mean("confidence", alias_name="conf"),
                        Sum("processing_ms", alias_name="ms"))
    head = (out.select_columns(["url", "n_pages", "confidence",
                                "processing_ms", "error"])
            .sort("url").limit(20).to_pandas())
    rows = [{"url": r.url, "n_pages": int(r.n_pages),
             "confidence": float(r.confidence),
             "processing_time": float(r.processing_ms) / 1000.0,
             "status": "error" if r.error else "processed"}
            for r in head.itertuples(index=False)]
    md = render_summary_markdown(rows, int(agg["n"]), int(agg["pages"]),
                                 float(agg["conf"]), float(agg["ms"]) / 1000.0)
    return pa.table({
        "n_docs": pa.array([int(agg["n"])], pa.int64()),
        "total_pages": pa.array([int(agg["pages"])], pa.int64()),
        "markdown": pa.array([md], pa.large_string()),
        "md_lines": pa.array([md.count("\n") + 1], pa.int64()),
    })


def q_pdf_doc_info(sf_dir: str):
    """C6 doc-info probe: build info-carrying PDFs from the documents table
    (deterministic), probe /Title,/Author,/Producer,/CreationDate back out
    with the fallback-chain parser.  Rows-only: binary round-trip, not SQL."""
    from ..sources.pdfgen import native_pdf
    from ..stages.pdf_native import doc_info

    def roundtrip(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "title": [], "author": [], "producer": [],
                "page_count": []}
        for doc_id, lang, text in zip(batch.column("doc_id").to_pylist(),
                                      batch.column("lang").to_pylist(),
                                      batch.column("text").to_pylist()):
            pdf = native_pdf([text[:200] or "x"], info={
                "Title": f"doc-{doc_id}", "Author": f"author-{lang}",
                "Producer": "ocr_main_ray",
                "CreationDate": "D:20250101000000Z"})
            inf = doc_info(pdf)
            rows["doc_id"].append(doc_id)
            rows["title"].append(inf["title"])
            rows["author"].append(inf["author"])
            rows["producer"].append(inf["producer"])
            rows["page_count"].append(inf["page_count"])
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "title": pa.array(rows["title"], pa.string()),
            "author": pa.array(rows["author"], pa.string()),
            "producer": pa.array(rows["producer"], pa.string()),
            "page_count": pa.array(rows["page_count"], pa.int32()),
        })

    sub = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), 200)),
        batch_format="pyarrow")
    out = sub.map_batches(roundtrip, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pages_sniff_counts(sf_dir: str):
    """Sniff stage only: content_type histogram of the synthetic pages."""
    from ..sources.synth import pages_from_documents
    from ..stages.sniff import sniff_batch

    pages = pages_from_documents(sf_dir, limit=2000)
    ds = rd.from_arrow(pages).map_batches(
        sniff_batch, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    )
    return (
        ds.groupby("content_type").aggregate(Count(alias_name="n"))
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# anti join: customers with NO order on/after a cutoff ("lapsed" customers).
# Shape: pushed-down date filter at the scan -> distributed distinct of the
# surviving custkeys (partial count per batch, tiny groupby) -> hash-
# partitioned LEFT OUTER join -> keep the null side.  Nothing but join keys
# crosses the shuffle.
# ---------------------------------------------------------------------------

LAPSED_CUTOFF = np.datetime64("1999-01-01", "us")


def q_customers_lapsed(sf_dir: str):
    from ..config import cluster_cpus

    from ..rayops import fit_for_join

    nparts = _join_parts(sf_dir, "orders")
    keys_schema = pa.schema([("o_custkey", pa.int64()), ("pn", pa.int64())])

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pds.field("o_orderdate") >= pa.scalar(LAPSED_CUTOFF),
    )
    keys = fit_for_join(  # empty/zero-column blocks poison the join
        recent.map_batches(
            lambda t: t.group_by("o_custkey").aggregate([("o_custkey", "count")])
            .rename_columns(["o_custkey", "pn"]),
            batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("pn", alias_name="pn")),
        keys_schema)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    joined = cust.join(keys, join_type="left_outer", num_partitions=nparts,
                       on=("c_custkey",), right_on=("o_custkey",))
    out = joined.to_pandas()
    out = out[out["pn"].isna()]
    return (out[["c_custkey", "c_name"]]
            .sort_values("c_custkey").reset_index(drop=True))


# ---------------------------------------------------------------------------
# top-N per group (grouped top-k): each user's 3 highest-value events.
# Partial top-3 per (batch, user) BEFORE the shuffle bounds the exchange to
# <= 3 rows * users * blocks; the grouped final pass re-ranks candidates.
# ---------------------------------------------------------------------------

def _user_top3_partial(batch: pd.DataFrame) -> pd.DataFrame:
    return (batch.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True])
            .groupby("user_id", sort=False).head(3))


def _user_top3_bucket_final(g: pd.DataFrame) -> pd.DataFrame:
    # whole coarse bucket at once: one vectorized sort + grouped head —
    # per-USER map_groups would pay the ~100 ms UDF dispatch per user
    return (g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True])
            .groupby("user_id", sort=False).head(3)
            [["user_id", "event_id", "value"]])


def q_top_events_per_user(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    partial = (ds.map_batches(_user_top3_partial, batch_format="pandas")
               .map_batches(lambda t: _bucket_users(t, nb),
                            batch_format="pyarrow"))
    out = partial.groupby("ubucket").map_groups(_user_top3_bucket_final,
                                                batch_format="pandas")
    return out.to_pandas()


# ---------------------------------------------------------------------------
# per-key ordered window: running value total per user over the event log
# (sum OVER (PARTITION BY user ORDER BY ts ROWS UNBOUNDED PRECEDING)).
# Same co-location strategy as q_user_sessions: user-hash buckets sized to
# the cluster, vectorized cumsum within each bucket.
# ---------------------------------------------------------------------------

def _running_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    cents = (g["value"] * 100).round().astype("int64")
    run = cents.groupby(g["user_id"], sort=False).cumsum()
    return pd.DataFrame({"event_id": g["event_id"], "user_id": g["user_id"],
                         "ts": g["ts"], "running_cents": run})


def q_user_running_value(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = ds.groupby("ubucket").map_groups(_running_bucket,
                                           batch_format="pandas").to_pandas()
    out["ts"] = out["ts"].astype("datetime64[us]")  # oracle emits timestamp[us]
    return out


def _interarrival_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Whole coarse bucket vectorized: sort by (user, ts, event_id), diff
    within user runs, one integer-microsecond aggregate row per user."""
    g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    us = g["ts"].astype("datetime64[us]").astype("int64")
    gap = us.diff()
    same_user = g["user_id"].eq(g["user_id"].shift())
    gaps = pd.DataFrame({"user_id": g["user_id"], "gap_us": gap})[same_user]
    agg = gaps.groupby("user_id", sort=False)["gap_us"].agg(
        n_gaps="count", sum_gap_us="sum", max_gap_us="max").reset_index()
    return pd.DataFrame({
        "user_id": agg["user_id"].astype("int64"),
        "n_gaps": agg["n_gaps"].astype("int64"),
        "sum_gap_us": agg["sum_gap_us"].astype("int64"),
        "max_gap_us": agg["max_gap_us"].astype("int64")})


def q_user_interarrival(sf_dir: str):
    """Per-user inter-arrival LAG-window stats (gap count / total / max, in
    exact integer microseconds).  Same shape as the other window queries:
    coarse user-hash buckets (O(cpus) map_groups dispatches), everything
    inside a bucket one vectorized pandas pass — never a per-user UDF."""
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = (ds.groupby("ubucket").map_groups(_interarrival_bucket,
                                            batch_format="pandas")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    return out


# bands for the broadcast range join (cents; right-open intervals).  The
# small side of a range join never shuffles: the edge array is broadcast
# and each batch does one vectorized searchsorted — the canonical
# dimension-banding shape at 100 TB.
VALUE_BANDS = [("micro", 0, 1_000), ("small", 1_000, 5_000),
               ("medium", 5_000, 20_000), ("large", 20_000, 100_000)]


def _band_partial(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
    edges = np.asarray([b[1] for b in VALUE_BANDS] + [VALUE_BANDS[-1][2]],
                       dtype=np.int64)
    idx = np.searchsorted(edges, cents, side="right") - 1
    ok = (idx >= 0) & (idx < len(VALUE_BANDS))
    names = np.asarray([b[0] for b in VALUE_BANDS], dtype=object)
    g = (pd.DataFrame({"band": names[idx[ok]], "cents": cents[ok]})
         .groupby("band", sort=False)["cents"]
         .agg(pn="count", psum="sum").reset_index())
    return pa.table({"band": pa.array(g["band"], pa.string()),
                     "pn": pa.array(g["pn"], pa.int64()),
                     "psum": pa.array(g["psum"], pa.int64())})


def q_events_value_band_join(sf_dir: str):
    """Range join events -> value bands (cents BETWEEN lo AND hi-1): the
    band table is broadcast as a sorted edge array, membership is one
    vectorized searchsorted per batch, then per-band partials -> a 4-row
    groupby — the small side never enters a shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    out = (ds.map_batches(_band_partial, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("pn", alias_name="n_events"),
                      Sum("psum", alias_name="sum_cents"))
           .to_pandas().sort_values("band").reset_index(drop=True))
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# exact distributed percentiles (quantile_disc semantics): integer-cents
# histogram — per-batch value_counts partial, groupby-sum over <= distinct
# cents rows, driver folds the (small, bounded-cardinality) histogram into
# nearest-rank picks.  No global sort: the shuffle moves one row per distinct
# cent value per block, not one row per event.
# ---------------------------------------------------------------------------

def _cents_hist_partial(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64())
    g = pa.table({"cents": cents}).group_by("cents").aggregate(
        [("cents", "count")])
    return g.rename_columns(["cents", "pn"])


def _type_cents_hist_partial(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64())
    g = (pa.table({"event_type": batch.column("event_type"), "cents": cents})
         .group_by(["event_type", "cents"]).aggregate([("cents", "count")]))
    return g.rename_columns(["event_type", "cents", "pn"])


def q_events_type_percentiles(sf_dir: str):
    """GROUPED exact percentiles (quantile_disc semantics per event_type):
    same cents-histogram shape as the global query — the exchange moves one
    row per (type, distinct cent) per block, never one per event; the
    driver folds a table bounded by |types| x |distinct cents|."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    hist = (ds.map_batches(_type_cents_hist_partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values(["event_type", "cents"])
            .reset_index(drop=True))
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])

        def pick(q: float) -> int:
            rank = min(total, max(1, math.ceil(q * total)))
            return int(g["cents"].iloc[int(np.searchsorted(cum, rank))])

        rows.append((etype, pick(0.5), pick(0.9), total))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "p50_cents": pa.array([r[1] for r in rows], pa.int64()),
        "p90_cents": pa.array([r[2] for r in rows], pa.int64()),
        "n_events": pa.array([r[3] for r in rows], pa.int64())})


def q_events_value_percentiles(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    hist = (ds.map_batches(_cents_hist_partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values("cents").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])

    def pick(q: float) -> int:
        # DuckDB quantile_disc: 1-indexed rank ceil(q*n) (double arithmetic),
        # verified empirically across n in {3..10} x q in {.1...99}
        rank = min(total, max(1, math.ceil(q * total)))
        return int(hist["cents"].iloc[int(np.searchsorted(cum, rank))])

    return pa.table({
        "p50_cents": pa.array([pick(0.5)], pa.int64()),
        "p90_cents": pa.array([pick(0.9)], pa.int64()),
        "p99_cents": pa.array([pick(0.99)], pa.int64()),
        "n_events": pa.array([total], pa.int64()),
    })


# ---------------------------------------------------------------------------
# pivot-style conditional aggregation: order counts by status as columns
# (COUNT(*) FILTER ...).  One partial row per batch, Sum-combined — no
# groupby shuffle at all.
# ---------------------------------------------------------------------------

def q_orders_status_pivot(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        st = t.column("o_orderstatus")

        def cnt(v: str) -> int:
            return pc.sum(pc.cast(pc.equal(st, v), pa.int64())).as_py() or 0

        return pa.table({"p_open": pa.array([cnt("O")], pa.int64()),
                         "p_fulfilled": pa.array([cnt("F")], pa.int64()),
                         "p_pending": pa.array([cnt("P")], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("p_open", alias_name="n_open"),
        Sum("p_fulfilled", alias_name="n_fulfilled"),
        Sum("p_pending", alias_name="n_pending"))
    return pa.table({
        "n_open": pa.array([agg["n_open"]], pa.int64()),
        "n_fulfilled": pa.array([agg["n_fulfilled"]], pa.int64()),
        "n_pending": pa.array([agg["n_pending"]], pa.int64()),
    })


# ---------------------------------------------------------------------------
# range/band join: classify each event's value into fixed tiers (broadcast
# boundary array + one vectorized searchsorted per batch — the banded-join
# shape; no shuffle of the boundaries, partial agg before the tiny groupby).
# ---------------------------------------------------------------------------

TIER_BOUNDS = np.array([25.0, 50.0, 100.0])
TIER_NAMES = np.array(["t0_low", "t1_mid", "t2_high", "t3_top"])


def _tier_partial(batch: pa.Table) -> pa.Table:
    v = batch.column("value").to_numpy()
    tier = TIER_NAMES[np.searchsorted(TIER_BOUNDS, v, side="right")]
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64())
    t = pa.table({"tier": pa.array(tier, pa.string()), "cents": cents})
    g = t.group_by("tier").aggregate([("cents", "sum"), ("cents", "count")])
    return g.rename_columns(["tier", "p_cents", "p_n"])


def q_events_value_tiers(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return (ds.map_batches(_tier_partial, batch_format="pyarrow")
            .groupby("tier")
            .aggregate(Sum("p_cents", alias_name="value_cents"),
                       Sum("p_n", alias_name="n_events"))
            .to_pandas())


# ---------------------------------------------------------------------------
# set ops (INTERSECT / EXCEPT over key sets): customers ordering in 1995,
# in 1996, or both.  Per-batch max-flag partials -> per-key flag groupby ->
# flag-combination counts (a second, single-row reduction).
# ---------------------------------------------------------------------------

def _year_flags_partial(batch: pa.Table) -> pa.Table:
    yr = pc.year(batch.column("o_orderdate"))
    t = pa.table({
        "o_custkey": batch.column("o_custkey"),
        "a": pc.cast(pc.equal(yr, 1995), pa.int64()),
        "b": pc.cast(pc.equal(yr, 1996), pa.int64()),
    })
    g = t.group_by("o_custkey").aggregate([("a", "max"), ("b", "max")])
    return g.rename_columns(["o_custkey", "pa_", "pb_"])


def _flag_combo_counts(t: pa.Table) -> pa.Table:
    if "a" not in t.column_names:  # schema-less empty aggregate block
        z = pa.array([0], pa.int64())
        return pa.table({"p_both": z, "p_only_a": z, "p_only_b": z})
    a = t.column("a").to_numpy().astype(bool)
    b = t.column("b").to_numpy().astype(bool)
    return pa.table({
        "p_both": pa.array([int(np.sum(a & b))], pa.int64()),
        "p_only_a": pa.array([int(np.sum(a & ~b))], pa.int64()),
        "p_only_b": pa.array([int(np.sum(~a & b))], pa.int64()),
    })


def q_repeat_customers(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    flags = (ds.map_batches(_year_flags_partial, batch_format="pyarrow")
             .groupby("o_custkey")
             .aggregate(Max("pa_", alias_name="a"), Max("pb_", alias_name="b")))
    agg = flags.map_batches(_flag_combo_counts, batch_format="pyarrow").aggregate(
        Sum("p_both", alias_name="n_both"),
        Sum("p_only_a", alias_name="n_only_1995"),
        Sum("p_only_b", alias_name="n_only_1996"))
    return pa.table({
        "n_both": pa.array([agg["n_both"]], pa.int64()),
        "n_only_1995": pa.array([agg["n_only_1995"]], pa.int64()),
        "n_only_1996": pa.array([agg["n_only_1996"]], pa.int64()),
    })


# ---------------------------------------------------------------------------
# corpus term frequency (boilerplate-token mining over the web-text corpus):
# explode words with a per-batch value_counts partial — the shuffle moves one
# (word, count) row per distinct word per block, never one row per token.
# ---------------------------------------------------------------------------

def _word_freq_partial(batch: pd.DataFrame) -> pd.DataFrame:
    words = batch["text"].str.split().explode().dropna()
    vc = words.value_counts()
    return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                         "pn": vc.to_numpy(dtype="int64")})


def q_top_words(sf_dir: str):
    freq = (_docs(sf_dir, ["text"])
            .map_batches(_word_freq_partial, batch_format="pandas")
            .groupby("w").aggregate(Sum("pn", alias_name="n")))
    return _topk(freq, "n", "w", 20)[["w", "n"]]


# ---------------------------------------------------------------------------
# within-doc repetition (Gopher-style quality signal): distinct-word ratio
# per document.  Embarrassingly parallel per-doc kernel — no cross-doc state.
# ---------------------------------------------------------------------------

def _diversity_batch(batch: pd.DataFrame) -> pd.DataFrame:
    words = batch["text"].str.split()
    nw = words.str.len().fillna(0).astype("int64")
    ndw = words.apply(
        lambda ws: len(set(ws)) if isinstance(ws, list) else 0).astype("int64")
    ratio = np.where(nw.to_numpy() > 0,
                     ndw.to_numpy() / np.maximum(nw.to_numpy(), 1), 0.0)
    return pd.DataFrame({"doc_id": batch["doc_id"], "n_words": nw,
                         "n_distinct_words": ndw, "distinct_ratio": ratio})


def q_word_diversity(sf_dir: str):
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(_diversity_batch, batch_format="pandas",
                         batch_size=8192)
            .to_pandas())


# ---------------------------------------------------------------------------
# exact duplicated n-gram spans (ExactSubstr-style dedup signal, after Lee
# et al. 2022, "Deduplicating Training Data Makes Language Models Better"):
# word 8-grams that occur in >= 2 distinct documents, plus a per-document
# duplicated-span coverage score.  Shape: per-batch (gram, doc, occ)
# partials are pre-aggregated before any exchange (one row per distinct
# gram per doc, never one per token position); grams are coarse-bucketed by
# crc32 so each bucket runs ONE vectorized pandas groupby (no per-gram UDF
# dispatch), and only bounded aggregates ever reach the driver.  At
# 10^12-doc scale, swap the string group key for a 128-bit content hash and
# resolve the surviving gram strings with a second semi-join pass — strings
# are kept here because the oracle output includes them and the shuffle
# payload is already collapsed to one row per (distinct gram, doc).
# ---------------------------------------------------------------------------

DUP_NGRAM_K = 8


def _gram_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """One (gram, doc_id, occ) row per DISTINCT gram per doc in the batch —
    the vectorized explode is _grams_frame_all (decontamination shares it),
    collapsed to counts before anything crosses the network."""
    g = _grams_frame_all(batch, DUP_NGRAM_K)
    if g.empty:
        return pd.DataFrame({"g": pd.Series([], dtype=object),
                             "doc_id": pd.Series([], dtype="int64"),
                             "occ": pd.Series([], dtype="int64")})
    out = g.groupby(["gram", "doc_id"], as_index=False, sort=False).size()
    return (out.rename(columns={"gram": "g", "size": "occ"})
            .astype({"occ": "int64"})[["g", "doc_id", "occ"]])


def _add_gram_bucket(tb: pa.Table, nb: int) -> pa.Table:
    import zlib as _zlib
    b = np.fromiter((_zlib.crc32(g.encode()) % nb
                     for g in tb.column("g").to_pylist()),
                    dtype=np.int64, count=tb.num_rows)
    return tb.append_column("gbucket", pa.array(b, pa.int64()))


def q_dup_ngrams_topk(sf_dir: str):
    """Top-100 corpus-duplicated word 8-grams by (n_docs, n_occ).  The
    post-filter result is bounded by the corpus duplication rate, so the
    driver merge is small; a gram's doc set never leaves its bucket."""
    nb = _session_buckets()

    def bucket_agg(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("g", sort=False).agg(
            n_docs=("doc_id", "nunique"), n_occ=("occ", "sum"))
        agg = agg[agg["n_docs"] >= 2].reset_index()
        return agg.astype({"n_docs": "int64", "n_occ": "int64"})

    dup = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(_gram_partials, batch_format="pandas")
           .map_batches(lambda t: _add_gram_bucket(t, nb),
                        batch_format="pyarrow")
           .groupby("gbucket")
           .map_groups(bucket_agg, batch_format="pandas")
           .to_pandas())
    return (dup.sort_values(["n_docs", "n_occ", "g"],
                            ascending=[False, False, True])
            .head(100).reset_index(drop=True)[["g", "n_docs", "n_occ"]])


def q_doc_dup_ngram_coverage(sf_dir: str):
    """Per-document ExactSubstr contamination score: the fraction of a
    doc's word 8-grams that occur in >= 2 distinct docs corpus-wide.  The
    bucket pass folds (gram, doc, occ) rows to (doc, total, dup) partials,
    so the second exchange is keyed by doc and carries two ints per
    (bucket, doc) — text and grams never cross it."""
    nb = _session_buckets()

    def bucket_doc_partials(g: pd.DataFrame) -> pd.DataFrame:
        dup_g = g.groupby("g", sort=False)["doc_id"].nunique() >= 2
        is_dup = g["g"].map(dup_g).to_numpy()
        occ = g["occ"].to_numpy()
        out = pd.DataFrame({"doc_id": g["doc_id"], "p_total": occ,
                            "p_dup": np.where(is_dup, occ, 0)})
        return out.groupby("doc_id", as_index=False).sum().astype(
            {"p_total": "int64", "p_dup": "int64"})

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized in-bucket fold: Dataset.aggregate's per-group
        # accumulate was measured ~quadratic in rows/block (22.9 s for
        # the 155k partial rows here); the bucketed pandas sum is exact
        # for these integer columns and runs in well under a second
        out = (g.groupby("doc_id", as_index=False)[["p_total", "p_dup"]]
               .sum().astype({"p_total": "int64", "p_dup": "int64"}))
        return out.rename(columns={"p_total": "n_grams", "p_dup": "n_dup"})

    per_doc = (_docs(sf_dir, ["doc_id", "text"])
               .map_batches(_gram_partials, batch_format="pandas")
               .map_batches(lambda t: _add_gram_bucket(t, nb),
                            batch_format="pyarrow")
               .groupby("gbucket")
               .map_groups(bucket_doc_partials, batch_format="pandas")
               .map_batches(lambda t: t.append_column(
                   "dbucket", _mod_bucket(t.column("doc_id"), nb)),
                   batch_format="pyarrow")
               .groupby("dbucket")
               .map_groups(doc_fold, batch_format="pandas")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    per_doc["dup_coverage"] = (per_doc["n_dup"].to_numpy().astype(np.float64)
                               / per_doc["n_grams"].to_numpy())
    return per_doc[["doc_id", "n_grams", "n_dup", "dup_coverage"]]


# ---------------------------------------------------------------------------
# semi-structured (JSON) field extraction + rollup: pull props.k out of the
# JSON string column with one vectorized regex per batch, partial-agg by
# event_type.  The parse happens inside the scan-side map_batches, so only
# (type, sum, count) partials cross the network.
# ---------------------------------------------------------------------------

def _props_partial(batch: pd.DataFrame) -> pd.DataFrame:
    k = (batch["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
         .astype("int64"))
    df = pd.DataFrame({"event_type": batch["event_type"], "k": k})
    return df.groupby("event_type", as_index=False).agg(
        p_k=("k", "sum"), p_n=("k", "size"))


def q_props_value_by_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    return (ds.map_batches(_props_partial, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("p_k", alias_name="k_sum"),
                       Sum("p_n", alias_name="n_events"))
            .to_pandas())


# ---------------------------------------------------------------------------
# text normalization: NFC + whitespace collapse + trim, reporting the
# normalized length.  Arrow kernels end-to-end for ASCII (the overwhelming
# majority of a web corpus after extraction); non-ASCII strings fall back to
# unicodedata.normalize because THIS build's pc.utf8_normalize(form="NFC")
# does not compose combining marks (verified: "cafe\\u0301" stays 5 cp),
# while DuckDB's nfc_normalize / the Unicode standard compose to 4.
# ---------------------------------------------------------------------------

def _normalize_batch(batch: pa.Table) -> pa.Table:
    txt = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(batch.column("text"), r"\s+", " "))
    if not pc.all(pc.string_is_ascii(txt)).as_py():
        import unicodedata

        txt = pa.array(
            [v if v is None or v.isascii() else unicodedata.normalize("NFC", v)
             for v in txt.to_pylist()], pa.string())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars_norm": pc.cast(pc.utf8_length(txt), pa.int64()),
    })


def q_text_normalize(sf_dir: str):
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(_normalize_batch, batch_format="pyarrow",
                         batch_size=8192)
            .to_pandas())


# ---------------------------------------------------------------------------
# lag window: per-user inter-event gap (ts - lag(ts) OVER user ORDER BY ts).
# Same user-hash bucket co-location as q_user_sessions; the first event of
# each user has a NULL gap, exactly like SQL lag().
# ---------------------------------------------------------------------------

def _gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ts_us = g["ts"].astype("int64")
    gap = ts_us.diff()
    gap[g["user_id"].ne(g["user_id"].shift())] = np.nan  # first event per user
    return pd.DataFrame({"event_id": g["event_id"], "user_id": g["user_id"],
                         "gap_us": gap.astype("Int64")})


def q_user_event_gaps(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    return ds.groupby("ubucket").map_groups(_gaps_bucket,
                                            batch_format="pandas").to_pandas()


# ---------------------------------------------------------------------------
# hopping (sliding) window aggregate: 2-hour windows advancing every hour —
# each event lands in exactly two windows.  The fan-out is done scan-side
# (duplicate the partial rows with the two window starts), so the shuffle
# still moves one partial row per (window, block), never per event.
# ---------------------------------------------------------------------------

_HOUR_US = 3_600 * 1_000_000


def _hopping_partial(batch: pa.Table) -> pa.Table:
    ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
    hour_us = (ts_us // _HOUR_US) * _HOUR_US  # ts > 0: floor == trunc
    starts = np.concatenate([hour_us, hour_us - _HOUR_US])
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64()).to_numpy()
    both = pa.table({
        "window_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
        "cents": pa.array(np.concatenate([cents, cents]), pa.int64()),
    })
    g = both.group_by("window_start").aggregate(
        [("cents", "sum"), ("cents", "count")])
    return g.rename_columns(["window_start", "p_cents", "p_n"])


def q_events_hopping_2h(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    out = (ds.map_batches(_hopping_partial, batch_format="pyarrow")
           .groupby("window_start")
           .aggregate(Sum("p_cents", alias_name="total_value_cents"),
                      Sum("p_n", alias_name="n_events"))
           .to_pandas())
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


# ---------------------------------------------------------------------------
# broadcast semi join: orders whose customer is in one market segment —
# the filter side is a broadcast custkey hash set, so nothing shuffles and
# the fact table is reduced at the scan.
# ---------------------------------------------------------------------------

class _SegmentSemi:
    def __init__(self, keys_ref):
        self.keys = ray.get(keys_ref)  # sorted int64 custkeys (one segment)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy()
        if len(self.keys) == 0:
            hit = np.zeros(len(ck), dtype=bool)
        else:
            idx = np.searchsorted(self.keys, ck)
            idx[idx == len(self.keys)] = 0
            hit = self.keys[idx] == ck
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64()).to_numpy()
        return pa.table({
            "p_n": pa.array([int(hit.sum())], pa.int64()),
            "p_cents": pa.array([int(cents[hit].sum())], pa.int64()),
        })


def q_building_orders(sf_dir: str, *, route: str | None = None):
    """Size-routed semi join: below _BCAST_DIM_MAX_ROWS the one-segment
    custkey set is broadcast and the probe fuses into the orders scan;
    past it per-custkey order partials meet the segment-filtered customer
    read (predicate pushed to parquet) in a hash-partitioned join."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    if route == "broadcast":
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        keys = np.sort(cust.filter(
            pc.equal(cust.column("c_mktsegment"), "BUILDING"))
            .column("c_custkey").to_numpy())
        keys_ref = ray.put(keys)
        def semi_partial(batch: pa.Table) -> pa.Table:
            # task mode: ray.get is a node-local zero-copy view per batch
            return _SegmentSemi(keys_ref)(batch)

        agg = ds.map_batches(
            semi_partial, batch_format="pyarrow",
        ).aggregate(Sum("p_n", alias_name="n_orders"),
                    Sum("p_cents", alias_name="revenue_cents"))
    else:
        from ..rayops import fit_for_join

        def order_partial(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64())
            g = (pa.table({"o_custkey": t.column("o_custkey"),
                           "cents": cents})
                 .group_by("o_custkey")
                 .aggregate([("cents", "sum"), ("cents", "count")]))
            return g.rename_columns(["o_custkey", "p_cents", "p_n"])

        part_schema = pa.schema([("o_custkey", pa.int64()),
                                 ("p_cents", pa.int64()),
                                 ("p_n", pa.int64())])
        keys_schema = pa.schema([("c_custkey", pa.int64())])
        per_cust = fit_for_join(
            ds.map_batches(order_partial, batch_format="pyarrow"),
            part_schema)
        seg_keys = fit_for_join(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_custkey"],
                filter=(pc.field("c_mktsegment") == "BUILDING")),
            keys_schema)
        if seg_keys.count() == 0:  # join rejects a fully-empty side
            agg = {"n_orders": 0, "revenue_cents": 0}
        else:
            agg = (per_cust.join(seg_keys, join_type="inner",
                                 num_partitions=_join_parts(sf_dir,
                                                            "orders"),
                                 on=("o_custkey",), right_on=("c_custkey",))
                   .aggregate(Sum("p_n", alias_name="n_orders"),
                              Sum("p_cents", alias_name="revenue_cents")))
    # Sum over an empty dataset yields None; coalesce so the hashjoin route
    # returns the same {0, 0} row the broadcast route produces when no
    # BUILDING customer has orders.
    return pa.table({
        "n_orders": pa.array([int(agg["n_orders"] or 0)], pa.int64()),
        "revenue_cents": pa.array([int(agg["revenue_cents"] or 0)],
                                  pa.int64()),
    })


# ---------------------------------------------------------------------------
# near-dup clustering + corpus curation (pipelines/curate.py): connected
# components over verified MinHash-LSH pairs with canonical-doc election,
# and the end-to-end keep/drop pipeline (exact dedup + near-dup + quality
# floor, reason-tagged).  Rows-only: the LSH candidate generation is not
# SQL-expressible; tests/test_curation.py pins planted-duplicate behavior.
# ---------------------------------------------------------------------------

def q_near_dup_clusters(sf_dir: str):
    from .curate import assign_clusters, near_dup_canonical_map

    docs = _docs(sf_dir, ["doc_id", "text"])
    canon = near_dup_canonical_map(docs, threshold=0.5)
    return assign_clusters(_docs(sf_dir, ["doc_id"]), canon).to_pandas()


def q_curation(sf_dir: str):
    from .curate import curate_documents

    out = curate_documents(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_curation_extended(sf_dir: str):
    """Gopher/FineWeb-style extended filter chain: base curation reasons
    plus high_repetition and low_alpha floors (rows-only: composes the
    near-dup pipeline; reason precedence pinned in tests/test_curation.py)."""
    from .curate import curate_documents_extended

    out = curate_documents_extended(
        _docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# term-feature extraction (tf/df): each document's top-5 terms by in-doc
# frequency, joined to the corpus-wide document frequency of those terms.
# tf is computed entirely inside the scan batch (documents never span
# blocks); df is a vocabulary-sized partial-count shuffle; the two meet in
# a native hash-partitioned join keyed on the term string.  All-integer
# ranking (tf desc, term asc) keeps the output hash-stable — no
# transcendental tf-idf floats whose last ulp could differ between libm
# and the oracle.
# ---------------------------------------------------------------------------

def _doc_tf_top5(batch: pd.DataFrame) -> pd.DataFrame:
    ex = (batch[["doc_id"]]
          .join(batch["text"].str.split().rename("w"))
          .explode("w").dropna(subset=["w"]))
    tf = (ex.groupby(["doc_id", "w"], as_index=False).size()
          .rename(columns={"size": "tf"}))
    tf["tf"] = tf["tf"].astype("int64")
    return (tf.sort_values(["doc_id", "tf", "w"],
                           ascending=[True, False, True])
            .groupby("doc_id", sort=False).head(5))


def _docfreq_partial(batch: pd.DataFrame) -> pd.DataFrame:
    ex = (batch[["doc_id"]]
          .join(batch["text"].str.split().rename("w"))
          .explode("w").dropna(subset=["w"]))
    vc = ex.drop_duplicates()["w"].value_counts()
    return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                         "pdf": vc.to_numpy(dtype="int64")})


def q_doc_top_terms(sf_dir: str):
    from ..config import cluster_cpus

    nparts = _join_parts(sf_dir, "documents")
    from ..rayops import fit_for_join

    df_schema = pa.schema([("w", pa.string()), ("df", pa.int64())])

    docs = _docs(sf_dir, ["doc_id", "text"])
    df_ds = fit_for_join(  # empty/zero-column blocks poison the join
        docs.map_batches(_docfreq_partial, batch_format="pandas")
        .groupby("w").aggregate(Sum("pdf", alias_name="df")),
        df_schema)
    tf_ds = docs.map_batches(_doc_tf_top5, batch_format="pandas")
    joined = tf_ds.join(df_ds, join_type="inner", num_partitions=nparts,
                        on=("w",), right_on=("w",))
    return (joined.to_pandas()[["doc_id", "w", "tf", "df"]]
            .sort_values(["doc_id", "w"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# grouped exact percentiles: median value per event_type via the same
# integer-cents histogram trick, one nearest-rank fold per group.
# ---------------------------------------------------------------------------

def _type_cents_partial(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64())
    t = pa.table({"event_type": batch.column("event_type"), "cents": cents})
    g = t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])
    return g.rename_columns(["event_type", "cents", "pn"])


def q_value_p50_by_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    hist = (ds.map_batches(_type_cents_partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("pn", alias_name="n"))
            .to_pandas())
    rows = []
    for etype, g in hist.sort_values("cents").groupby("event_type"):
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        rank = min(total, max(1, math.ceil(0.5 * total)))
        rows.append((etype, int(g["cents"].iloc[int(np.searchsorted(cum, rank))]),
                     total))
    out = pd.DataFrame(rows, columns=["event_type", "p50_cents", "n_events"])
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# approximate count-distinct (HyperLogLog, functions/sketch.py): per-batch
# register partials -> groupby(register).max -> driver folds <= 4096 rows.
# Shuffle volume is O(4096) regardless of input size — the scale-safe
# COUNT(DISTINCT) for 100-TB keys.  No SQL oracle (approximate by design);
# tests/test_sketch.py pins accuracy against the exact count.
# ---------------------------------------------------------------------------

def q_approx_distinct_custkeys(sf_dir: str):
    from ..functions.sketch import hll_estimate, hll_partial

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    merged = (ds.map_batches(
        lambda t: hll_partial(t.column("o_custkey").to_numpy()),
        batch_format="pyarrow")
        .groupby("reg").aggregate(Max("rho", alias_name="rho"))
        .to_pandas())
    est = hll_estimate(merged["reg"].to_numpy(), merged["rho"].to_numpy())
    return pa.table({"approx_n_custkeys": pa.array([int(round(est))],
                                                   pa.int64())})


# ---------------------------------------------------------------------------
# per-domain quota sampling (crawl curation): cap every source at K documents,
# keeping the K lowest doc_ids — the "at most N pages per domain" rule every
# web-corpus recipe applies before training.  Same scale shape as
# q_top_events_per_user: partial head(K) per (batch, source) bounds the
# shuffle to <= K * sources * blocks rows even with millions of domains; the
# grouped final pass re-ranks candidates.  No driver-side merge.
# ---------------------------------------------------------------------------

DOMAIN_QUOTA_K = 10


def _quota_partial(batch: pd.DataFrame) -> pd.DataFrame:
    out = (batch.sort_values(["source", "doc_id"])
           .groupby("source", sort=False).head(DOMAIN_QUOTA_K))
    # coarse-bucket the domains to O(cpus) groups: grouping the final pass
    # by raw source would be per-GROUP UDF dispatch over millions of
    # domains at scale (the measured map_groups bottleneck _coarse_buckets
    # documents); within a bucket the re-rank stays one vectorized pandas
    # groupby-head
    import zlib

    nb = _session_buckets()
    out = out.copy()
    out["sbucket"] = (out["source"].map(lambda s: zlib.crc32(s.encode()))
                      .astype("int64") % nb).astype("int32")
    return out


def _quota_bucket_final(g: pd.DataFrame) -> pd.DataFrame:
    return (g.sort_values(["source", "doc_id"])
            .groupby("source", sort=False)
            .head(DOMAIN_QUOTA_K)[["doc_id", "source", "n_chars"]])


def q_domain_quota(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])
    partial = ds.map_batches(_quota_partial, batch_format="pandas")
    out = partial.groupby("sbucket").map_groups(_quota_bucket_final,
                                                batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# corpus boilerplate detection: top repeated word bigrams.  The per-batch
# partial explodes each text into a flat word array (vectorized pandas
# split/explode, no per-row Python loop), pairs adjacent words that share a
# doc, and pre-counts locally — one (bigram, count) partial row per distinct
# bigram per batch crosses the shuffle, then the standard partial-agg groupby
# + distributed top-k.  This is the signal behind "drop documents dominated
# by templated n-grams" in web-corpus cleaning.
# ---------------------------------------------------------------------------

def _bigram_partial(batch: pd.DataFrame) -> pd.DataFrame:
    words = batch["text"].str.strip().str.split()
    ex = words.explode().dropna()
    empty = pd.DataFrame({"bg": pd.Series([], dtype=object),
                          "pn": pd.Series([], dtype="int64")})
    if len(ex) < 2:
        return empty
    doc = ex.index.to_numpy()
    w = ex.to_numpy()
    same = doc[:-1] == doc[1:]  # adjacent words from the same document
    if not same.any():
        return empty
    bg = (pd.Series(w[:-1][same], dtype=object) + " "
          + pd.Series(w[1:][same], dtype=object))
    vc = bg.value_counts()
    return pd.DataFrame({"bg": vc.index.to_numpy(dtype=object),
                         "pn": vc.to_numpy().astype("int64")})


def q_top_bigrams(sf_dir: str):
    freq = (_docs(sf_dir, ["text"])
            .map_batches(_bigram_partial, batch_format="pandas")
            .groupby("bg").aggregate(Sum("pn", alias_name="n")))
    return _topk(freq, "n", "bg", 20)[["bg", "n"]]


# ---------------------------------------------------------------------------
# per-source corpus profile with an EXACT grouped count-distinct
# (source -> n distinct langs): the classic two-level exchange.  Level 1
# combines per-batch (source, lang) partials and shuffles one row per
# distinct (source, lang) pair; level 2 groups the (already unique) pairs by
# source, so count(rows) == count(distinct lang) with no per-row set state.
# ---------------------------------------------------------------------------

def _src_lang_partial(batch: pa.Table) -> pa.Table:
    g = (batch.select(["source", "lang", "n_chars"])
         .group_by(["source", "lang"])
         .aggregate([("n_chars", "sum"), ("n_chars", "count")]))
    return g.rename_columns(["source", "lang", "p_chars", "p_docs"])


def q_source_profiles(sf_dir: str):
    ds = _docs(sf_dir, ["source", "lang", "n_chars"])
    per_sl = (ds.map_batches(_src_lang_partial, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("p_docs", alias_name="sl_docs"),
                         Sum("p_chars", alias_name="sl_chars")))
    prof = (per_sl.groupby("source")
            .aggregate(Sum("sl_docs", alias_name="n_docs"),
                       Sum("sl_chars", alias_name="total_chars"),
                       Count(alias_name="n_langs")))
    return prof.to_pandas().sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-key rank window: dense_rank of each event's value within its user
# (ties share a rank, no gaps).  Same hash-bucket co-location as the other
# per-user windows; the rank itself is one vectorized factorize over the
# (user, -value) sort within the bucket — integer output, hash-stable.
# ---------------------------------------------------------------------------

def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["user_id", "value", "event_id"],
                      ascending=[True, False, True]).reset_index(drop=True)
    # tie detection on the RAW doubles (exactly DuckDB's dense_rank tie
    # semantics); a new distinct value within the user bumps the rank
    new_u = g["user_id"].ne(g["user_id"].shift())
    new_v = new_u | g["value"].ne(g["value"].shift())
    rank = new_v.groupby(g["user_id"], sort=False).cumsum()
    return pd.DataFrame({"event_id": g["event_id"], "user_id": g["user_id"],
                         "value": g["value"],
                         "value_rank": rank.astype("int64")})


def q_user_value_rank(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    return ds.groupby("ubucket").map_groups(_rank_bucket,
                                            batch_format="pandas").to_pandas()


# ---------------------------------------------------------------------------
# keyset (cursor) pagination: the scale-safe replacement for OFFSET —
# "50 events after cursor (ts0, event_id0)" is a pushed-down range filter
# plus an ASCENDING distributed top-k, independent of how deep the cursor
# sits; OFFSET-based pages re-scan and re-sort everything before the page.
# ---------------------------------------------------------------------------

CURSOR_TS = np.datetime64("2024-01-15T12:00:00", "us")
CURSOR_ID = 0


def q_events_after_cursor(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
        filter=pds.field("ts") >= pa.scalar(CURSOR_TS),  # coarse pushdown
    )

    def after_cursor(t: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.greater(t.column("ts"), pa.scalar(CURSOR_TS)),
            pc.and_(pc.equal(t.column("ts"), pa.scalar(CURSOR_TS)),
                    pc.greater(t.column("event_id"),
                               pa.scalar(CURSOR_ID, pa.int64()))))
        return t.filter(keep)

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(["ts", "event_id"]).head(50)

    cand = (ds.map_batches(after_cursor, batch_format="pyarrow")
            .map_batches(local_first, batch_format="pandas").to_pandas())
    out = (cand.sort_values(["ts", "event_id"]).head(50)
           .reset_index(drop=True))
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out[["event_id", "ts", "user_id"]]


# ---------------------------------------------------------------------------
# fixed-width histogram over a double column: partial bin-counts inside
# map_batches (one row per bin per batch), then a tiny shuffled groupby.
# floor(value/width) on IEEE doubles is order-independent -> hash-stable.
# ---------------------------------------------------------------------------

def _hist_partial(t: pa.Table) -> pa.Table:
    bins = pc.cast(pc.floor(pc.divide(t.column("value"), 10.0)), pa.int64())
    g = pa.table({"bin": bins}).group_by("bin").aggregate([("bin", "count")])
    return g.rename_columns(["bin", "p_n"])


def q_value_histogram(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return (ds.map_batches(_hist_partial, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("p_n", alias_name="n"))
            .to_pandas().sort_values("bin").reset_index(drop=True))


# ---------------------------------------------------------------------------
# ROLLUP grouping sets: ONE distributed fine-grained groupby (the partial/
# combiner pattern), then the super-aggregate levels are derived from that
# tiny fine table on the driver — the rollup never re-shuffles the fact
# table, which is how grouping sets should be planned at 100 TB.
# ---------------------------------------------------------------------------

def _rollup_partial(t: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                    pa.int64())
    g = (pa.table({"o_orderpriority": t.column("o_orderpriority"),
                   "o_orderstatus": t.column("o_orderstatus"),
                   "cents": cents})
         .group_by(["o_orderpriority", "o_orderstatus"])
         .aggregate([("cents", "sum"), ("cents", "count")]))
    return g.rename_columns(["o_orderpriority", "o_orderstatus", "p_cents", "p_n"])


def q_orders_rollup(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderstatus",
                                  "o_totalprice"])
    fine = (ds.map_batches(_rollup_partial, batch_format="pyarrow")
            .groupby(["o_orderpriority", "o_orderstatus"])
            .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                       Sum("p_n", alias_name="n_orders"))
            .to_pandas())
    lvl1 = (fine.groupby("o_orderpriority", as_index=False)
            [["revenue_cents", "n_orders"]].sum())
    lvl1["o_orderstatus"] = None
    lvl0 = pd.DataFrame({"o_orderpriority": [None], "o_orderstatus": [None],
                         "revenue_cents": [fine["revenue_cents"].sum()],
                         "n_orders": [fine["n_orders"].sum()]})
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "revenue_cents": pa.array(out["revenue_cents"], pa.int64()),
        "n_orders": pa.array(out["n_orders"], pa.int64()),
    })


# ---------------------------------------------------------------------------
# CCNet-style segment-level dedup with document reassembly: split every doc
# into 10-word segments, keep only each segment's FIRST global occurrence
# (ordered by doc_id, pos), then rebuild documents from their surviving
# segments.  Two hash shuffles, both on coarse O(cpus) buckets: (1) by
# segment-hash to co-locate identical segments, (2) by doc_id to reassemble.
# Docs whose every segment is boilerplate elsewhere disappear — exactly the
# CCNet paragraph-dedup contract.
# ---------------------------------------------------------------------------

SEG_WORDS = 10


def _segment_batch(batch: pa.Table, num_buckets: int) -> pa.Table:
    import zlib

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_id, o_pos, o_seg, o_b = [], [], [], []
    for d, tx in zip(ids, texts):
        ws = tx.split(" ")
        for p in range(0, len(ws), SEG_WORDS):
            seg = " ".join(ws[p:p + SEG_WORDS])
            o_id.append(d)
            o_pos.append(p // SEG_WORDS)
            o_seg.append(seg)
            o_b.append(zlib.crc32(seg.encode()) % num_buckets)
    return pa.table({"doc_id": pa.array(o_id, pa.int64()),
                     "pos": pa.array(o_pos, pa.int64()),
                     "seg": pa.array(o_seg, pa.string()),
                     "sbucket": pa.array(o_b, pa.int32())})


def _seg_keep_first(g: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    g = g.sort_values(["seg", "doc_id", "pos"])
    keep = g.drop_duplicates("seg", keep="first")
    out = keep[["doc_id", "pos", "seg"]].copy()
    out["dbucket"] = (out["doc_id"] % num_buckets).astype("int32")
    return out


def _reassemble_bucket(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["doc_id", "pos"])
    agg = g.groupby("doc_id", sort=True)["seg"].agg(" ".join)
    return pd.DataFrame({"doc_id": agg.index.to_numpy(),
                         "text": agg.to_numpy()})


def q_segment_dedup(sf_dir: str):
    nb = _session_buckets()
    segs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _segment_batch(t, nb), batch_format="pyarrow")
    kept = segs.groupby("sbucket").map_groups(
        lambda g: _seg_keep_first(g, nb), batch_format="pandas")
    out = kept.groupby("dbucket").map_groups(_reassemble_bucket,
                                             batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# context-window chunking: split each doc into fixed 200-char windows for
# training-context packing.  Vectorized across the batch per chunk index
# (one pandas str.slice per index, no per-row loop); flat output keyed
# (doc_id, chunk_id).
# ---------------------------------------------------------------------------

CHUNK_CHARS = 200


def _chunk_batch(b: pd.DataFrame) -> pd.DataFrame:
    lens = b["text"].str.len()
    outs = []
    max_chunks = int(np.ceil(lens.max() / CHUNK_CHARS)) if len(b) else 0
    for i in range(max_chunks):
        sel = lens > i * CHUNK_CHARS
        if not sel.any():
            break
        outs.append(pd.DataFrame({
            "doc_id": b.loc[sel, "doc_id"].to_numpy(),
            "chunk_id": np.full(int(sel.sum()), i, dtype="int64"),
            "chunk": b.loc[sel, "text"].str.slice(
                i * CHUNK_CHARS, (i + 1) * CHUNK_CHARS).to_numpy(),
        }))
    if not outs:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "chunk_id": pd.Series([], dtype="int64"),
                             "chunk": pd.Series([], dtype="object")})
    return pd.concat(outs, ignore_index=True)


def q_doc_chunks(sf_dir: str):
    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(_chunk_batch, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


# sliding-window chunking (size 200, stride 150 -> 50-char overlap): the
# embedding-pipeline standard, so a sentence straddling a boundary appears
# whole in at least one chunk.  Same scan-side shape as _chunk_batch: the
# loop is over CHUNK INDICES (bounded by the longest doc), each iteration
# one vectorized slice over the still-active rows.
OVERLAP_SIZE = 200
OVERLAP_STRIDE = 150


def _overlap_chunk_batch(b: pd.DataFrame) -> pd.DataFrame:
    lens = b["text"].str.len()
    outs = []
    i = 0
    while True:
        # chunk i exists iff i == 0 (every doc emits one chunk, empty text
        # included) or the doc extends past the previous window:
        # len > SIZE + (i-1)*STRIDE
        sel = (lens > OVERLAP_SIZE + (i - 1) * OVERLAP_STRIDE) if i else \
            pd.Series(True, index=b.index)
        if not sel.any():
            break
        start = i * OVERLAP_STRIDE
        outs.append(pd.DataFrame({
            "doc_id": b.loc[sel, "doc_id"].to_numpy(),
            "chunk_id": np.full(int(sel.sum()), i, dtype="int64"),
            "chunk": b.loc[sel, "text"].str.slice(
                start, start + OVERLAP_SIZE).to_numpy(),
        }))
        i += 1
    if not outs:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "chunk_id": pd.Series([], dtype="int64"),
                             "chunk": pd.Series([], dtype="object")})
    return pd.concat(outs, ignore_index=True)


def q_doc_chunks_overlap(sf_dir: str):
    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(_overlap_chunk_batch, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# sequence packing (token-budget binning) via a DISTRIBUTED PREFIX SUM:
# pass 1 computes per-range-bucket token totals (P tiny rows to the driver,
# prefix offsets from those), pass 2 assigns each doc its running-start
# offset + local cumsum inside its bucket.  No global sort, no driver-side
# row loop — the classic two-pass scan shape that holds at 10^12 docs.
# A doc's pack is floor(tokens_before_it / budget): greedy contiguous
# packing in doc_id order, exactly the window-cumsum SQL semantics.
# ---------------------------------------------------------------------------

PACK_BUDGET = 512


def q_sequence_pack(sf_dir: str):
    P = _session_buckets()
    n = _docs(sf_dir, ["doc_id"]).max("doc_id") + 1

    def tok(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "tokens": b["text"].str.split(" ").str.len().astype("int64"),
            "rbucket": (b["doc_id"] * P // n).astype("int32"),
        })

    toks = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tok, batch_format="pandas")
    sums = (toks.groupby("rbucket").aggregate(Sum("tokens", alias_name="btok"))
            .to_pandas().sort_values("rbucket"))
    offsets = dict(zip(sums["rbucket"],
                       sums["btok"].cumsum().shift(fill_value=0).astype("int64")))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        start = offsets[int(g["rbucket"].iloc[0])] \
            + g["tokens"].cumsum() - g["tokens"]
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "tokens": g["tokens"].to_numpy(),
                             "pack_id": (start // PACK_BUDGET)
                             .astype("int64").to_numpy()})

    out = toks.groupby("rbucket").map_groups(assign, batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES), made
# deterministic: the "random" u is a content hash, the key is kept in log
# space (ln(u)/w — same ranking as u^(1/w), no pow) and the weight is
# n_chars, so longer docs are proportionally likelier.  Distributed top-k
# by key per batch + driver merge — the canonical one-pass distributed
# weighted reservoir.  ln(u)/w floats mirror the oracle op-for-op.
# ---------------------------------------------------------------------------

WSAMPLE_K = 20
_U_DENOM = 4294967296.0  # 2^32


def _wsample_batch(b: pd.DataFrame) -> pd.DataFrame:
    # math.log, not np.log: numpy's SIMD log is 1 ulp off libm on some
    # inputs; DuckDB's ln() is libm (the md5 loop is per-row anyway)
    lnu = np.fromiter(
        (math.log((int(hashlib.md5(t.encode()).hexdigest()[:8], 16) + 1)
                  / _U_DENOM) for t in b["text"]),
        dtype=np.float64, count=len(b))
    pri = lnu / b["n_chars"].to_numpy(dtype=np.float64)
    out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "priority": pri})
    return out.sort_values(["priority", "doc_id"],
                           ascending=[False, True]).head(WSAMPLE_K)


def q_weighted_sample(sf_dir: str):
    cand = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
            .map_batches(_wsample_batch, batch_format="pandas").to_pandas())
    return (cand.sort_values(["priority", "doc_id"],
                             ascending=[False, True])
            .head(WSAMPLE_K).reset_index(drop=True))


# ---------------------------------------------------------------------------
# DSIR importance weights: how target-like (lang='en') each doc is under
# hashed bag-of-words language models.  Rows-only: the hashed-bin model is
# not SQL-expressible; the math is pinned by tests/test_dsir.py.
# ---------------------------------------------------------------------------

def q_dsir_weights(sf_dir: str):
    from ..functions.dsir import dsir_weights

    out = dsir_weights(
        _docs(sf_dir, ["doc_id", "lang", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (Okapi, Lucene's idf = ln(1+(N-df+.5)/(df+.5))):
# the keyword-search sibling of q_embedding_knn.  Pass 1 streams per-batch
# partials for the corpus stats (N, total length, per-term df — a handful
# of ints, the combiner pattern); the driver folds them and derives the
# idf constants.  Pass 2 re-streams the same lineage to score every doc
# (term counts via one vectorized explode+pivot per batch, float ops in a
# FIXED order so the DuckDB oracle matches bit-for-bit) and keeps a local
# top-k per batch; the driver merges k*n_blocks candidates — no global
# sort.  At 100 TB both passes are single streaming scans.
# ---------------------------------------------------------------------------

BM25_TERMS = ("merge", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_K = 10


def _bm25_tf(b: pd.DataFrame) -> pd.DataFrame:
    words = b["text"].str.split(" ")
    out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                        "dl": words.str.len().astype("int64").to_numpy()})
    ex = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                       "w": words.to_numpy()}).explode("w")
    sel = ex[ex["w"].isin(BM25_TERMS)]
    piv = (sel.groupby(["doc_id", "w"]).size().unstack(fill_value=0)
           .reindex(columns=list(BM25_TERMS), fill_value=0))
    out = out.merge(piv, left_on="doc_id", right_index=True, how="left")
    for t in BM25_TERMS:
        out[f"tf_{t}"] = out[t].fillna(0).astype("int64") \
            if t in out.columns else np.int64(0)
        out[f"has_{t}"] = (out[f"tf_{t}"] > 0).astype("int64")
    return out[["doc_id", "dl"]
               + [f"tf_{t}" for t in BM25_TERMS]
               + [f"has_{t}" for t in BM25_TERMS]]


def q_bm25_topk(sf_dir: str):
    tf = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _bm25_tf, batch_format="pandas")
    aggs = [Sum("dl", alias_name="dl_sum"), Count(alias_name="n")]
    aggs += [Sum(f"has_{t}", alias_name=f"df_{t}") for t in BM25_TERMS]
    st = tf.aggregate(*aggs)
    n, avgdl = st["n"], st["dl_sum"] / st["n"]
    idf = {t: math.log(1 + (n - st[f"df_{t}"] + 0.5)
                       / (st[f"df_{t}"] + 0.5)) for t in BM25_TERMS}

    def score(b: pd.DataFrame) -> pd.DataFrame:
        dl = b["dl"].to_numpy(dtype=np.float64)
        s = np.zeros(len(b))
        for t in BM25_TERMS:  # fixed term order == the oracle's + assoc
            tfv = b[f"tf_{t}"].to_numpy(dtype=np.float64)
            s = s + idf[t] * (tfv * (BM25_K1 + 1)) / (
                tfv + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
        out = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "score": s})
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(BM25_K)

    cand = tf.map_batches(score, batch_format="pandas").to_pandas()
    return (cand.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(BM25_K).reset_index(drop=True))


# ---------------------------------------------------------------------------
# weekly cohort retention: cohort = a user's first active week; one row per
# (cohort_week, activity_week) with the distinct-user count.  Same user-hash
# bucket co-location as the session windows; within a bucket everything is
# vectorized pandas (transform-min cohort, drop-duplicates pairs, partial
# counts), so the final shuffle moves only (cohort, week, partial_n) rows.
# ---------------------------------------------------------------------------

def _retention_bucket(g: pd.DataFrame) -> pd.DataFrame:
    # Monday-aligned week start, matching DuckDB date_trunc('week', ts)
    week = (g["ts"].dt.normalize()
            - pd.to_timedelta(g["ts"].dt.weekday, unit="D"))
    uw = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                       "week": week.to_numpy()}).drop_duplicates()
    cohort = uw.groupby("user_id")["week"].transform("min")
    out = (pd.DataFrame({"cohort_week": cohort.to_numpy(),
                         "activity_week": uw["week"].to_numpy()})
           .groupby(["cohort_week", "activity_week"], as_index=False)
           .size().rename(columns={"size": "p_n"}))
    out["p_n"] = out["p_n"].astype("int64")
    return out


def q_cohort_retention(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    partials = ds.groupby("ubucket").map_groups(_retention_bucket,
                                                batch_format="pandas")
    out = (partials.groupby(["cohort_week", "activity_week"])
           .aggregate(Sum("p_n", alias_name="n_users")).to_pandas())
    out["cohort_week"] = out["cohort_week"].astype("datetime64[us]")
    out["activity_week"] = out["activity_week"].astype("datetime64[us]")
    return (out.sort_values(["cohort_week", "activity_week"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# percent_rank window per user: (rank_with_gaps - 1) / (n - 1) from exact
# integer ranks — the division is the only float op, so it is bit-identical
# to the oracle's percent_rank.  Single-event users get 0.0 (SQL contract).
# ---------------------------------------------------------------------------

def _pct_rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
    r = g.groupby("user_id")["value"].rank(method="min", ascending=False)
    n = g.groupby("user_id")["value"].transform("count")
    pct = np.where(n > 1, (r - 1) / (n - 1), 0.0)
    return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                         "user_id": g["user_id"].to_numpy(),
                         "pct": pct})


def q_user_value_pct_rank(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = ds.groupby("ubucket").map_groups(_pct_rank_bucket,
                                           batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# deterministic train/val/test split by CONTENT hash (md5 of the text, not
# the doc id): exact duplicates always land in the same split, so the split
# itself can't leak train text into eval.  Pure scan-side map — no shuffle,
# embarrassingly parallel at any scale.  80/10/10.
# ---------------------------------------------------------------------------

def _split_batch(b: pd.DataFrame) -> pd.DataFrame:
    buckets = np.fromiter(
        (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 100
         for t in b["text"]), dtype=np.int64, count=len(b))
    split = np.where(buckets < 80, "train",
                     np.where(buckets < 90, "val", "test"))
    return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                         "split": split})


def q_train_val_split(sf_dir: str):
    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(_split_batch, batch_format="pandas")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# distributed k-means over the embedding column (Lloyd's, one streaming
# pass per iteration, k-row partials — the combiner pattern) and the
# SemDeDup-style semantic near-dup removal built on top of it: cluster id
# is the partition key, all-pairs never crosses clusters.
# ---------------------------------------------------------------------------

def _embs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def q_embedding_kmeans(sf_dir: str):
    from ..functions.similarity import kmeans_assign, kmeans_fit

    ds = _embs(sf_dir)
    cents = kmeans_fit(ds, k=8, iters=5)
    out = (kmeans_assign(ds, cents)
           .map_batches(lambda t: t.select(["vec_id", "cluster"]),
                        batch_format="pyarrow").to_pandas())
    return out.sort_values("vec_id").reset_index(drop=True)


def q_semantic_dedup(sf_dir: str):
    """Survivors of SemDeDup at cosine >= 0.45 (the corpus's planted
    near-dup level, see q_embedding_near_dups).  Rows-only: the k-means
    partition makes membership clustering-dependent by construction."""
    from ..functions.similarity import semantic_dedup

    out = semantic_dedup(_embs(sf_dir), k=8, iters=5,
                         threshold=0.45).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# shared-substring (copy/paste) near-dups via the winnowing sketch: the
# character-level sibling of the MinHash word-shingle pipeline — catches
# docs that embed a long common substring even when word-level Jaccard is
# low (quoted passages, boilerplate blocks).  Same coarse-bucket shuffle
# shape; pairs need >= 2 co-selected minima (one-off hash luck filtered).
# ---------------------------------------------------------------------------

def q_winnow_near_dups(sf_dir: str):
    from ..functions.dedup import winnow_candidate_pairs

    # min_shared calibrated to the synthetic corpus's tiny vocabulary
    # (every doc shares SOME 8-char runs: at sf0.01 the co-selected-minima
    # distribution spans 2..56 with 71k pairs >= 2 but only 22 >= 16).  On
    # real webtext the function default (2) is already selective.
    out = winnow_candidate_pairs(
        _docs(sf_dir, ["doc_id", "text"]), min_shared=16).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_shared_run_pairs(sf_dir: str):
    """Winnow retrieval pinned by an EXTERNAL SQL oracle (round-4 verdict
    item 2): candidate pairs from the winnowing sketch (k=8, window=16 —
    every pair sharing a >= 23-byte run co-selects a minimum, Schleimer
    et al.), then EXACT char-23-gram intersection verification.  The
    verified set is exactly the pairs sharing a >= 23-character run,
    which DuckDB computes brute-force as a substr self-join.

    Bounded to the same deterministic doc_id < 200 subset as
    q_ngram_jaccard_pairs: brute-force SQL over all pairs is the oracle's
    cost, and <= 512 docs also keeps every winnow bucket below the
    degenerate-bucket star cap, so the retrieval guarantee (candidates
    are a SUPERSET of the truth) holds unconditionally."""
    from ..functions.dedup import (verify_pairs_shared_grams,
                                   winnow_candidate_pairs)
    from ..rayops import concat_batches

    def subset(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("doc_id"), 200))

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        subset, batch_format="pyarrow")
    cand = winnow_candidate_pairs(docs, k=8, window=16, min_shared=1)
    verified = verify_pairs_shared_grams(
        cand,
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            subset, batch_format="pyarrow"),
        gram_len=23, min_shared=1)
    out = concat_batches(
        verified.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()),
                   ("n_shared_grams", pa.int64())]))
    return out.take(pc.sort_indices(out, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


# ---------------------------------------------------------------------------
# per-source exact-duplication report: how much of each source is copies.
# Same two-level exchange as q_source_profiles over (source, md5(text))
# pairs; dup_rate is a single int/int division (hash-stable double).
# ---------------------------------------------------------------------------

def _src_hash_partial(batch: pa.Table) -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch.column("text").to_pylist()]
    t = pa.table({"source": batch.column("source"),
                  "text_hash": pa.array(hashes, pa.string())})
    g = t.group_by(["source", "text_hash"]).aggregate([("text_hash", "count")])
    return g.rename_columns(["source", "text_hash", "p_docs"])


def q_dup_rate_by_source(sf_dir: str):
    ds = _docs(sf_dir, ["source", "text"])
    pairs = (ds.map_batches(_src_hash_partial, batch_format="pyarrow",
                            batch_size=8192)
             .groupby(["source", "text_hash"])
             .aggregate(Sum("p_docs", alias_name="sh_docs")))
    out = (pairs.groupby("source")
           .aggregate(Sum("sh_docs", alias_name="n_docs"),
                      Count(alias_name="n_distinct_texts"))
           .to_pandas())
    n = out["n_docs"].to_numpy()
    nd = out["n_distinct_texts"].to_numpy()
    out["dup_rate"] = (n - nd) / n
    return out.sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# adaptive length filter (compute-stat-then-filter): documents above the
# corpus p90 of n_chars.  Phase 1 folds a bounded n_chars histogram (one row
# per distinct length per block crosses the wire) into the quantile_disc
# threshold; phase 2 re-reads with the predicate PUSHED INTO the parquet
# scan — the classic two-phase shape for "filter by a global statistic".
# ---------------------------------------------------------------------------

def q_docs_above_p90(sf_dir: str):
    hist = (_docs(sf_dir, ["n_chars"])
            .map_batches(
                lambda t: t.group_by("n_chars").aggregate([("n_chars", "count")])
                .rename_columns(["n_chars", "pn"]),
                batch_format="pyarrow")
            .groupby("n_chars").aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values("n_chars").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    rank = min(total, max(1, math.ceil(0.9 * total)))  # quantile_disc rank
    thr = int(hist["n_chars"].iloc[int(np.searchsorted(cum, rank))])
    out = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "n_chars"],
                          filter=pds.field("n_chars") > thr).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# hourly distinct users: streaming tumbling window x EXACT count-distinct,
# via the same two-level exchange as q_source_profiles — per-batch distinct
# (hour, user) pairs, a unique-pair groupby, then Count per hour.  The
# shuffle carries one row per distinct pair per block, never one per event.
# ---------------------------------------------------------------------------

def _hour_user_partial(batch: pa.Table) -> pa.Table:
    t = pa.table({"hour": pc.floor_temporal(batch.column("ts"), unit="hour"),
                  "user_id": batch.column("user_id")})
    g = t.group_by(["hour", "user_id"]).aggregate([("user_id", "count")])
    return g.rename_columns(["hour", "user_id", "p_n"]).select(
        ["hour", "user_id"])


def q_events_hourly_users(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    pairs = (ds.map_batches(_hour_user_partial, batch_format="pyarrow")
             .groupby(["hour", "user_id"])
             .aggregate(Count(alias_name="dummy")))
    out = (pairs.groupby("hour")
           .aggregate(Count(alias_name="n_users"))
           .to_pandas())[["hour", "n_users"]]
    out["hour"] = out["hour"].astype("datetime64[us]")  # oracle emits [us]
    return out


# ---------------------------------------------------------------------------
# Gopher-style repetition filter signal: fraction of a document's word
# 3-grams that are repeats of an earlier gram in the SAME document.  High
# values mark boilerplate/templated pages.  Embarrassingly parallel: grams
# explode + per-doc (size, nunique) entirely within the batch, no shuffle;
# the ratio is a single int/int division (hash-stable like word_diversity).
# ---------------------------------------------------------------------------

REP_NGRAM = 3


def _repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    g = _grams_frame_all(batch, REP_NGRAM)
    stats = (g.groupby("doc_id")["gram"]
             .agg(n_grams="size", n_distinct_grams="nunique").reset_index())
    out = batch[["doc_id"]].merge(stats, on="doc_id", how="left")
    out[["n_grams", "n_distinct_grams"]] = (
        out[["n_grams", "n_distinct_grams"]].fillna(0).astype("int64"))
    n = out["n_grams"].to_numpy()
    nd = out["n_distinct_grams"].to_numpy()
    out["dup_ratio"] = np.where(n > 0, (n - nd) / np.maximum(n, 1), 0.0)
    return out


def _grams_frame_all(batch: pd.DataFrame, n: int) -> pd.DataFrame:
    """(doc_id, gram) rows WITH repeats (unlike _grams_frame's distinct)."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "gram": pd.Series([], dtype=object)})
    words = batch["text"].str.strip().str.split()
    ex = words.explode().dropna()
    if len(ex) < n:
        return empty
    idx = ex.index.to_numpy()
    w = ex.to_numpy()
    m = len(w) - n + 1
    valid = idx[:m] == idx[n - 1 :]
    if not valid.any():
        return empty
    gram = pd.Series(w[:m], dtype=object)
    for i in range(1, n):
        gram = gram + " " + pd.Series(w[i : m + i], dtype=object)
    docids = batch["doc_id"].to_numpy()[idx[:m][valid]]
    return pd.DataFrame({"doc_id": docids, "gram": gram.to_numpy()[valid]})


def q_repetition_ratio(sf_dir: str):
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(_repetition_batch, batch_format="pandas",
                         batch_size=8192)
            .to_pandas())


# ---------------------------------------------------------------------------
# language rebalancing (corpus mixing): deterministic stratified sample that
# downsamples the dominant language — keep every 2nd English doc, every 5th
# otherwise.  Pure scan-side vectorized predicate, reproducible in SQL
# (unlike an RNG sample), zero shuffle.
# ---------------------------------------------------------------------------

def _lang_sample_batch(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id")
    is_en = pc.equal(t.column("lang"), "en")
    mod = pc.if_else(is_en, pa.scalar(2, pa.int64()), pa.scalar(5, pa.int64()))
    rem = pc.subtract(ids, pc.multiply(pc.divide(ids, mod), mod))
    return t.filter(pc.equal(rem, 0)).select(["doc_id", "lang", "n_chars"])


def q_lang_rebalance(sf_dir: str):
    return (_docs(sf_dir, ["doc_id", "lang", "n_chars"])
            .map_batches(_lang_sample_batch, batch_format="pyarrow")
            .to_pandas())


# ---------------------------------------------------------------------------
# TPC-H Q3 shape (shipping priority): the classic 3-table pipeline composed
# from this pack's scale primitives — segment custkeys broadcast once
# (ray.put) to prune orders scan-side (no customer shuffle), date filters
# pushed into both parquet scans, lineitem revenue pre-aggregated by
# orderkey BEFORE the single hash join (the exchange carries one row per
# qualifying order, not one per lineitem), then distributed top-10.
# ---------------------------------------------------------------------------

Q3_CUTOFF = np.datetime64("1995-03-15", "us")


def _q3_li_partial(t: pa.Table) -> pa.Table:
    rev = pc.multiply(
        pc.multiply(t.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
        100.0)
    g = (pa.table({"l_orderkey": t.column("l_orderkey"),
                   # half_towards_infinity = DuckDB's tie-away-from-zero
                   "cents": pc.cast(pc.round(
                       rev, round_mode="half_towards_infinity"), pa.int64())})
         .group_by("l_orderkey").aggregate([("cents", "sum")]))
    return g.rename_columns(["l_orderkey", "p_cents"])


def _q3_empty_frame() -> pd.DataFrame:
    """Typed empty Q3 top-10 frame (column order and dtypes match the
    non-empty return path exactly)."""
    return pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "revenue_cents": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_orderpriority": pd.Series([], dtype=object)})


def q_shipping_priority(sf_dir: str, *, route: str | None = None):
    """TPC-H Q3.  The lineitem-orders side is always a hash join; the
    BUILDING-customer semi filter on orders is size-routed: broadcast
    custkey set below _BCAST_DIM_MAX_ROWS, hash-partitioned join against
    the segment-filtered customer read (predicate pushed to parquet) past
    it, so the sf-scaled dimension is never driver-read at 100x scale."""
    import pyarrow.parquet as pq

    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")

    orders_raw = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pds.field("o_orderdate") < pa.scalar(Q3_CUTOFF),
    )
    if route == "broadcast":
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        keys = cust.filter(
            pc.equal(cust.column("c_mktsegment"),
                     "BUILDING")).column("c_custkey")
        keys_ref = ray.put(np.asarray(keys))

        def orders_filter(t: pa.Table) -> pa.Table:
            ks = pa.array(ray.get(keys_ref))  # object-store cached per node
            t = t.filter(pc.is_in(t.column("o_custkey"), value_set=ks))
            return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

        od = orders_raw.map_batches(orders_filter, batch_format="pyarrow")
    else:
        raw_schema = pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.large_string())])
        keys_schema = pa.schema([("c_custkey", pa.int64())])
        seg_keys = fit_for_join(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_custkey"],
                filter=(pc.field("c_mktsegment") == "BUILDING")),
            keys_schema)
        orders_f = fit_for_join(orders_raw, raw_schema)
        # Dataset.join rejects a fully-empty side (invariant noted at the
        # sibling guards, e.g. q_nation_pair_volume): if no customer is in
        # the BUILDING segment or no order predates the cutoff, return the
        # typed empty top-10 frame the broadcast route produces.
        if seg_keys.count() == 0 or orders_f.count() == 0:
            return _q3_empty_frame()
        od = (orders_f
              .join(seg_keys, join_type="inner",
                    num_partitions=_join_parts(sf_dir, "orders"),
                    on=("o_custkey",), right_on=("c_custkey",))
              .map_batches(
                  lambda t: t.select(["o_orderkey", "o_orderdate",
                                      "o_orderpriority"]),
                  batch_format="pyarrow"))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_shipdate") > pa.scalar(Q3_CUTOFF),
    )
    li_agg = (li.map_batches(_q3_li_partial, batch_format="pyarrow")
              .groupby("l_orderkey")
              .aggregate(Sum("p_cents", alias_name="revenue_cents")))

    li_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("revenue_cents", pa.int64())])
    od_schema = pa.schema([("o_orderkey", pa.int64()),
                           ("o_orderdate", pa.timestamp("us")),
                           ("o_orderpriority", pa.string())])
    li_f = fit_for_join(li_agg, li_schema)
    od_f = fit_for_join(od, od_schema)
    # fit_for_join has materialized both sides into block refs, so these
    # counts are cast-only passes; either side can be legitimately empty
    # (no BUILDING customers / no qualifying lineitems) and Dataset.join
    # rejects a fully-empty side.
    if li_f.count() == 0 or od_f.count() == 0:
        return _q3_empty_frame()
    nparts = _join_parts(sf_dir, "lineitem")
    joined = li_f.join(
        od_f, join_type="inner",
        num_partitions=nparts, on=("l_orderkey",), right_on=("o_orderkey",))
    out = _topk(joined, "revenue_cents", "l_orderkey", 10)
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return (out[["l_orderkey", "revenue_cents", "o_orderdate",
                 "o_orderpriority"]].reset_index(drop=True))


# ---------------------------------------------------------------------------
# benchmark decontamination: flag training documents that share any word
# 4-gram with a held-out "test" slice (doc_id % 47 == 0) — the standard
# train/test contamination check applied before training on a web corpus.
# The test-set gram universe is broadcast once via ray.put (real benchmark
# suites are MBs — driver-bounded by construction; a corpus-sized right
# side would instead reuse the distributed semi-join of q_building_orders).
# The train side is one pass: vectorized n-gram explode per batch, set
# membership against the broadcast array, per-doc counts finalized WITHIN
# the batch (a doc is one row), so no shuffle at all.
# ---------------------------------------------------------------------------

DECON_TEST_MOD = 47
DECON_NGRAM = 4


def _mod_filter(t: pa.Table, mod: int, keep_zero: bool) -> pa.Table:
    ids = t.column("doc_id")
    rem = pc.subtract(ids, pc.multiply(pc.divide(ids, mod), mod))
    m = pc.equal(rem, 0)
    return t.filter(m if keep_zero else pc.invert(m))


def _grams_frame(batch: pd.DataFrame, n: int = DECON_NGRAM) -> pd.DataFrame:
    """Distinct (doc_id, gram) rows per document: explode words, build the
    n-gram windows with n shifted views (no per-row Python loop)."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "gram": pd.Series([], dtype=object)})
    words = batch["text"].str.strip().str.split()
    ex = words.explode().dropna()
    if len(ex) < n:
        return empty
    idx = ex.index.to_numpy()
    w = ex.to_numpy()
    m = len(w) - n + 1
    valid = idx[:m] == idx[n - 1 :]  # window stays inside one document
    if not valid.any():
        return empty
    gram = pd.Series(w[:m], dtype=object)
    for i in range(1, n):
        gram = gram + " " + pd.Series(w[i : m + i], dtype=object)
    docids = batch["doc_id"].to_numpy()[idx[:m][valid]]
    return pd.DataFrame({"doc_id": docids,
                         "gram": gram.to_numpy()[valid]}).drop_duplicates()


def q_decontaminate(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    test_grams = (ds.map_batches(
        lambda t: _mod_filter(t, DECON_TEST_MOD, True), batch_format="pyarrow")
        .map_batches(_grams_frame, batch_format="pandas")
        .to_pandas())
    gram_ref = ray.put(np.unique(test_grams["gram"].to_numpy(dtype=object)))

    def flag_batch(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(gram_ref)  # object-store cached per node
        g = _grams_frame(batch)
        hit = g[g["gram"].isin(grams)]
        out = hit.groupby("doc_id", as_index=False).agg(n_shared=("gram", "size"))
        return out.astype({"doc_id": "int64", "n_shared": "int64"})

    train = ds.map_batches(
        lambda t: _mod_filter(t, DECON_TEST_MOD, False), batch_format="pyarrow")
    out = train.map_batches(flag_batch, batch_format="pandas").to_pandas()
    if "doc_id" not in out.columns:  # every block empty: zero contamination
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "n_shared": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# correlated-subquery decorrelation: orders priced above their customer's
# average.  The classical plan — aggregate the correlated side once
# (per-customer sum/count of cents), broadcast the small aggregate, then a
# single filter pass over the fact table.  The comparison is exact integer
# math (price_cents * n_orders > sum_cents), so no float-average ordering
# effects can flip a borderline row between engine and oracle.
# ---------------------------------------------------------------------------

def _order_cents_partials(batch: pa.Table) -> pa.Table:
    cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)),
                    pa.int64())
    t = pa.table({"o_custkey": batch.column("o_custkey"), "cents": cents})
    g = t.group_by("o_custkey").aggregate([("cents", "sum"), ("cents", "count")])
    return g.rename_columns(["o_custkey", "p_cents", "p_n"])


def q_orders_above_cust_avg(sf_dir: str, *, route: str | None = None):
    """Orders strictly above their customer's average order value (exact
    integer cross-multiply, no float division).  Size-routed: below
    _BCAST_DIM_MAX_ROWS the per-custkey (sum, count) stats table — one row
    per customer — is broadcast and the filter fuses into the orders scan;
    past it the stats stay a Dataset and meet orders in a hash-partitioned
    join, so nothing customer-sized is driver-materialized."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    stats = (ds.map_batches(_order_cents_partials, batch_format="pyarrow")
             .groupby("o_custkey")
             .aggregate(Sum("p_cents", alias_name="s"),
                        Sum("p_n", alias_name="n")))

    if route == "broadcast":
        agg = stats.to_pandas().sort_values("o_custkey")
        stats_ref = ray.put((agg["o_custkey"].to_numpy(dtype=np.int64),
                             agg["s"].to_numpy(dtype=np.int64),
                             agg["n"].to_numpy(dtype=np.int64)))

        class _AboveAvg:
            def __init__(self, ref):
                self.keys, self.sums, self.ns = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                keys = batch.column("o_custkey").to_numpy()
                cents = pc.cast(
                    pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)),
                    pa.int64()).to_numpy()
                # every custkey has a stats row by construction (the
                # aggregate came from this same table) -> one vectorized
                # searchsorted
                pos = np.searchsorted(self.keys, keys)
                keep = cents * self.ns[pos] > self.sums[pos]
                return batch.select(["o_orderkey", "o_custkey"]).filter(
                    pa.array(keep))

        def above_partial(batch: pa.Table) -> pa.Table:
            return _AboveAvg(stats_ref)(batch)

        out = ds.map_batches(above_partial, batch_format="pyarrow")
    else:
        from ..rayops import fit_for_join

        ord_schema = pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_totalprice", pa.float64())])
        stats_schema = pa.schema([("o_custkey", pa.int64()),
                                  ("s", pa.int64()), ("n", pa.int64())])
        joined = fit_for_join(ds, ord_schema).join(
            fit_for_join(stats.map_batches(
                lambda t: t.rename_columns(["cust", "s", "n"]),
                batch_format="pyarrow"),
                pa.schema([("cust", pa.int64()), ("s", pa.int64()),
                           ("n", pa.int64())])),
            join_type="inner", num_partitions=_join_parts(sf_dir, "orders"),
            on=("o_custkey",), right_on=("cust",))

        def above(t: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                pa.int64()).to_numpy()
            keep = (cents * t.column("n").to_numpy()
                    > t.column("s").to_numpy())
            return t.select(["o_orderkey", "o_custkey"]).filter(
                pa.array(keep))

        out = joined.map_batches(above, batch_format="pyarrow")
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H Q18 analogue: large-volume orders.  Partial per-batch sum of
# l_quantity by orderkey -> small shuffled groupby -> HAVING filter leaves a
# tiny winner set (~1% of orders at threshold 250) that is broadcast into a
# single filter-join pass over orders.  Neither full table ever leaves its
# scan shape; only partials and winners move.
# ---------------------------------------------------------------------------

BIG_ORDER_QTY = 250


def q_big_orders_report(sf_dir: str):
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def _qty_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_orderkey").aggregate([("l_quantity", "sum")])
        return g.rename_columns(["l_orderkey", "p_qty"])

    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    nparts = _join_parts(sf_dir, "lineitem")
    win_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("total_qty", pa.int64())])
    # HAVING filter leaves ~1% of orders — still linear in the fact table,
    # so winners stay a DATASET and meet orders in a hash-partitioned join
    # (never a driver set)
    winners = fit_for_join(
        li.map_batches(_qty_partials, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("p_qty", alias_name="total_qty"))
        .filter(expr=f"total_qty > {BIG_ORDER_QTY}")
        .map_batches(lambda t: t.rename_columns(["o_orderkey", "total_qty"]),
                     batch_format="pyarrow"),
        win_schema)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = winners.join(orders, join_type="inner", num_partitions=nparts,
                          on=("o_orderkey",), right_on=("o_orderkey",))

    def local_topk(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0)),
                        pa.int64())
        t = pa.table({"o_orderkey": t.column("o_orderkey"),
                      "o_custkey": t.column("o_custkey"),
                      "price_cents": cents,
                      "total_qty": t.column("total_qty")})
        idx = pc.sort_indices(t, sort_keys=[("total_qty", "descending"),
                                            ("o_orderkey", "ascending")])
        return t.take(idx[:20])

    # distributed top-k: local head(20) per block, driver merges k*n_blocks
    out = joined.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["total_qty", "o_orderkey"],
                          ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H Q10 analogue: revenue lost to returned items, top 20 customers.
# Orders is a FACT table (1:4 with lineitem), so no side is broadcast:
# lineitem is filtered to l_returnflag='R' at the scan and pre-aggregated
# to one revenue row per orderkey BEFORE the single hash-partitioned join
# with the (orderkey, custkey) projection of orders — the exchange carries
# per-order partials, never line items (same plan as shipping_priority).
# The per-customer re-aggregate stays a DATASET (customer is sf-scaled —
# 150k x sf rows, multi-GB at the 100x regime) and meets the customer
# dimension in a second hash-partitioned join; only per-block top-20 heads
# (k x n_blocks rows) ever reach the driver, which merges them and
# decorates the final <= 20 rows with the constant-size nation table.
# ---------------------------------------------------------------------------

def _returned_rev_partial(batch: pa.Table) -> pa.Table:
    rev = pc.multiply(
        pc.multiply(batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
        pa.scalar(100.0))
    # DuckDB round(DOUBLE) ties away from zero; pyarrow defaults to
    # half_to_even — price*(1-disc)*100 DOES land on exact .5 doubles
    # (unlike the raw *100 price columns elsewhere)
    cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                    pa.int64())
    g = (pa.table({"o_orderkey": batch.column("l_orderkey"), "cents": cents})
         .group_by("o_orderkey").aggregate([("cents", "sum")]))
    return g.rename_columns(["o_orderkey", "p_cents"])


def q_returned_revenue_topk(sf_dir: str, *, route: str | None = None):
    """TPC-H Q10-shape top-20 customers by returned revenue.

    Size-routed like q_local_supplier_revenue: below _BCAST_DIM_MAX_ROWS
    the orderkey→custkey map is broadcast once (two sorted int64 arrays)
    and the whole query is ONE shuffle — lineitem partials pre-aggregated
    per custkey inside the scan, a single groupby(c_custkey), per-block
    top-20 heads to the driver, and the ≤20 winners decorated via a
    predicate-pushdown point read of customer (never the sf-scaled table).
    Past the threshold the hash-join plan runs instead (per-order partials
    → orders join → per-customer groupby → customer join → distributed
    top-k).  Both routes pinned bit-equal in tests/test_query_shapes.py;
    measured at sf0.1/32cpus: 13.0 s (hashjoin) → 6.6 s (broadcast)."""
    import pyarrow.parquet as pq
    from ..rayops import fit_for_join

    if route is None:
        n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        route = ("broadcast" if n_orders <= _BCAST_DIM_MAX_ROWS
                 else "hashjoin")

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == "R")

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("revenue_cents", "descending"),
                                            ("c_custkey", "ascending")])
        return t.take(idx[:20])

    if route == "broadcast":
        orders_t = pq.read_table(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        ok = orders_t.column("o_orderkey").to_numpy()
        oo = np.argsort(ok)
        ref = ray.put((ok[oo], orders_t.column("o_custkey").to_numpy()[oo]))

        class _CustPartial:
            def __init__(self, r):
                self.keys, self.cust = ray.get(r)

            def __call__(self, batch: pa.Table) -> pa.Table:
                rev = pc.multiply(pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                    pa.scalar(100.0))
                cents = pc.cast(
                    pc.round(rev, round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
                k = batch.column("l_orderkey").to_numpy()
                # inner-join semantics vs orders; empty-safe lookup
                hit, cust_at = _sorted_lookup(self.keys, self.cust, k)
                g = (pa.table({"c_custkey": pa.array(cust_at[hit],
                                                     pa.int64()),
                               "cents": pa.array(cents[hit], pa.int64())})
                     .group_by("c_custkey").aggregate([("cents", "sum")]))
                return g.rename_columns(["c_custkey", "p_cents"])

        def cust_partial(batch: pa.Table) -> pa.Table:
            # task mode: ray.get is a node-local zero-copy view per batch
            return _CustPartial(ref)(batch)

        per_cust = _bucket_fold(
            li.map_batches(cust_partial, batch_format="pyarrow"),
            "c_custkey", {"p_cents": ("revenue_cents", "sum")})
        head = (per_cust.map_batches(local_topk, batch_format="pyarrow")
                .to_pandas())
        if head.empty:  # no returned lineitems matched an order at all
            return pd.DataFrame({
                "c_custkey": pd.Series([], dtype="int64"),
                "c_name": pd.Series([], dtype=object),
                "n_name": pd.Series([], dtype=object),
                "revenue_cents": pd.Series([], dtype="int64")})
        head = head.sort_values(["revenue_cents", "c_custkey"],
                                ascending=[False, True]).head(20)
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"],
            filters=[("c_custkey", "in",
                      head["c_custkey"].tolist())]).to_pandas()
        nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                                 columns=["n_nationkey", "n_name"])
        out = (head.merge(cust, on="c_custkey")
               .merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey")
               [["c_custkey", "c_name", "n_name", "revenue_cents"]])
        out = out.sort_values(["revenue_cents", "c_custkey"],
                              ascending=[False, True])
        return out.reset_index(drop=True)

    # hashjoin route: orders/customer too big to broadcast or point-read-
    # decorate cheaply — nothing sf-scaled ever on the driver
    nparts = _join_parts(sf_dir, "lineitem")
    rev_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("rev_cents", pa.int64())])
    per_order = fit_for_join(  # empty blocks poison Dataset.join
        li.map_batches(_returned_rev_partial, batch_format="pyarrow")
        .groupby("o_orderkey").aggregate(Sum("p_cents", alias_name="rev_cents")),
        rev_schema)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = per_order.join(orders, join_type="inner",
                            num_partitions=nparts, on=("o_orderkey",),
                            right_on=("o_orderkey",))

    def cust_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("rev_cents", "sum")])
        return g.rename_columns(["c_custkey", "p_cents"])

    per_cust = fit_for_join(
        joined.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("p_cents", alias_name="revenue_cents")),
        pa.schema([("c_custkey", pa.int64()),
                   ("revenue_cents", pa.int64())]))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_nationkey"])
    decorated = per_cust.join(
        cust, join_type="inner",
        num_partitions=_join_parts(sf_dir, "customer"),
        on=("c_custkey",), right_on=("c_custkey",))

    # distributed top-k: per-block head(20), driver merges k*n_blocks rows
    head = (decorated.map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    head = head.sort_values(["revenue_cents", "c_custkey"],
                            ascending=[False, True]).head(20)
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])  # 25 rows
    out = (head.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
           [["c_custkey", "c_name", "n_name", "revenue_cents"]])
    out = out.sort_values(["revenue_cents", "c_custkey"],
                          ascending=[False, True])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# funnel conversion (view -> later purchase): expressible as pure per-user
# min/max aggregates — min(ts | view) and max(ts | purchase) — so it needs
# NO co-located event log: per-batch partials with int64 sentinel encoding,
# one small groupby(user), then a counted fold of indicator partials.
# ---------------------------------------------------------------------------

_TS_MAX_SENT = np.iinfo(np.int64).max
_TS_MIN_SENT = np.iinfo(np.int64).min


def _funnel_partials(batch: pa.Table) -> pa.Table:
    ts = pc.cast(batch.column("ts"), pa.int64())
    t = pa.table({"user_id": batch.column("user_id"),
                  "ts_us": ts, "event_type": batch.column("event_type")})
    v = (t.filter(pc.equal(t.column("event_type"), "view"))
         .group_by("user_id").aggregate([("ts_us", "min")])
         .rename_columns(["user_id", "fv"]))
    p = (t.filter(pc.equal(t.column("event_type"), "purchase"))
         .group_by("user_id").aggregate([("ts_us", "max")])
         .rename_columns(["user_id", "lp"]))
    return pa.concat_tables([
        v.append_column("lp", pa.array(
            np.full(len(v), _TS_MIN_SENT, dtype=np.int64))),
        pa.table({"user_id": p.column("user_id"),
                  "fv": pa.array(np.full(len(p), _TS_MAX_SENT, dtype=np.int64)),
                  "lp": p.column("lp")}),
    ])


def q_funnel_conversion(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    per_user = (ds.map_batches(_funnel_partials, batch_format="pyarrow")
                .groupby("user_id")
                .aggregate(Min("fv", alias_name="first_view"),
                           Max("lp", alias_name="last_purchase")))

    def _counts(batch: pa.Table) -> pa.Table:
        fv = batch.column("first_view").to_numpy()
        lp = batch.column("last_purchase").to_numpy()
        viewed = fv != _TS_MAX_SENT
        converted = viewed & (lp != _TS_MIN_SENT) & (lp > fv)
        return pa.table({"pv": pa.array([int(viewed.sum())], pa.int64()),
                         "pc": pa.array([int(converted.sum())], pa.int64())})

    folded = per_user.map_batches(_counts, batch_format="pyarrow").to_pandas()
    return pa.table({
        "n_viewers": pa.array([int(folded["pv"].sum())], pa.int64()),
        "n_converted": pa.array([int(folded["pc"].sum())], pa.int64()),
    })


# ---------------------------------------------------------------------------
# PII scrubbing: redact email- and US-phone-shaped spans from document text.
# Pure scan-side Arrow regex kernels (count on the ORIGINAL text, then two
# global replaces — email first, phone second, same order as the oracle), so
# the stage is shuffle-free and streams at any corpus size.  Both engines run
# RE2, so the pattern strings are shared verbatim with the oracle SQL.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    txt = batch.column("text")
    n = pc.add(pc.count_substring_regex(txt, PII_EMAIL),
               pc.count_substring_regex(txt, PII_PHONE))
    red = pc.replace_substring_regex(txt, PII_EMAIL, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_PHONE, "<PHONE>")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_pii": pc.cast(n, pa.int64()),
                     "text_clean": red})


def q_pii_scrub(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(pii_scrub_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stratified per-group sampling: a fixed-size uniform-without-replacement
# sample PER LANGUAGE, deterministic via md5(doc_id) ordering (the same
# hash-as-random-tape idiom as train_val_split).  Grouped top-N shape: each
# batch pre-prunes to its local top-K per lang, so the shuffle carries at
# most K * n_langs * n_blocks rows, never the corpus.
# ---------------------------------------------------------------------------

STRAT_K = 20


def _strat_partial(batch: pd.DataFrame) -> pd.DataFrame:
    keys = [hashlib.md5(str(int(d)).encode()).hexdigest()
            for d in batch["doc_id"]]
    out = batch.assign(hkey=keys).sort_values(["lang", "hkey", "doc_id"])
    return out.groupby("lang", as_index=False).head(STRAT_K)


def q_stratified_sample(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "lang"])
    cand = ds.map_batches(_strat_partial, batch_format="pandas")
    final = cand.groupby("lang").map_groups(
        lambda g: g.sort_values(["hkey", "doc_id"]).head(STRAT_K),
        batch_format="pandas")
    out = final.to_pandas()[["doc_id", "lang"]]
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# CUBE grouping sets over (status, priority): ONE fine-grained distributed
# aggregate; the three coarser cuts are derived from the fine cells on the
# driver (|statuses| x |priorities| rows — bounded by key cardinality, never
# by data volume).  Same derive-don't-reshuffle plan as q_orders_rollup.
# ---------------------------------------------------------------------------

def q_orders_cube(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderstatus",
                                  "o_totalprice"])
    fine = (ds.map_batches(_rollup_partial, batch_format="pyarrow")
            .groupby(["o_orderpriority", "o_orderstatus"])
            .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                       Sum("p_n", alias_name="n_orders"))
            .to_pandas())
    by_prio = (fine.groupby("o_orderpriority", as_index=False)
               [["revenue_cents", "n_orders"]].sum())
    by_prio["o_orderstatus"] = None
    by_status = (fine.groupby("o_orderstatus", as_index=False)
                 [["revenue_cents", "n_orders"]].sum())
    by_status["o_orderpriority"] = None
    total = pd.DataFrame({"o_orderpriority": [None], "o_orderstatus": [None],
                          "revenue_cents": [fine["revenue_cents"].sum()],
                          "n_orders": [fine["n_orders"].sum()]})
    out = pd.concat([fine, by_prio, by_status, total], ignore_index=True)
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "revenue_cents": pa.array(out["revenue_cents"].astype("int64"),
                                  pa.int64()),
        "n_orders": pa.array(out["n_orders"].astype("int64"), pa.int64()),
    })


# ---------------------------------------------------------------------------
# grouped string aggregation (collect-list family): per nation, the customer
# count plus a comma-joined sample of the 5 alphabetically-first customer
# names.  The list side is the grouped top-N shape (per-batch head(5) bounds
# the shuffle); the count side is an ordinary partial sum — so the string
# payload that moves is 5 names per nation per block, never all names.
# ---------------------------------------------------------------------------

NAME_AGG_K = 5


def q_nation_customer_names(sf_dir: str):
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nation.column("n_nationkey").to_pylist(),
                                nation.column("n_name").to_pylist())))

    class _NamePartial:
        def __init__(self, ref):
            self.nmap = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.assign(
                n_name=[self.nmap[k] for k in batch["c_nationkey"]])
            head = (b.sort_values(["n_name", "c_name", "c_custkey"])
                    .groupby("n_name", as_index=False).head(NAME_AGG_K))
            counts = b.groupby("n_name", as_index=False).agg(
                p_n=("c_custkey", "size"))
            head = head[["n_name", "c_name"]].assign(p_n=0)
            counts = counts.assign(c_name=None)
            return pd.concat([head, counts[["n_name", "c_name", "p_n"]]],
                             ignore_index=True)

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    parts = ds.map_batches(
        _NamePartial, fn_constructor_kwargs={"ref": nmap_ref},
        batch_format="pandas", concurrency=(1, 4)).to_pandas()

    def _fold(g: pd.DataFrame) -> pd.Series:
        names = sorted(n for n in g["c_name"] if n is not None)[:NAME_AGG_K]
        return pd.Series({"n_customers": int(g["p_n"].sum()),
                          "sample_names": ",".join(names)})

    out = (parts.groupby("n_name").apply(_fold, include_groups=False)
           .reset_index().sort_values("n_name").reset_index(drop=True))
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Bloom-accelerated semi join: lineitem ⋉ (large parts).  The key side is
# packed once into a broadcast Bloom bit array (16 bits/key, FP ~6e-5) that
# discards ~all non-members with bit probes; survivors are verified against
# the exact sorted key set (also broadcast), so the result is EXACT — the
# Bloom's job is to make the searchsorted verify touch only true-ish hits.
# At 100 TB this is the standard pre-filter that keeps a fact-scan semi
# join CPU-bound on the cheap probe instead of the binary search.
# ---------------------------------------------------------------------------

BIG_PART_SIZE = 48


class _BloomSemi:
    def __init__(self, bloom_ref, keys_ref):
        from ocr_main_ray.functions.sketch import bloom_test

        self.bloom = ray.get(bloom_ref)
        self.keys = ray.get(keys_ref)  # sorted, for the exact verify
        self._test = bloom_test

    def __call__(self, batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy()
        cand = self._test(self.bloom, pk)
        hit = np.zeros(len(pk), dtype=bool)
        if cand.any() and len(self.keys):
            sub = pk[cand]
            idx = np.searchsorted(self.keys, sub)
            idx[idx == len(self.keys)] = 0
            hit[np.nonzero(cand)[0]] = self.keys[idx] == sub
        qty = batch.column("l_quantity").to_numpy()
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag").filter(pa.array(hit)),
            "qty": pa.array(qty[hit].astype(np.int64), pa.int64()),
        })
        g = t.group_by("l_returnflag").aggregate([("qty", "sum"),
                                                  ("qty", "count")])
        return g.rename_columns(["l_returnflag", "p_qty", "p_n"])


def q_bloom_semi_join(sf_dir: str, *, route: str | None = None):
    """Semi join of lineitem against the big-part key set.  Size-routed:
    below _BCAST_DIM_MAX_ROWS the Bloom prefilter + exact sorted-key
    verify is broadcast into the lineitem scan (zero shuffle); past it —
    where even the 16-bit/key Bloom and the key array are GBs — the
    per-(partkey, returnflag) lineitem partials meet the size-filtered
    part read (predicate pushed to parquet) in a hash-partitioned join."""
    import pyarrow.parquet as pq

    from ocr_main_ray.functions.sketch import bloom_build

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag", "l_quantity"])
    if route == "broadcast":
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_size"])
        keys = np.sort(part.filter(
            pc.greater_equal(part.column("p_size"), BIG_PART_SIZE))
            .column("p_partkey").to_numpy())
        bloom_ref, keys_ref = ray.put(bloom_build(keys)), ray.put(keys)

        def bloom_partial(batch: pa.Table) -> pa.Table:
            # task mode: per-batch construction is two node-local
            # zero-copy ray.gets — no actor-pool startup
            return _BloomSemi(bloom_ref, keys_ref)(batch)

        partials = ds.map_batches(bloom_partial, batch_format="pyarrow")
    else:
        from ..rayops import fit_for_join

        def li_partial(t: pa.Table) -> pa.Table:
            # numpy int64 truncation, identical to _BloomSemi
            qty = t.column("l_quantity").to_numpy().astype(np.int64)
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "l_returnflag": t.column("l_returnflag"),
                           "qty": pa.array(qty, pa.int64())})
                 .group_by(["l_partkey", "l_returnflag"])
                 .aggregate([("qty", "sum"), ("qty", "count")]))
            return g.rename_columns(["l_partkey", "l_returnflag",
                                     "p_qty", "p_n"])

        li_schema = pa.schema([("l_partkey", pa.int64()),
                               ("l_returnflag", pa.large_string()),
                               ("p_qty", pa.int64()), ("p_n", pa.int64())])
        big_keys = fit_for_join(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_partkey"],
                filter=(pc.field("p_size") >= BIG_PART_SIZE)),
            pa.schema([("p_partkey", pa.int64())]))
        if big_keys.count() == 0:  # join rejects a fully-empty side;
            # parity with the broadcast route's empty groupby result
            return pd.DataFrame({"l_returnflag": pd.Series([], dtype=object),
                                 "n_items": pd.Series([], dtype="int64"),
                                 "total_qty": pd.Series([], dtype="int64")})
        partials = (fit_for_join(
            ds.map_batches(li_partial, batch_format="pyarrow"), li_schema)
            .join(big_keys, join_type="inner",
                  num_partitions=_join_parts(sf_dir, "lineitem"),
                  on=("l_partkey",), right_on=("p_partkey",)))
    out = (partials
           .groupby("l_returnflag")
           .aggregate(Sum("p_n", alias_name="n_items"),
                      Sum("p_qty", alias_name="total_qty"))
           .to_pandas())
    if out.empty:  # empty groupby drops its columns entirely
        return pd.DataFrame({"l_returnflag": pd.Series([], dtype=object),
                             "n_items": pd.Series([], dtype="int64"),
                             "total_qty": pd.Series([], dtype="int64")})
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ---------------------------------------------------------------------------
# full-outer reconciliation over the nation spine: per-nation customer count
# vs supplier count, zero-filled on either missing side.  Both inputs reduce
# to per-nationkey partial counts (bounded by |nation|); the outer merge and
# name decoration happen on the driver over <= |nation| rows.
# ---------------------------------------------------------------------------

def _nationkey_counts(ds, key: str):
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key).aggregate([(key, "count")])
        return g.rename_columns(["nk", "pn"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("nk").aggregate(Sum("pn", alias_name="n")).to_pandas())


def q_nation_cust_supp(sf_dir: str):
    import pyarrow.parquet as pq

    cust = _nationkey_counts(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"]),
        "c_nationkey")
    supp = _nationkey_counts(
        rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]),
        "s_nationkey")
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = (nation.merge(cust, left_on="n_nationkey", right_on="nk", how="left")
           .merge(supp, left_on="n_nationkey", right_on="nk", how="left",
                  suffixes=("_c", "_s")))
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "n_customers": pa.array(out["n_c"].fillna(0).astype("int64"), pa.int64()),
        "n_suppliers": pa.array(out["n_s"].fillna(0).astype("int64"), pa.int64()),
    })


# ---------------------------------------------------------------------------
# grouped weighted average: mean line price per brand weighted by quantity.
# Exact integer sums (cents * qty, qty) via the partial/combiner pattern,
# then ONE double division per group on the driver — the same hash-stable
# float idiom as doc_chars_avg, so the oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

class _BrandWeighted:
    def __init__(self, brand_ref):
        # sorted partkey array + parallel brand array: the broadcast
        # dimension lookup is one vectorized searchsorted per batch
        self.keys, self.brands = ray.get(brand_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64()).to_numpy()
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        hit, brands_at = _sorted_lookup(
            self.keys, self.brands, batch.column("l_partkey").to_numpy())
        t = pa.table({"p_brand": pa.array(brands_at[hit], pa.string()),
                      "wsum": pa.array((cents * qty)[hit], pa.int64()),
                      "w": pa.array(qty[hit], pa.int64())})
        g = t.group_by("p_brand").aggregate([("wsum", "sum"), ("w", "sum")])
        return g.rename_columns(["p_brand", "p_wsum", "p_w"])


def q_brand_weighted_price(sf_dir: str, *, route: str | None = None):
    """Quantity-weighted average price per brand.  Size-routed: below
    _BCAST_DIM_MAX_ROWS the part->brand map is broadcast into the lineitem
    scan; past it per-partkey lineitem partials meet part in a
    hash-partitioned join (nothing part-sized on the driver)."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity"])
    if route == "broadcast":
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand"])
        pk = part.column("p_partkey").to_numpy()
        order = np.argsort(pk)
        brand_ref = ray.put((pk[order],
                             part.column("p_brand").to_numpy(
                                 zero_copy_only=False)[order]))
        def brand_partial(batch: pa.Table) -> pa.Table:
            return _BrandWeighted(brand_ref)(batch)

        partials = ds.map_batches(brand_partial, batch_format="pyarrow")
    else:
        from ..rayops import fit_for_join

        def li_partial(t: pa.Table) -> pa.Table:
            # identical integer arithmetic to _BrandWeighted (cents via
            # round*100 cast, qty via numpy int64 truncation)
            cents = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()).to_numpy()
            qty = t.column("l_quantity").to_numpy().astype(np.int64)
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "wsum": pa.array(cents * qty, pa.int64()),
                           "w": pa.array(qty, pa.int64())})
                 .group_by("l_partkey")
                 .aggregate([("wsum", "sum"), ("w", "sum")]))
            return g.rename_columns(["l_partkey", "p_wsum", "p_w"])

        li_schema = pa.schema([("l_partkey", pa.int64()),
                               ("p_wsum", pa.int64()), ("p_w", pa.int64())])
        part_schema = pa.schema([("p_partkey", pa.int64()),
                                 ("p_brand", pa.large_string())])
        joined = fit_for_join(
            ds.map_batches(li_partial, batch_format="pyarrow"),
            li_schema).join(
            fit_for_join(rd.read_parquet(f"{sf_dir}/part.parquet",
                                         columns=["p_partkey", "p_brand"]),
                         part_schema),
            join_type="inner",
            num_partitions=_join_parts(sf_dir, "lineitem"),
            on=("l_partkey",), right_on=("p_partkey",))
        partials = joined.map_batches(
            lambda t: t.group_by("p_brand")
            .aggregate([("p_wsum", "sum"), ("p_w", "sum")])
            .rename_columns(["p_brand", "p_wsum", "p_w"]),
            batch_format="pyarrow")
    agg = (partials
           .groupby("p_brand")
           .aggregate(Sum("p_wsum", alias_name="wsum"),
                      Sum("p_w", alias_name="total_qty"))
           .to_pandas())
    agg["wavg_price_cents"] = agg["wsum"] / agg["total_qty"]
    out = agg[["p_brand", "wavg_price_cents", "total_qty"]]
    return out.sort_values("p_brand").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (functions/sketch.py): approximate word counts
# with O(D*W) shuffle volume per batch, independent of corpus size.  The
# candidate words come from per-batch local top-k partials (bounded), their
# counts from the merged sketch (one-sided error: never under-counts).
# Rows-only: sketch internals are not SQL; tests/test_sketch.py pins the
# overestimate bound and exact-on-skewed-stream behavior.
# ---------------------------------------------------------------------------

CMS_CAND_K = 50


def q_cms_top_words(sf_dir: str):
    from ocr_main_ray.functions.sketch import cms_partial, cms_query

    ds = _docs(sf_dir, ["text"])

    def sketch_part(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split().explode().dropna().value_counts()
        t = cms_partial(vc.index.to_numpy(dtype=object),
                        vc.to_numpy(dtype="int64"))
        return t.to_pandas()

    merged = (ds.map_batches(sketch_part, batch_format="pandas")
              .groupby("slot").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())  # <= CMS_D * CMS_W rows

    def cand_part(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch["text"].str.split().explode().dropna()
              .value_counts().head(CMS_CAND_K))
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object)})

    cands = (ds.map_batches(cand_part, batch_format="pandas")
             .to_pandas()["w"].drop_duplicates().to_numpy(dtype=object))
    est = cms_query(merged["slot"].to_numpy(), merged["cnt"].to_numpy(), cands)
    out = (pd.DataFrame({"word": cands, "est_count": est.astype("int64")})
           .sort_values(["est_count", "word"], ascending=[False, True])
           .head(20))
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# distributed Pearson correlation via exact moment sums: one scan computes
# integer partials (n, Σx, Σy, Σxy, Σx², Σy²) in cents; the correlation is
# assembled on the driver with an arithmetic expression the oracle mirrors
# term-for-term (every int is CAST to DOUBLE before any float op, sqrt is
# IEEE-correctly-rounded), so the float output is bit-identical.  This is
# the canonical one-pass distributed statistic — no co-location, no shuffle
# beyond six int64 rows per block.
# ---------------------------------------------------------------------------

def _corr_partials(batch: pd.DataFrame) -> pd.DataFrame:
    x = (batch["value"] * 100).round().astype("int64")  # cents
    y = (batch["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
         .astype("int64"))
    return pd.DataFrame({
        "n": [len(x)], "sx": [x.sum()], "sy": [y.sum()],
        "sxy": [(x * y).sum()], "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
    }).astype("int64")


def q_corr_value_props(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value", "props"])
    p = (ds.map_batches(_corr_partials, batch_format="pandas")
         .to_pandas().sum())
    n, sx, sy = float(p["n"]), float(p["sx"]), float(p["sy"])
    sxy, sxx, syy = float(p["sxy"]), float(p["sxx"]), float(p["syy"])
    corr = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    return pa.table({"corr_value_k": pa.array([corr], pa.float64()),
                     "n_events": pa.array([int(p["n"])], pa.int64())})


# ---------------------------------------------------------------------------
# per-group median absolute deviation (robust spread): two exact nearest-rank
# percentile passes over integer cents — pass 1 folds a per-(type, cents)
# histogram to get each group's median, pass 2 re-histograms |x - median|.
# Both exchanges carry (group, distinct-value) partial counts, never rows.
# ---------------------------------------------------------------------------

def _grouped_hist_partial(batch: pd.DataFrame, col: str, out: str) -> pd.DataFrame:
    g = batch.groupby(["event_type", col], as_index=False).size()
    return g.rename(columns={col: out, "size": "pn"})


def _hist_median(hist: pd.DataFrame, val: str) -> dict:
    med = {}
    for et, g in hist.groupby("event_type"):
        g = g.sort_values(val)
        cum = g["pn"].cumsum()
        rank = (int(cum.iloc[-1]) + 1) // 2  # nearest-rank (quantile_disc .5)
        med[et] = int(g[val].iloc[int(np.searchsorted(cum, rank))])
    return med


def q_events_value_mad(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def cents(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(c=(batch["value"] * 100).round().astype("int64"))
        return _grouped_hist_partial(b, "c", "cents")

    h1 = (ds.map_batches(cents, batch_format="pandas")
          .groupby(["event_type", "cents"])
          .aggregate(Sum("pn", alias_name="pn")).to_pandas())
    med = _hist_median(h1, "cents")
    med_ref = ray.put(med)

    class _AbsDev:
        def __init__(self, ref):
            self.med = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            c = (batch["value"] * 100).round().astype("int64")
            m = batch["event_type"].map(self.med).astype("int64")
            b = pd.DataFrame({"event_type": batch["event_type"],
                              "d": (c - m).abs()})
            return _grouped_hist_partial(b, "d", "dev")

    h2 = (ds.map_batches(_AbsDev, fn_constructor_kwargs={"ref": med_ref},
                         batch_format="pandas", concurrency=(1, 4))
          .groupby(["event_type", "dev"])
          .aggregate(Sum("pn", alias_name="pn")).to_pandas())
    mad = _hist_median(h2, "dev")
    out = pd.DataFrame({
        "event_type": sorted(mad),
        "median_cents": [med[t] for t in sorted(mad)],
        "mad_cents": [mad[t] for t in sorted(mad)],
    })
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "median_cents": pa.array(out["median_cents"], pa.int64()),
        "mad_cents": pa.array(out["mad_cents"], pa.int64()),
    })


# ---------------------------------------------------------------------------
# grouped mode (most frequent value per key, deterministic tiebreak): the
# two-level aggregate — (key, value) partial counts -> groupby-sum -> argmax
# per key with lowest-value tiebreak.  The exchange carries one row per
# distinct (user, type) pair, bounded by |users| x |event types|.
# ---------------------------------------------------------------------------

def q_user_top_event_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["user_id", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "pn"})

    counts = (ds.map_batches(partial, batch_format="pandas")
              .groupby(["user_id", "event_type"])
              .aggregate(Sum("pn", alias_name="n")).to_pandas())
    counts = counts.sort_values(["user_id", "n", "event_type"],
                                ascending=[True, False, True])
    out = counts.groupby("user_id", as_index=False).head(1)
    out = out.rename(columns={"event_type": "top_type", "n": "n_events"})
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# daily error-rate monitoring: conditional-count partials per day (n_errors,
# n_total as two int sums), one tiny groupby, one double division per day —
# the ops-dashboard aggregate every crawl pipeline runs nightly.
# ---------------------------------------------------------------------------

def _error_rate_partial(batch: pa.Table) -> pa.Table:
    day = pc.floor_temporal(batch.column("ts"), unit="day")
    is_err = pc.cast(pc.equal(batch.column("event_type"), "error"),
                     pa.int64())
    t = pa.table({"day": day, "err": is_err,
                  "one": pa.array(np.ones(len(batch), dtype=np.int64))})
    g = t.group_by("day").aggregate([("err", "sum"), ("one", "sum")])
    return g.rename_columns(["day", "p_err", "p_n"])


def q_events_error_rate_daily(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    out = (ds.map_batches(_error_rate_partial, batch_format="pyarrow")
           .groupby("day")
           .aggregate(Sum("p_err", alias_name="n_errors"),
                      Sum("p_n", alias_name="n_events"))
           .to_pandas())  # one row per day — bounded by the time range
    out["error_rate"] = out["n_errors"] / out["n_events"]
    out["day"] = out["day"].astype("datetime64[us]")  # oracle emits timestamp[us]
    out = out.sort_values("day").reset_index(drop=True)
    out["n_errors"] = out["n_errors"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out[["day", "n_errors", "n_events", "error_rate"]]


# ---------------------------------------------------------------------------
# per-document z-score of length: global exact moments (n, Σx, Σx²) in one
# scan, then a second scan standardizes every row with a float expression
# the oracle mirrors term-for-term — the two-pass distributed standardizer
# (the corr_value_props pattern applied row-wise).
# ---------------------------------------------------------------------------

def q_doc_length_zscore(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars").to_numpy().astype(np.int64)
        return pa.table({"n": pa.array([len(x)], pa.int64()),
                         "sx": pa.array([int(x.sum())], pa.int64()),
                         "sxx": pa.array([int((x * x).sum())], pa.int64())})

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n, sx, sxx = float(m["n"]), float(m["sx"]), float(m["sxx"])
    mean = sx / n
    sd = math.sqrt(sxx / n - (sx / n) * (sx / n))

    def standardize(batch: pa.Table) -> pa.Table:
        # two floats ride the task closure — nothing to broadcast
        z = pc.divide(pc.subtract(pc.cast(batch.column("n_chars"),
                                          pa.float64()), mean), sd)
        return pa.table({"doc_id": batch.column("doc_id"), "z_len": z})

    return ds.map_batches(standardize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# month-over-month revenue growth: distributed monthly aggregate (bounded by
# the time range), then the lag/delta window over <= |months| rows on the
# driver — the same derive-don't-reshuffle treatment as the CUBE cuts.
# ---------------------------------------------------------------------------

def q_orders_monthly_growth(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        mon = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        g = (pa.table({"month": mon, "cents": cents})
             .group_by("month").aggregate([("cents", "sum")]))
        return g.rename_columns(["month", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("month").aggregate(Sum("p_cents", alias_name="revenue_cents"))
           .to_pandas().sort_values("month").reset_index(drop=True))
    out["month"] = out["month"].astype("datetime64[us]")  # oracle timestamp[us]
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    prev = out["revenue_cents"].shift(1)
    out["delta_cents"] = (out["revenue_cents"] - prev).fillna(0).astype("int64")
    out.loc[0, "delta_cents"] = 0
    return out[["month", "revenue_cents", "delta_cents"]]


# ---------------------------------------------------------------------------
# 7-day moving average of daily revenue: distributed daily aggregate (bounded
# by the time range), rolling int-sum/int-count window derived on the driver
# — exact integer window sums divided once, so the float matches the oracle's
# CAST(sum OVER w AS DOUBLE)/count term-for-term.
# ---------------------------------------------------------------------------

def q_events_value_7day_ma(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        g = (pa.table({"day": day, "cents": cents})
             .group_by("day").aggregate([("cents", "sum")]))
        return g.rename_columns(["day", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("p_cents", alias_name="day_cents"))
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("datetime64[us]")  # oracle timestamp[us]
    out["day_cents"] = out["day_cents"].astype("int64")
    c = out["day_cents"].to_numpy()
    csum = np.concatenate(([0], np.cumsum(c)))
    idx = np.arange(len(c))
    lo = np.maximum(0, idx - 6)
    wsum = csum[idx + 1] - csum[lo]
    wn = idx + 1 - lo
    out["ma7_cents"] = wsum.astype(np.float64) / wn.astype(np.float64)
    return out[["day", "day_cents", "ma7_cents"]]


# ---------------------------------------------------------------------------
# per-user last event (argmax by (ts, event_id)): per-batch vectorized
# lexsort keep-last partials (one row per user per block), final argmax over
# the bounded (users x blocks) partial table on the driver — the exchange
# carries candidates, never the event log.
# ---------------------------------------------------------------------------

def _last_event_partial(batch: pa.Table) -> pa.Table:
    u = batch.column("user_id").to_numpy()
    ts = batch.column("ts").cast(pa.int64()).to_numpy()
    eid = batch.column("event_id").to_numpy()
    order = np.lexsort((eid, ts, u))  # user asc, then ts, then event_id
    last = np.concatenate((u[order][1:] != u[order][:-1], [True]))
    keep = order[last]
    return batch.take(pa.array(keep))


def q_user_last_event(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    cand = (ds.map_batches(_last_event_partial, batch_format="pyarrow")
            .to_pandas())  # <= |users| x |blocks| rows
    cand = cand.sort_values(["user_id", "ts", "event_id"])
    out = cand.groupby("user_id", as_index=False).tail(1)
    out = out.sort_values("user_id").reset_index(drop=True)
    out["last_value"] = out["value"]
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out[["user_id", "ts", "last_value"]]


# ---------------------------------------------------------------------------
# winsorized aggregate: clamp value-cents to the exact global [p05, p95]
# (nearest-rank picks from the same bounded cents histogram the percentile
# query folds), then per-type clamped sums — the outlier-robust rollup every
# metrics pipeline wants.  Two scans, no row ever shuffles.
# ---------------------------------------------------------------------------

def q_events_value_winsorized(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    hist = (ds.map_batches(_cents_hist_partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values("cents").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])

    def pick(q: float) -> int:
        rank = min(total, max(1, math.ceil(q * total)))
        return int(hist["cents"].iloc[int(np.searchsorted(cum, rank))])

    lo, hi = pick(0.05), pick(0.95)

    def clamp_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64()).to_numpy()
        w = np.clip(cents, lo, hi)
        g = (pa.table({"event_type": batch.column("event_type"),
                       "w": pa.array(w, pa.int64())})
             .group_by("event_type").aggregate([("w", "sum"), ("w", "count")]))
        return g.rename_columns(["event_type", "p_sum", "p_n"])

    ds2 = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "value"])
    out = (ds2.map_batches(clamp_partial, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("p_sum", alias_name="winsorized_cents"),
                      Sum("p_n", alias_name="n_events"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    out["winsorized_cents"] = out["winsorized_cents"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# self range join: pairs of events by the same user within one hour.  Events
# co-locate per user via the hash-bucket shuffle (same exchange as
# sessionization), then the WHOLE bucket is counted with two vectorized
# searchsorteds — the per-user segments are made globally monotonic by
# re-basing each segment on a (span + window) stride, so no per-user Python
# loop survives (a bucket can hold 1/B of all users at 100x scale).
# ---------------------------------------------------------------------------

_PAIR_WINDOW_US = 3_600_000_000  # 1 hour


def _pair_count_bucket(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["user_id", "ts"], kind="mergesort")
    u = g["user_id"].to_numpy()
    t = g["ts"].astype("int64").to_numpy()
    if len(u) == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_pairs": pd.Series([], dtype="int64")})
    seg_start = np.concatenate(([True], u[1:] != u[:-1]))
    seg_id = np.cumsum(seg_start) - 1
    t_rel = t - t[np.flatnonzero(seg_start)][seg_id]
    stride = (t_rel.max() if len(t_rel) else 0) + _PAIR_WINDOW_US + 1
    tt = seg_id * stride + t_rel  # monotonic; segments > window apart
    n_after = (np.searchsorted(tt, tt + _PAIR_WINDOW_US, side="right")
               - np.arange(len(tt)) - 1)
    out = pd.DataFrame({"user_id": u, "n_pairs": n_after})
    out = out.groupby("user_id", as_index=False)["n_pairs"].sum()
    return out[out["n_pairs"] > 0].astype({"n_pairs": "int64"})


def q_user_event_pairs_1h(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = (ds.groupby("ubucket")
           .map_groups(_pair_count_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H Q5 analogue (local-supplier revenue by nation): the classic 5-table
# join where customer and supplier nationkeys must MATCH.  TWO routes,
# size-selected from parquet metadata (free — no scan), mirroring the
# triangle family's broadcast-closure fallback:
#
# - broadcast (small dimensions): the date-filtered orders projection is
#   composed with customer driver-side into ONE sorted orderkey->c_nat
#   lookup (predicate pushed to the parquet read, so only the ~15%
#   in-window orders are ever read); supplier becomes a second sorted
#   suppkey->s_nat lookup.  Both ship via ray.put once (object store,
#   zero-copy per actor, never re-shipped per batch) and a single pass
#   over lineitem does both lookups, filters s_nat == c_nat, and emits
#   per-nation partials — the only exchange left is a |nations|-row
#   groupby.  At the 5M-row dim threshold the composed map is ~7.5M
#   filtered orders = ~120 MB of int64 pairs, still object-store-sized.
# - hashjoin (sf-scaled dimensions past _BCAST_DIM_MAX_ROWS): per-
#   (orderkey, suppkey) partials meet supplier / customer / orders in
#   hash-partitioned joins, so nothing sized by the dimension tables is
#   ever materialized on the driver or broadcast whole.
#
# Pinned equal in tests/test_query_shapes.py; measured sf0.1/32cpu
# (alternating A/B, median of 3): 8.7 s (join-tail broadcast) -> 5.4 s
# (composed-map broadcast).
# ---------------------------------------------------------------------------

_BCAST_DIM_MAX_ROWS = 5_000_000  # ~80 MB of (key, nationkey) int64 pairs


def q_local_supplier_revenue(sf_dir: str, *, route: str | None = None):
    import pyarrow.parquet as pq
    from ..rayops import fit_for_join

    if route is None:
        dim_rows = max(
            pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows,
            pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows)
        route = "broadcast" if dim_rows <= _BCAST_DIM_MAX_ROWS else "hashjoin"

    class _NatPartial:
        # broadcast route: both lookups + the nation-match filter fused
        # into the lineitem scan, so the only exchange is |nations| rows
        def __init__(self, oref, sref):
            self.okeys, self.onat = ray.get(oref)
            self.skeys, self.snat = ray.get(sref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch.column("l_orderkey").to_numpy()
            # inner-join semantics vs the date-filtered orders window;
            # both lookups empty-safe (all-miss on a zero-row dimension)
            hit_o, c_nat = _sorted_lookup(self.okeys, self.onat, k)
            hit_s, s_nat = _sorted_lookup(
                self.skeys, self.snat,
                batch.column("l_suppkey").to_numpy())
            keep = hit_o & hit_s & (s_nat == c_nat)
            rev = pc.multiply(pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64()).to_numpy(zero_copy_only=False)
            g = (pa.table({"nationkey": pa.array(s_nat[keep], pa.int64()),
                           "cents": pa.array(cents[keep], pa.int64())})
                 .group_by("nationkey").aggregate([("cents", "sum")]))
            return g.rename_columns(["nationkey", "p_cents"])

    def _line_partial_raw(batch: pa.Table) -> pa.Table:
        # hashjoin route: same revenue partials, but keyed by (orderkey,
        # suppkey) so the supplier nation arrives via a hash join instead
        # of a broadcast lookup
        rev = pc.multiply(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
            pa.scalar(100.0))
        cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                        pa.int64())
        g = (pa.table({"o_orderkey": batch.column("l_orderkey"),
                       "l_suppkey": batch.column("l_suppkey"),
                       "cents": cents})
             .group_by(["o_orderkey", "l_suppkey"])
             .aggregate([("cents", "sum")]))
        return g.rename_columns(["o_orderkey", "l_suppkey", "rev_cents"])

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    lo = pd.Timestamp("1995-01-01")
    hi = pd.Timestamp("1996-01-01")

    if route == "broadcast":
        # compose orderkey -> customer nation driver-side: the date
        # predicate is pushed to the parquet read, so only the in-window
        # ~15% of orders (two int64 columns) is ever materialized
        orders_t = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
            filters=[("o_orderdate", ">=", lo), ("o_orderdate", "<", hi)])
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        ck = cust.column("c_custkey").to_numpy()
        co = np.argsort(ck)
        cpos = np.searchsorted(ck[co],
                               orders_t.column("o_custkey").to_numpy())
        o_cnat = (cust.column("c_nationkey").to_numpy()[co][cpos]
                  .astype(np.int64))
        ok = orders_t.column("o_orderkey").to_numpy()
        oo = np.argsort(ok)
        ord_ref = ray.put((ok[oo], o_cnat[oo]))
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sk = sup.column("s_suppkey").to_numpy()
        so = np.argsort(sk)
        sup_ref = ray.put((sk[so], sup.column("s_nationkey").to_numpy()[so]
                           .astype(np.int64)))
        def nat_partial_task(batch: pa.Table) -> pa.Table:
            # task mode: ray.get of a node-local plasma object is a
            # zero-copy view (~us); skipping the actor-pool startup
            # saves ~1 s at suite scale (A/B-measured, see BASELINE.md)
            return _NatPartial(ord_ref, sup_ref)(batch)

        per_nat = (li.map_batches(nat_partial_task, batch_format="pyarrow")
                   .groupby("nationkey")
                   .aggregate(Sum("p_cents", alias_name="revenue_cents"))
                   .to_pandas())  # <= |nations| rows
        return _nation_rollup_tail(sf_dir, per_nat)

    # hashjoin: dimensions too big to broadcast — never on the driver
    lhs_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("s_nat", pa.int64()),
                            ("rev_cents", pa.int64())])
    rhs_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("c_nat", pa.int64())])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pds.field("o_orderdate") >= lo)
                & (pds.field("o_orderdate") < hi)))
    nparts = _join_parts(sf_dir, "lineitem")
    raw = fit_for_join(
        li.map_batches(_line_partial_raw, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()),
                   ("l_suppkey", pa.int64()),
                   ("rev_cents", pa.int64())]))
    supds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
    dec = raw.join(supds, join_type="inner",
                   num_partitions=_join_parts(sf_dir, "supplier"),
                   on=("l_suppkey",), right_on=("s_suppkey",))

    def to_lhs(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "s_nat": pc.cast(t.column("s_nationkey"), pa.int64()),
            "rev_cents": t.column("rev_cents")})

    lhs = fit_for_join(dec.map_batches(to_lhs, batch_format="pyarrow"),
                       lhs_schema)
    custds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    odec = fit_for_join(
        orders, pa.schema([("o_orderkey", pa.int64()),
                           ("o_custkey", pa.int64())])
    ).join(custds, join_type="inner",
           num_partitions=_join_parts(sf_dir, "customer"),
           on=("o_custkey",), right_on=("c_custkey",))

    def to_rhs(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "c_nat": pc.cast(t.column("c_nationkey"), pa.int64())})

    rhs = fit_for_join(odec.map_batches(to_rhs, batch_format="pyarrow"),
                       rhs_schema)

    joined = lhs.join(rhs, join_type="inner", num_partitions=nparts,
                      on=("o_orderkey",), right_on=("o_orderkey",))

    def local_fold(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("s_nat"), t.column("c_nat")))
        g = (pa.table({"nationkey": keep.column("s_nat"),
                       "cents": keep.column("rev_cents")})
             .group_by("nationkey").aggregate([("cents", "sum")]))
        return g.rename_columns(["nationkey", "p_cents"])

    per_nat = (joined.map_batches(local_fold, batch_format="pyarrow")
               .groupby("nationkey")
               .aggregate(Sum("p_cents", alias_name="revenue_cents"))
               .to_pandas())  # <= |nations| rows
    return _nation_rollup_tail(sf_dir, per_nat)


def _nation_rollup_tail(sf_dir: str, per_nat: pd.DataFrame) -> pd.DataFrame:
    """Shared finish for both q_local_supplier_revenue routes: decorate the
    <= |nations| rows with names and apply the deterministic ordering."""
    if per_nat.empty:  # no in-window revenue: empty, same shape
        return pd.DataFrame({"nation": pd.Series([], dtype=object),
                             "revenue_cents": pd.Series([], dtype="int64")})
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    out = per_nat.merge(nation, left_on="nationkey", right_on="n_nationkey")
    out = out.rename(columns={"n_name": "nation"})
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out = out.sort_values(["revenue_cents", "nation"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["nation", "revenue_cents"]]


# ---------------------------------------------------------------------------
# interpolated percentiles (quantile_cont semantics): the same bounded cents
# histogram as the nearest-rank query, folded with the h=(n-1)q linear
# interpolation between adjacent order statistics — exact distributed
# percentile_cont with no global sort.
# ---------------------------------------------------------------------------

def q_events_value_percentiles_cont(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    hist = (ds.map_batches(_cents_hist_partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values("cents").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    vals = hist["cents"].to_numpy()

    def order_stat(i: int) -> float:  # 0-indexed i-th smallest, as double
        return float(vals[int(np.searchsorted(cum, i + 1))])

    def pick(q: float) -> float:
        h = (total - 1) * q
        lo = math.floor(h)
        frac = h - lo
        x_lo = order_stat(lo)
        if frac == 0.0:
            return x_lo
        return x_lo + (order_stat(min(lo + 1, total - 1)) - x_lo) * frac

    return pa.table({
        "p25_cents": pa.array([pick(0.25)], pa.float64()),
        "p50_cents": pa.array([pick(0.5)], pa.float64()),
        "p75_cents": pa.array([pick(0.75)], pa.float64()),
        "n_events": pa.array([total], pa.int64()),
    })


# ---------------------------------------------------------------------------
# TPC-H Q14 analogue (promo revenue share): part is a dimension -> broadcast
# sorted (partkey -> is_promo) arrays; the date-windowed lineitem scan folds
# to ONE (promo_cents, total_cents) partial row per batch.  The share is a
# single division of two exact integer sums, so the double is bit-stable.
# ---------------------------------------------------------------------------

def q_promo_revenue_share(sf_dir: str, *, route: str | None = None):
    """TPC-H Q14 analogue (PROMO revenue share in one ship month).
    Size-routed: below _BCAST_DIM_MAX_ROWS the part->is-promo bitmap is
    broadcast into the lineitem scan (zero shuffle); past it per-partkey
    revenue partials meet the PROMO-filtered part read (predicate pushed
    to parquet) in a hash-partitioned semi join, with the global total a
    distributed sum over the same partials."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-02-01")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    if route == "broadcast":
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        pk = part.column("p_partkey").to_numpy()
        po = np.argsort(pk)
        promo = pc.equal(part.column("p_type"), "PROMO").to_numpy(
            zero_copy_only=False)
        ref = ray.put((pk[po], promo[po]))

        class _PromoPartial:
            def __init__(self, ref):
                self.keys, self.promo = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                rev = pc.multiply(pc.multiply(
                    batch.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                    pa.scalar(100.0))
                cents = pc.cast(
                    pc.round(rev, round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy()
                hit, promo_at = _sorted_lookup(
                    self.keys, self.promo,
                    batch.column("l_partkey").to_numpy())
                is_promo = hit & promo_at
                return pa.table({
                    "p_promo": pa.array([int(cents[is_promo].sum())],
                                        pa.int64()),
                    "p_total": pa.array([int(cents.sum())], pa.int64())})

        def promo_partial(batch: pa.Table) -> pa.Table:
            return _PromoPartial(ref)(batch)

        agg = (li.map_batches(promo_partial, batch_format="pyarrow")
               .aggregate(Sum("p_promo", alias_name="promo"),
                          Sum("p_total", alias_name="total")))
        promo_c, total_c = int(agg["promo"]), int(agg["total"])
    else:
        from ..rayops import fit_for_join

        def li_partial(t: pa.Table) -> pa.Table:
            # identical per-row rounding to _PromoPartial before the sum
            rev = pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64())
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "cents": cents})
                 .group_by("l_partkey").aggregate([("cents", "sum")]))
            return g.rename_columns(["l_partkey", "p_cents"])

        li_schema = pa.schema([("l_partkey", pa.int64()),
                               ("p_cents", pa.int64())])
        per_part = fit_for_join(
            li.map_batches(li_partial, batch_format="pyarrow"),
            li_schema).materialize()
        total_c = int(per_part.sum("p_cents") or 0)
        promo_keys = fit_for_join(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"],
                            filter=(pc.field("p_type") == "PROMO")),
            pa.schema([("p_partkey", pa.int64())]))
        # Dataset.join rejects a fully-empty side (same invariant as the
        # sibling routed queries): with no PROMO parts or an empty 1996-01
        # lineitem slice the promo revenue is 0 by definition, no join
        # needed (total_c already degraded via `or 0` above).
        if promo_keys.count() == 0 or per_part.count() == 0:
            promo_c = 0
        else:
            promo_c = int(per_part.join(
                promo_keys, join_type="inner",
                num_partitions=_join_parts(sf_dir, "lineitem"),
                on=("l_partkey",), right_on=("p_partkey",)).sum("p_cents")
                or 0)
    return pa.table({
        "promo_cents": pa.array([promo_c], pa.int64()),
        "total_cents": pa.array([total_c], pa.int64()),
        "promo_share": pa.array([promo_c / total_c], pa.float64())})


# ---------------------------------------------------------------------------
# TPC-H Q15 analogue (top supplier by windowed revenue): per-supplier revenue
# partials inside map_batches -> one small groupby.  The per-supplier table
# is sf-scaled (10k x sf rows), so it STAYS a dataset: the global max is a
# distributed scalar aggregate over the materialized revenue blocks, the
# argmax filter runs per block, and only the tie set (usually one row)
# meets supplier in a hash join.  Nothing sized by |suppliers| ever reaches
# the driver.  Ties keep every argmax supplier, exactly like the SQL.
# ---------------------------------------------------------------------------

def q_top_supplier_revenue(sf_dir: str):
    from ..rayops import fit_for_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
            pa.scalar(100.0))
        cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                        pa.int64())
        g = (pa.table({"l_suppkey": batch.column("l_suppkey"),
                       "cents": cents})
             .group_by("l_suppkey").aggregate([("cents", "sum")]))
        return g.rename_columns(["l_suppkey", "p_cents"])

    # fit_for_join materializes the bounded per-supplier table ONCE into
    # the object store; max + argmax-filter are then cheap re-reads of the
    # same blocks, not a second lineitem scan
    rev = fit_for_join(
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("p_cents", alias_name="total_revenue_cents")),
        pa.schema([("l_suppkey", pa.int64()),
                   ("total_revenue_cents", pa.int64())]))
    mx = rev.max("total_revenue_cents")  # distributed scalar aggregate
    if mx is None:  # no lineitems in the Q15 window: empty, same shape
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue_cents": pd.Series(
                                 [], dtype="int64")})
    best = fit_for_join(
        rev.filter(expr=f"total_revenue_cents == {int(mx)}"),
        pa.schema([("l_suppkey", pa.int64()),
                   ("total_revenue_cents", pa.int64())]))
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    out = (best.join(sup, join_type="inner", num_partitions=2,
                     on=("l_suppkey",), right_on=("s_suppkey",))
           .to_pandas())  # <= |argmax ties| rows
    out["total_revenue_cents"] = out["total_revenue_cents"].astype("int64")
    out["s_suppkey"] = out["l_suppkey"].astype("int64")
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_revenue_cents"]]


# ---------------------------------------------------------------------------
# TPC-H Q7 analogue (bilateral nation-pair shipping volume): supplier and
# customer nationkeys decorate each side via broadcast sorted-key arrays
# (both filtered to the two nations of interest BEFORE the exchange), so the
# hash join moves only (orderkey, nation, year, cents) partials from the two
# pruned slices.  Final rollup is 2 pair-directions x years.
# ---------------------------------------------------------------------------

def q_nation_pair_volume(sf_dir: str, *, route: str | None = None):
    """TPC-H Q7 analogue.  The order-fact sides always meet in a hash
    join; the supplier/customer nation attach is size-routed: broadcast
    sorted-array lookups below _BCAST_DIM_MAX_ROWS, hash-partitioned joins
    against the nation-filtered dimension reads (predicate pushed to
    parquet) past it."""
    import pyarrow.parquet as pq
    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    nat_a, nat_b = 1, 2  # NATION_1 <-> NATION_2, both directions
    if route is None:
        dim_rows = max(
            pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows,
            pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows)
        route = "broadcast" if dim_rows <= _BCAST_DIM_MAX_ROWS else "hashjoin"

    class _LineSide:
        def __init__(self, ref):
            self.keys, self.nat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hit, s_nat = _sorted_lookup(
                self.keys, self.nat,
                batch.column("l_suppkey").to_numpy())
            keep = hit & ((s_nat == nat_a) | (s_nat == nat_b))
            rev = pc.multiply(pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64()).to_numpy()[keep]
            year = pc.year(batch.column("l_shipdate")).to_numpy()[keep]
            ok = batch.column("l_orderkey").to_numpy()[keep]
            g = (pa.table({"o_orderkey": pa.array(ok, pa.int64()),
                           "s_nat": pa.array(s_nat[keep], pa.int64()),
                           "l_year": pa.array(year, pa.int64()),
                           "cents": pa.array(cents, pa.int64())})
                 .group_by(["o_orderkey", "s_nat", "l_year"])
                 .aggregate([("cents", "sum")]))
            return g.rename_columns(["o_orderkey", "s_nat", "l_year",
                                     "p_cents"])

    class _OrderSide:
        def __init__(self, ref):
            self.keys, self.nat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hit, c_nat = _sorted_lookup(
                self.keys, self.nat,
                batch.column("o_custkey").to_numpy())
            keep = hit & ((c_nat == nat_a) | (c_nat == nat_b))
            return pa.table({
                "o_orderkey": pa.array(
                    batch.column("o_orderkey").to_numpy()[keep], pa.int64()),
                "c_nat": pa.array(c_nat[keep], pa.int64())})

    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    lhs_schema = pa.schema([("o_orderkey", pa.int64()), ("s_nat", pa.int64()),
                            ("l_year", pa.int64()), ("p_cents", pa.int64())])
    rhs_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("c_nat", pa.int64())])
    nparts = _join_parts(sf_dir, "lineitem")
    if route == "broadcast":
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sk = sup.column("s_suppkey").to_numpy()
        so = np.argsort(sk)
        sup_ref = ray.put((sk[so], sup.column("s_nationkey").to_numpy()[so]))
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        ck = cust.column("c_custkey").to_numpy()
        co = np.argsort(ck)
        cust_ref = ray.put((ck[co], cust.column("c_nationkey").to_numpy()[co]))
        def line_side(batch: pa.Table) -> pa.Table:
            # task mode: ray.get is a node-local zero-copy view per batch
            return _LineSide(sup_ref)(batch)

        def order_side(batch: pa.Table) -> pa.Table:
            return _OrderSide(cust_ref)(batch)

        lhs = fit_for_join(
            li.map_batches(line_side, batch_format="pyarrow"), lhs_schema)
        rhs = fit_for_join(
            orders.map_batches(order_side, batch_format="pyarrow"),
            rhs_schema)
    else:
        nat_filter = pc.field("s_nationkey").isin([nat_a, nat_b])
        sup_ds = fit_for_join(
            rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"],
                            filter=nat_filter),
            pa.schema([("s_suppkey", pa.int64()),
                       ("s_nationkey", pa.int64())]))
        cust_ds = fit_for_join(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"],
                            filter=pc.field("c_nationkey").isin(
                                [nat_a, nat_b])),
            pa.schema([("c_custkey", pa.int64()),
                       ("c_nationkey", pa.int64())]))
        if sup_ds.count() == 0 or cust_ds.count() == 0:
            # inner semantics: an empty pruned dimension slice empties the
            # result, and Dataset.join rejects a fully-empty side
            return pa.table({"supp_nation": pa.array([], pa.string()),
                             "cust_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "revenue_cents": pa.array([], pa.int64())})

        def li_partial(t: pa.Table) -> pa.Table:
            rev = pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64())
            g = (pa.table({"o_orderkey": t.column("l_orderkey"),
                           "l_suppkey": t.column("l_suppkey"),
                           "l_year": pc.cast(pc.year(t.column("l_shipdate")),
                                             pa.int64()),
                           "cents": cents})
                 .group_by(["o_orderkey", "l_suppkey", "l_year"])
                 .aggregate([("cents", "sum")]))
            return g.rename_columns(["o_orderkey", "l_suppkey", "l_year",
                                     "p_cents"])

        li_parts = fit_for_join(
            li.map_batches(li_partial, batch_format="pyarrow"),
            pa.schema([("o_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
                       ("l_year", pa.int64()), ("p_cents", pa.int64())]))
        lhs = fit_for_join(
            li_parts.join(sup_ds, join_type="inner",
                          num_partitions=nparts,
                          on=("l_suppkey",), right_on=("s_suppkey",))
            .map_batches(
                lambda t: pa.table(
                    {"o_orderkey": t.column("o_orderkey"),
                     "s_nat": t.column("s_nationkey"),
                     "l_year": t.column("l_year"),
                     "p_cents": t.column("p_cents")}),
                batch_format="pyarrow"),
            lhs_schema)
        rhs = fit_for_join(
            fit_for_join(orders, pa.schema([("o_orderkey", pa.int64()),
                                            ("o_custkey", pa.int64())]))
            .join(cust_ds, join_type="inner", num_partitions=nparts,
                  on=("o_custkey",), right_on=("c_custkey",))
            .map_batches(
                lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                                    "c_nat": t.column("c_nationkey")}),
                batch_format="pyarrow"),
            rhs_schema)
    if lhs.count() == 0 or rhs.count() == 0:
        # a fully-empty join side crashes Dataset.join even when typed;
        # the pruned slice CAN be empty (no suppliers in either nation)
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue_cents": pa.array([], pa.int64())})
    nparts = _join_parts(sf_dir, "lineitem")
    joined = lhs.join(rhs, join_type="inner", num_partitions=nparts,
                      on=("o_orderkey",), right_on=("o_orderkey",))

    def fold(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.not_equal(t.column("s_nat"), t.column("c_nat")))
        g = (keep.select(["s_nat", "c_nat", "l_year", "p_cents"])
             .group_by(["s_nat", "c_nat", "l_year"])
             .aggregate([("p_cents", "sum")]))
        return g.rename_columns(["s_nat", "c_nat", "l_year", "pp_cents"])

    per = (joined.map_batches(fold, batch_format="pyarrow")
           .groupby(["s_nat", "c_nat", "l_year"])
           .aggregate(Sum("pp_cents", alias_name="revenue_cents"))
           .to_pandas())  # <= 2 directions x years
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    nm = dict(zip(nation["n_nationkey"], nation["n_name"]))
    per["supp_nation"] = per["s_nat"].map(nm)
    per["cust_nation"] = per["c_nat"].map(nm)
    per["revenue_cents"] = per["revenue_cents"].astype("int64")
    per = per.sort_values(["supp_nation", "cust_nation", "l_year"])
    return per[["supp_nation", "cust_nation", "l_year",
                "revenue_cents"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# TPC-H Q8 analogue (supplier-nation market share inside a customer region):
# lineitem folds per-order (target_cents, total_cents) partials — the target
# flag comes from the broadcast supplier lookup — and meets the
# region-filtered, year-decorated orders projection in one hash join.  The
# share per year is one division of two exact integer sums.
# ---------------------------------------------------------------------------

def q_region_market_share(sf_dir: str, *, route: str | None = None):
    """TPC-H Q8 analogue.  Size-routed: below _BCAST_DIM_MAX_ROWS the
    supplier->nation and customer->region maps are broadcast lookups fused
    into the fact scans; past it the per-order lineitem partials carry the
    suppkey into a hash join with supplier, and orders meet the
    region-filtered customer read in a second hash join."""
    import pyarrow.parquet as pq
    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    target_nat = 2   # NATION_2's share ...
    region = 2       # ... of the ASIA customer market
    if route is None:
        dim_rows = max(
            pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows,
            pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows)
        route = "broadcast" if dim_rows <= _BCAST_DIM_MAX_ROWS else "hashjoin"
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    reg_of = np.zeros(
        int(nation.column("n_nationkey").to_numpy().max()) + 1, np.int64)
    reg_of[nation.column("n_nationkey").to_numpy()] = (
        nation.column("n_regionkey").to_numpy())
    if route == "broadcast":
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        sk = sup.column("s_suppkey").to_numpy()
        so = np.argsort(sk)
        sup_ref = ray.put((sk[so], sup.column("s_nationkey").to_numpy()[so]))
        cust = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        ck = cust.column("c_custkey").to_numpy()
        co = np.argsort(ck)
        cust_ref = ray.put(
            (ck[co], reg_of[cust.column("c_nationkey").to_numpy()][co]))

    class _LinePartial:
        def __init__(self, ref):
            self.keys, self.nat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rev = pc.multiply(pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64()).to_numpy()
            hit, nat_at = _sorted_lookup(
                self.keys, self.nat,
                batch.column("l_suppkey").to_numpy())
            tgt = np.where(hit & (nat_at == target_nat), cents, 0)
            g = (pa.table({"o_orderkey": batch.column("l_orderkey"),
                           "t": pa.array(tgt, pa.int64()),
                           "c": pa.array(cents, pa.int64())})
                 .group_by("o_orderkey")
                 .aggregate([("t", "sum"), ("c", "sum")]))
            return g.rename_columns(["o_orderkey", "p_target", "p_total"])

    class _OrderSide:
        def __init__(self, ref):
            self.keys, self.reg = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            hit, reg_at = _sorted_lookup(
                self.keys, self.reg,
                batch.column("o_custkey").to_numpy())
            keep = hit & (reg_at == region)
            return pa.table({
                "o_orderkey": pa.array(
                    batch.column("o_orderkey").to_numpy()[keep], pa.int64()),
                "o_year": pa.array(
                    pc.year(batch.column("o_orderdate")).to_numpy()[keep],
                    pa.int64())})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pds.field("o_orderdate") >= lo)
                & (pds.field("o_orderdate") < hi)))
    lhs_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("p_target", pa.int64()),
                            ("p_total", pa.int64())])
    rhs_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_year", pa.int64())])
    if route == "broadcast":
        def line_partial(batch: pa.Table) -> pa.Table:
            return _LinePartial(sup_ref)(batch)

        def order_side(batch: pa.Table) -> pa.Table:
            return _OrderSide(cust_ref)(batch)

        lhs = fit_for_join(
            li.map_batches(line_partial, batch_format="pyarrow"),
            lhs_schema)
        rhs = fit_for_join(
            orders.map_batches(order_side, batch_format="pyarrow"),
            rhs_schema)
    else:
        jparts = _join_parts(sf_dir, "lineitem")

        def li_partial(t: pa.Table) -> pa.Table:
            rev = pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(100.0))
            cents = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                            pa.int64())
            g = (pa.table({"o_orderkey": t.column("l_orderkey"),
                           "l_suppkey": t.column("l_suppkey"),
                           "c": cents})
                 .group_by(["o_orderkey", "l_suppkey"])
                 .aggregate([("c", "sum")]))
            return g.rename_columns(["o_orderkey", "l_suppkey", "p_cents"])

        # left_outer keeps non-target suppliers' revenue in the total;
        # only the target-nation flag arrives via the (pushed-filter) join.
        # the explicit tgt payload column is required: Dataset.join drops
        # the right KEY column from its output, so a key-only right side
        # would leave no way to tell matched rows apart
        sup_tgt = fit_for_join(
            rd.read_parquet(
                f"{sf_dir}/supplier.parquet", columns=["s_suppkey"],
                filter=(pc.field("s_nationkey") == target_nat))
            .map_batches(
                lambda t: t.append_column(
                    "tgt", pa.array(np.ones(t.num_rows, np.int8))),
                batch_format="pyarrow"),
            pa.schema([("s_suppkey", pa.int64()), ("tgt", pa.int8())]))
        li_parts = fit_for_join(
            li.map_batches(li_partial, batch_format="pyarrow"),
            pa.schema([("o_orderkey", pa.int64()),
                       ("l_suppkey", pa.int64()), ("p_cents", pa.int64())]))

        def tag_fold(t: pa.Table) -> pa.Table:
            cents = t.column("p_cents").to_numpy()
            if "tgt" in t.column_names:
                is_tgt = pc.is_valid(t.column("tgt")).to_numpy(
                    zero_copy_only=False)
            else:
                # left_outer partitions with an empty right side come back
                # as the left block verbatim (no null right columns)
                is_tgt = np.zeros(t.num_rows, dtype=bool)
            g = (pa.table({"o_orderkey": t.column("o_orderkey"),
                           "t": pa.array(np.where(is_tgt, cents, 0),
                                         pa.int64()),
                           "c": pa.array(cents, pa.int64())})
                 .group_by("o_orderkey")
                 .aggregate([("t", "sum"), ("c", "sum")]))
            return g.rename_columns(["o_orderkey", "p_target", "p_total"])

        def zero_fold(t: pa.Table) -> pa.Table:
            # no target-nation suppliers at all: totals survive, target=0
            g = (pa.table({"o_orderkey": t.column("o_orderkey"),
                           "t": pa.array(np.zeros(t.num_rows, np.int64),
                                         pa.int64()),
                           "c": t.column("p_cents")})
                 .group_by("o_orderkey")
                 .aggregate([("t", "sum"), ("c", "sum")]))
            return g.rename_columns(["o_orderkey", "p_target", "p_total"])

        if sup_tgt.count() == 0:  # Dataset.join rejects a fully-empty side
            tagged_folds = li_parts.map_batches(zero_fold,
                                                batch_format="pyarrow")
        else:
            tagged_folds = (li_parts.join(
                sup_tgt, join_type="left_outer", num_partitions=jparts,
                on=("l_suppkey",), right_on=("s_suppkey",))
                .map_batches(tag_fold, batch_format="pyarrow"))
        lhs = fit_for_join(tagged_folds, lhs_schema)
        cust_reg = fit_for_join(
            rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey"],
                            filter=pc.field("c_nationkey").isin(
                                np.flatnonzero(
                                    reg_of == region).tolist())),
            pa.schema([("c_custkey", pa.int64()),
                       ("c_nationkey", pa.int64())]))
        if cust_reg.count() == 0:  # no customers in the region
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "target_cents": pa.array([], pa.int64()),
                             "total_cents": pa.array([], pa.int64()),
                             "mkt_share": pa.array([], pa.float64())})

        def year_proj(t: pa.Table) -> pa.Table:
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_year": pc.cast(
                                 pc.year(t.column("o_orderdate")),
                                 pa.int64())})

        rhs = fit_for_join(
            fit_for_join(orders,
                         pa.schema([("o_orderkey", pa.int64()),
                                    ("o_custkey", pa.int64()),
                                    ("o_orderdate", pa.timestamp("us"))]))
            .join(cust_reg, join_type="inner", num_partitions=jparts,
                  on=("o_custkey",), right_on=("c_custkey",))
            .map_batches(year_proj, batch_format="pyarrow"),
            rhs_schema)
    if rhs.count() == 0:  # no customers in the region at this scale
        return pa.table({"o_year": pa.array([], pa.int64()),
                         "target_cents": pa.array([], pa.int64()),
                         "total_cents": pa.array([], pa.int64()),
                         "mkt_share": pa.array([], pa.float64())})
    nparts = _join_parts(sf_dir, "lineitem")
    joined = lhs.join(rhs, join_type="inner", num_partitions=nparts,
                      on=("o_orderkey",), right_on=("o_orderkey",))

    def fold(t: pa.Table) -> pa.Table:
        g = (t.select(["o_year", "p_target", "p_total"])
             .group_by("o_year")
             .aggregate([("p_target", "sum"), ("p_total", "sum")]))
        return g.rename_columns(["o_year", "pp_target", "pp_total"])

    out = (joined.map_batches(fold, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("pp_target", alias_name="target_cents"),
                      Sum("pp_total", alias_name="total_cents"))
           .to_pandas().sort_values("o_year").reset_index(drop=True))
    out["target_cents"] = out["target_cents"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    out["mkt_share"] = (out["target_cents"].to_numpy().astype(np.float64)
                        / out["total_cents"].to_numpy().astype(np.float64))
    return out[["o_year", "target_cents", "total_cents", "mkt_share"]]


# ---------------------------------------------------------------------------
# corpus token familiarity (unigram-LM signal): pass 1 builds distributed
# corpus word counts (partial tf inside map_batches, one groupby).  Pass 2
# is size-routed on the measured vocabulary cardinality (the groupby output,
# always tiny next to the corpus):
#
# - broadcast (|vocab| <= _BCAST_DIM_MAX_ROWS): the sorted (word, count)
#   arrays ship once via ray.put and each scan batch folds familiarity
#   in place — every document lives wholly in one batch, so the per-doc
#   sums are final per batch and pass 2 has ZERO exchanges (measured
#   sf0.1/32cpu alternating A/B: 11.2 s join route -> 7.1 s broadcast).
# - join (web-scale vocabulary): each doc's (word, tf) partials hash-join
#   back to the counts — vocabulary never sits on the driver — and fold
#   per-doc integer sums.
#
# The average is one division of exact integers, so the double is
# oracle-stable.  Same whitespace tokenizer contract as top_words
# (str.split == \s+ split).  Routes pinned equal in test_query_shapes.py.
# ---------------------------------------------------------------------------

def _doc_tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
    words = batch.set_index("doc_id")["text"].str.split().explode().dropna()
    tf = (words.to_frame("w").groupby(["doc_id", "w"]).size()
          .rename("tf").reset_index())
    return tf.astype({"doc_id": "int64", "tf": "int64"})


class _FamFold:
    """Broadcast-route pass 2: fold per-doc familiarity inside the scan.

    Each document row is wholly contained in one batch, so the per-doc
    (n_tokens, familiarity_sum) pair is final within the batch — no
    downstream groupby or join."""

    def __init__(self, r):
        self.words, self.cnt = ray.get(r)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tf = _doc_tf_partial(batch)
        idx = pc.index_in(pa.array(tf["w"]), self.words)
        c = self.cnt[idx.to_numpy(zero_copy_only=False)]
        tf["fam"] = tf["tf"].to_numpy() * c
        g = tf.groupby("doc_id", sort=False).agg(
            n_tokens=("tf", "sum"), familiarity_sum=("fam", "sum"))
        return g.reset_index().astype({"n_tokens": "int64",
                                       "familiarity_sum": "int64"})


def q_token_familiarity(sf_dir: str, *, route: str | None = None):
    from ..rayops import fit_for_join

    tf = (_docs(sf_dir, ["doc_id", "text"])
          .map_batches(_doc_tf_partial, batch_format="pandas"))
    counts = (tf.map_batches(
        lambda t: t.select(["w", "tf"]).group_by("w")
        .aggregate([("tf", "sum")]).rename_columns(["w", "pc"]),
        batch_format="pyarrow")
        .groupby("w").aggregate(Sum("pc", alias_name="c")))
    if route is None:
        counts = counts.materialize()  # the groupby runs either way
        route = ("broadcast" if counts.count() <= _BCAST_DIM_MAX_ROWS
                 else "join")

    if route == "broadcast":
        vocab = pa.concat_tables(
            counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        vocab = vocab.take(
            pc.sort_indices(vocab, sort_keys=[("w", "ascending")]))
        vref = ray.put((vocab.column("w").combine_chunks(),
                        vocab.column("c").to_numpy()))
        def fam_fold(batch: pd.DataFrame) -> pd.DataFrame:
            # task mode: ray.get is a node-local zero-copy view per batch
            return _FamFold(vref)(batch)

        out = (_docs(sf_dir, ["doc_id", "text"])
               .map_batches(fam_fold, batch_format="pandas")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        out["avg_familiarity"] = (
            out["familiarity_sum"].to_numpy().astype(np.float64)
            / out["n_tokens"].to_numpy().astype(np.float64))
        return out[["doc_id", "n_tokens", "familiarity_sum",
                    "avg_familiarity"]]

    tf_schema = pa.schema([("doc_id", pa.int64()), ("w", pa.large_string()),
                           ("tf", pa.int64())])
    ct_schema = pa.schema([("w", pa.large_string()), ("c", pa.int64())])
    nparts = _join_parts(sf_dir, "documents")
    joined = fit_for_join(tf, tf_schema).join(
        fit_for_join(counts, ct_schema), join_type="inner",
        num_partitions=nparts, on=("w",), right_on=("w",))

    def fold(t: pa.Table) -> pa.Table:
        fam = pc.multiply(t.column("tf"), t.column("c"))
        g = (pa.table({"doc_id": t.column("doc_id"), "n": t.column("tf"),
                       "fam": fam})
             .group_by("doc_id").aggregate([("n", "sum"), ("fam", "sum")]))
        return g.rename_columns(["doc_id", "p_n", "p_fam"])

    out = (_bucket_fold(joined.map_batches(fold, batch_format="pyarrow"),
                        "doc_id", {"p_n": ("n_tokens", "sum"),
                                   "p_fam": ("familiarity_sum", "sum")})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["familiarity_sum"] = out["familiarity_sum"].astype("int64")
    out["avg_familiarity"] = (
        out["familiarity_sum"].to_numpy().astype(np.float64)
        / out["n_tokens"].to_numpy().astype(np.float64))
    return out[["doc_id", "n_tokens", "familiarity_sum", "avg_familiarity"]]


# ---------------------------------------------------------------------------
# grouped interpolated median (percentile_cont per group): per-(type, cents)
# histogram partials -> one small groupby; the per-type h=(n-1)q fold runs on
# the bounded (types x distinct cents) table driver-side.
# ---------------------------------------------------------------------------

def q_value_p50_by_type_cont(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        g = (pa.table({"event_type": batch.column("event_type"),
                       "cents": cents})
             .group_by(["event_type", "cents"])
             .aggregate([("cents", "count")]))
        return g.rename_columns(["event_type", "cents", "pn"])

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values(["event_type", "cents"]))

    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        cum = g["n"].cumsum().to_numpy()
        vals = g["cents"].to_numpy()
        total = int(cum[-1])

        def order_stat(i: int) -> float:
            return float(vals[int(np.searchsorted(cum, i + 1))])

        h = (total - 1) * 0.5
        lo = math.floor(h)
        frac = h - lo
        x_lo = order_stat(lo)
        p50 = x_lo if frac == 0.0 else (
            x_lo + (order_stat(min(lo + 1, total - 1)) - x_lo) * frac)
        rows.append((et, p50))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "p50_cents": pa.array([r[1] for r in rows], pa.float64())})


# ---------------------------------------------------------------------------
# global NTILE without a global sort: the bounded cents histogram yields each
# distinct value's global base rank; equal-valued rows then co-locate via one
# groupby and rank locally by event_id.  Bucket assignment replays the SQL
# NTILE size rule (first n%k buckets get one extra row) on the exact global
# rank, so the result matches ntile() row-for-row.
# ---------------------------------------------------------------------------

def q_events_value_ntile(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        return pa.table({"event_id": batch.column("event_id"),
                         "cents": cents})

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    hist = (tagged.map_batches(
        lambda t: t.group_by("cents").aggregate([("cents", "count")])
        .rename_columns(["cents", "pn"]), batch_format="pyarrow")
        .groupby("cents").aggregate(Sum("pn", alias_name="n"))
        .to_pandas().sort_values("cents").reset_index(drop=True))
    n_total = int(hist["n"].sum())
    base = np.concatenate(([0], hist["n"].cumsum().to_numpy()[:-1]))
    base_ref = ray.put(dict(zip(hist["cents"].astype("int64"), base)))
    k = 4
    q, r = divmod(n_total, k)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        # whole coarse VALUE bucket (per-distinct-cents map_groups is
        # dispatch-bound on near-continuous domains): sort by (cents,
        # event_id), segment, vectorized global ranks per segment
        base_of = ray.get(base_ref)
        g = group.sort_values(["cents", "event_id"], kind="mergesort")
        c = g["cents"].to_numpy()
        seg_start = np.concatenate(([True], c[1:] != c[:-1]))
        seg_id = np.cumsum(seg_start) - 1
        pos = np.arange(len(c)) - np.flatnonzero(seg_start)[seg_id]
        bases = np.asarray([base_of[int(v)] for v in c[seg_start]],
                           dtype=np.int64)
        rank = bases[seg_id] + pos
        big = r * (q + 1)
        quart = np.where(rank < big, rank // max(q + 1, 1),
                         r + (rank - big) // max(q, 1)) + 1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "quartile": quart.astype("int64")})

    nb_c = _session_buckets()

    def add_cents_bucket(tb: pa.Table) -> pa.Table:
        b = pc.cast(pc.subtract(
            tb.column("cents"),
            pc.multiply(pc.divide(tb.column("cents"), nb_c), nb_c)),
            pa.int64())
        return tb.append_column("cbucket", b)

    out = (tagged.map_batches(add_cents_bucket, batch_format="pyarrow")
           .groupby("cbucket")
           .map_groups(assign, batch_format="pandas").to_pandas())
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# UNPIVOT / melt: wide per-doc metrics -> long (doc_id, metric, v) rows.
# Embarrassingly parallel per-batch reshape; n_words reuses the word_count
# whitespace-token contract.
# ---------------------------------------------------------------------------

def q_doc_metrics_unpivot(sf_dir: str):
    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        nw = batch["text"].str.split().str.len().astype("int64")
        wide = pd.DataFrame({"doc_id": batch["doc_id"],
                             "n_chars": batch["n_chars"].astype("int64"),
                             "n_words": nw})
        long = wide.melt(id_vars="doc_id", var_name="metric", value_name="v")
        return long.astype({"v": "int64"})

    out = (_docs(sf_dir, ["doc_id", "text", "n_chars"])
           .map_batches(melt, batch_format="pandas").to_pandas())
    return out.sort_values(["doc_id", "metric"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-doc character-class profile (quality signal): ASCII alpha / digit /
# whitespace / other counts via vectorized regex (explicit ASCII classes on
# both sides — RE2's \s and Python's unicode \s disagree on exotic spaces).
# The ratio is one division of exact integers.
# ---------------------------------------------------------------------------

def q_char_class_profile(sf_dir: str):
    def profile(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"]
        n = s.str.len().astype("int64")
        alpha = s.str.count(r"[A-Za-z]").astype("int64")
        digit = s.str.count(r"[0-9]").astype("int64")
        space = s.str.count(r"[ \t\n\r\f]").astype("int64")
        other = n - alpha - digit - space
        ratio = np.where(n.to_numpy() > 0,
                         alpha.to_numpy().astype(np.float64)
                         / np.maximum(n.to_numpy(), 1).astype(np.float64),
                         0.0)
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_chars_text": n,
                             "n_alpha": alpha, "n_digit": digit,
                             "n_space": space, "n_other": other,
                             "alpha_ratio": ratio})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(profile, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# collocation mining (PMI of the top-20 bigrams): distributed bigram and
# unigram counts (both partial-agg shapes already proven by top_bigrams /
# top_words); only the <= 20 winning bigrams and their <= 40 member words
# ever reach the driver, where the PMI double is computed with the same
# ln((p_ab)/(p_a*p_b)) association order as the oracle expression.
# ---------------------------------------------------------------------------

def q_bigram_pmi(sf_dir: str):
    nb = _session_buckets()

    def fold_counts(key: str, out: str):
        # coarse-bucket fold: Dataset.aggregate's accumulate is ~quadratic
        # in rows/block (hundreds of thousands of per-block partial rows
        # here), the in-bucket pandas integer sum is exact and linear
        def add_b(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["sb"] = (pd.util.hash_array(b[key].to_numpy(object))
                       % nb).astype(np.int32)
            return b

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            o = g.groupby(key, as_index=False)["pn"].sum()
            o["pn"] = o["pn"].astype("int64")
            return o.rename(columns={"pn": out})

        return add_b, fold

    add_bg, fold_bg = fold_counts("bg", "n")
    bg_counts = (_docs(sf_dir, ["doc_id", "text"])
                 .map_batches(_bigram_partial, batch_format="pandas")
                 .map_batches(add_bg, batch_format="pandas")
                 .groupby("sb").map_groups(fold_bg, batch_format="pandas")
                 .materialize())
    total_bigrams = int(bg_counts.sum("n"))
    top = _topk(bg_counts, "n", "bg", 20)[["bg", "n"]]

    words = set()
    for b in top["bg"]:
        a, c = b.split(" ", 1)
        words.update((a, c))
    words_ref = ray.put(words)

    add_w, fold_w = fold_counts("w", "c")
    uni = (_docs(sf_dir, ["text"])
           .map_batches(_word_freq_partial, batch_format="pandas")
           .map_batches(add_w, batch_format="pandas")
           .groupby("sb").map_groups(fold_w, batch_format="pandas")
           .materialize())
    total_tokens = int(uni.sum("c"))

    def keep_members(batch: pd.DataFrame) -> pd.DataFrame:
        ws = ray.get(words_ref)
        return batch[batch["w"].isin(ws)]

    members = (uni.map_batches(keep_members, batch_format="pandas")
               .to_pandas())  # <= 40 rows
    c_of = dict(zip(members["w"], members["c"].astype("int64")))

    rows = []
    for bg, n_ab in zip(top["bg"], top["n"].astype("int64")):
        a, b = bg.split(" ", 1)
        c_a, c_b = c_of[a], c_of[b]
        pmi = math.log((n_ab / total_bigrams)
                       / ((c_a / total_tokens) * (c_b / total_tokens)))
        rows.append((bg, int(n_ab), int(c_a), int(c_b), pmi))
    out = pd.DataFrame(rows, columns=["bg", "n_bigram", "n_a", "n_b", "pmi"])
    return (out.sort_values(["n_bigram", "bg"], ascending=[False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# exact set-similarity join via prefix filtering (PPJoin-style): a pair with
# word-set Jaccard >= t MUST share a token inside each side's (|d| -
# ceil(t*|d|) + 1)-token prefix when both sides order tokens by one global
# (document-frequency, word) order — rare tokens first, so prefix buckets
# stay small.  Candidates come from a token-keyed groupby (the only
# exchange that touches every doc); verification joins only the candidate
# pairs back to word sets.  Unlike MinHash this is EXACT: output equals the
# brute-force Jaccard join, which is what the oracle computes.
# ---------------------------------------------------------------------------

_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1).astype(np.uint16)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy here lacks
    ``bitwise_count``): byte-view + 256-entry LUT."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(*x.shape, 8)
    return _POPCNT8[b].sum(-1).astype(np.int64)


def q_set_similarity_join(sf_dir: str, *, route: str | None = None):
    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    t = 0.5

    docs = _docs(sf_dir, ["doc_id", "text"])
    seen: set = set()
    if route in (None, "bitmask"):
        # the prefix-filter plan degenerates when the corpus vocabulary is
        # tiny (every token sits in thousands of prefixes -> the candidate
        # set approaches all-pairs and the verify join dominates: 172 s at
        # sf0.1 on this 31-word synthetic vocabulary).  Detect that case
        # with an early-exit streamed distinct scan: the driver holds at
        # most one block's distinct words + 65 entries.
        vocab_parts = docs.map_batches(
            lambda b: pd.DataFrame({"w": pd.unique(
                b["text"].str.split().explode().dropna())}),
            batch_format="pandas")
        for vb in vocab_parts.iter_batches(batch_size=8192,
                                           batch_format="pandas"):
            seen.update(vb["w"])
            if route is None and len(seen) > 64:
                break
        if route is None:
            route = "bitmask" if len(seen) <= 64 else "prefix"

    if route == "bitmask":
        # EXACT small-vocabulary path: each doc's word set is one uint64
        # bitmask over the <= 64-word vocabulary, Jaccard is integer
        # popcount arithmetic (2*inter >= union <=> jaccard >= 0.5, and
        # inter >= 1 mirrors the oracle's shared-word inner join).  The
        # output of this regime is inherently near-quadratic in docs, so
        # any exact algorithm is Omega(pairs); this one emits them at
        # popcount speed, streamed per block against the broadcast mask
        # array (16 B/doc — the dimension-broadcast budget).
        seen_sorted = sorted(seen)
        bit_of = {w: np.uint64(1 << i) for i, w in enumerate(seen_sorted)}
        bref = ray.put(bit_of)

        def mask_batch(b: pd.DataFrame) -> pd.DataFrame:
            bo = ray.get(bref)
            masks = np.zeros(len(b), np.uint64)
            for j, txt in enumerate(b["text"]):
                m = np.uint64(0)
                for w in set(txt.split()):
                    m |= bo[w]
                masks[j] = m
            return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                                 "mask": masks})

        masks = (docs.map_batches(mask_batch, batch_format="pandas")
                 .materialize())
        all_df = masks.to_pandas().sort_values("doc_id")
        ids_all = all_df["doc_id"].to_numpy(np.int64)
        m_all = all_df["mask"].to_numpy().astype(np.uint64)
        pop_all = _popcount64(m_all)
        aref = ray.put((ids_all, m_all, pop_all))

        class _PairScan:
            def __init__(self):
                self.ids, self.masks, self.pops = ray.get(aref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                ids_b = b["doc_id"].to_numpy(np.int64)
                m_b = b["mask"].to_numpy().astype(np.uint64)
                pop_b = _popcount64(m_b)
                out_a, out_b = [], []
                for c0 in range(0, len(self.ids), 4096):
                    c1 = min(c0 + 4096, len(self.ids))
                    inter = _popcount64(
                        m_b[:, None] & self.masks[None, c0:c1])
                    union = pop_b[:, None] + self.pops[None, c0:c1] - inter
                    keep = ((inter >= 1) & (2 * inter >= union)
                            & (ids_b[:, None] < self.ids[None, c0:c1]))
                    ai, bi = np.nonzero(keep)
                    out_a.append(ids_b[ai])
                    out_b.append(self.ids[c0:c1][bi])
                a = (np.concatenate(out_a) if out_a
                     else np.empty(0, np.int64))
                bb = (np.concatenate(out_b) if out_b
                      else np.empty(0, np.int64))
                return pd.DataFrame({"a": a.astype(np.int64),
                                     "b": bb.astype(np.int64)})

        pairs = (masks.map_batches(_PairScan, batch_format="pandas",
                                   concurrency=(1, 8)).to_pandas())
        out = pa.table({"a": pa.array(pairs["a"].to_numpy(), pa.int64()),
                        "b": pa.array(pairs["b"].to_numpy(), pa.int64())})
        return out.take(pc.sort_indices(
            out, sort_keys=[("a", "ascending"), ("b", "ascending")]))

    def wordset_batch(b: pd.DataFrame) -> pd.DataFrame:
        ws = b["text"].str.split().map(
            lambda l: sorted(set(l)) if isinstance(l, list) else [])
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "w": ws}).explode("w").dropna()

    tokens = (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(wordset_batch, batch_format="pandas"))
    dfreq = (tokens.map_batches(
        lambda tb: tb.select(["w"]).group_by("w")
        .aggregate([("w", "count")]).rename_columns(["w", "pdf"]),
        batch_format="pyarrow")
        .groupby("w").aggregate(Sum("pdf", alias_name="df")))

    tok_schema = pa.schema([("doc_id", pa.int64()), ("w", pa.large_string())])
    df_schema = pa.schema([("w", pa.large_string()), ("df", pa.int64())])
    nparts = _join_parts(sf_dir, "documents")
    decorated = fit_for_join(tokens, tok_schema).join(
        fit_for_join(dfreq, df_schema), join_type="inner",
        num_partitions=nparts, on=("w",), right_on=("w",))

    # coarse-bucket by doc hash: per-GROUP UDF dispatch over every doc_id
    # would be dispatch-bound at corpus scale (the LSH group-by lesson);
    # inside a bucket, per-doc prefixes come from one vectorized
    # sort + segment pass
    nb_docs = _session_buckets()

    def add_doc_bucket(tb: pa.Table) -> pa.Table:
        b = pc.cast(pc.subtract(
            tb.column("doc_id"),
            pc.multiply(pc.divide(tb.column("doc_id"), nb_docs), nb_docs)),
            pa.int64())
        return tb.append_column("dbucket", b)

    def prefix_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "w"], kind="mergesort")
        d = g["doc_id"].to_numpy()
        seg_start = np.concatenate(([True], d[1:] != d[:-1]))
        seg_id = np.cumsum(seg_start) - 1
        sizes = np.bincount(seg_id)
        n_of_row = sizes[seg_id]
        pos = np.arange(len(d)) - np.flatnonzero(seg_start)[seg_id]
        plen = n_of_row - np.ceil(t * n_of_row).astype(np.int64) + 1
        keep = pos < plen
        return pd.DataFrame({"doc_id": d[keep],
                             "w": g["w"].to_numpy()[keep],
                             "n": n_of_row[keep].astype("int64")})

    prefixes = (decorated.map_batches(add_doc_bucket, batch_format="pyarrow")
                .groupby("dbucket")
                .map_groups(prefix_bucket, batch_format="pandas"))

    # Degenerate-token guard: 0 (default) = uncapped, keeping the query
    # EXACT — prefix filtering already bounds per-doc candidate tokens, so
    # only a boilerplate token shared by >cap docs can blow up a segment.
    # Set OCR_SETSIM_TOKEN_CAP>0 to trade exactness for skew protection;
    # every truncation is logged so a silent miss can't masquerade as exact.
    tok_cap = int(os.environ.get("OCR_SETSIM_TOKEN_CAP", "0"))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # whole coarse TOKEN bucket (per-token map_groups would be
        # dispatch-bound at vocabulary scale): loop over token segments
        # inside, all-pairs per segment
        out_a, out_b = [], []
        for _w, grp in g.groupby("w", sort=False):
            ids = np.unique(grp["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            if tok_cap and len(ids) > tok_cap:
                import logging
                logging.getLogger("ocr_main_ray").warning(
                    "set_similarity_join: token %r candidate list truncated "
                    "%d -> %d (OCR_SETSIM_TOKEN_CAP); result is approximate "
                    "for pairs only linked by this token", _w, len(ids),
                    tok_cap)
                ids = ids[:tok_cap]
            ai, bi = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ai])
            out_b.append(ids[bi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "a": np.concatenate(out_a).astype("int64"),
            "b": np.concatenate(out_b).astype("int64")}).drop_duplicates()

    import zlib as _zlib
    nb_tok = _session_buckets()

    def add_tok_bucket(tb: pa.Table) -> pa.Table:
        b = np.fromiter((_zlib.crc32(w.encode()) % nb_tok
                         for w in tb.column("w").to_pylist()),
                        dtype=np.int64, count=tb.num_rows)
        return tb.append_column("tbucket", pa.array(b, pa.int64()))

    cand = (prefixes.map_batches(add_tok_bucket, batch_format="pyarrow")
            .groupby("tbucket")
            .map_groups(bucket_pairs, batch_format="pandas")
            .to_pandas().drop_duplicates())  # bounded: pairs, not docs

    # distributed exact verification (same join shape as MinHash verify —
    # word sets, not shingles; texts never reach the driver)
    from ..functions.dedup import verify_pairs_distributed
    from ..rayops import concat_batches

    cand_ds = rd.from_arrow(pa.table({
        "a": pa.array(cand["a"].to_numpy(), pa.int64()),
        "b": pa.array(cand["b"].to_numpy(), pa.int64())}))
    verified = verify_pairs_distributed(
        cand_ds, _docs(sf_dir, ["doc_id", "text"]), threshold=t, mode="words")
    out = concat_batches(
        verified.iter_batches(batch_size=1 << 20, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()),
                   ("jaccard", pa.float64())])).select(["a", "b"])
    return out.take(pc.sort_indices(out, sort_keys=[("a", "ascending"),
                                                    ("b", "ascending")]))


# ---------------------------------------------------------------------------
# rolling 7-day MEDIAN of daily revenue: same distributed daily fold as the
# moving average; the interpolated window median runs on the bounded daily
# series driver-side, mirroring quantile_cont's h=(n-1)/2 rule.
# ---------------------------------------------------------------------------

def q_events_value_7day_median(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        g = (pa.table({"day": day, "cents": cents})
             .group_by("day").aggregate([("cents", "sum")]))
        return g.rename_columns(["day", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("p_cents", alias_name="day_cents"))
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("datetime64[us]")
    out["day_cents"] = out["day_cents"].astype("int64")
    c = out["day_cents"].to_numpy()
    med = np.empty(len(c), np.float64)
    for i in range(len(c)):
        w = np.sort(c[max(0, i - 6):i + 1])
        h = (len(w) - 1) * 0.5
        lo = math.floor(h)
        frac = h - lo
        x_lo = float(w[lo])
        med[i] = x_lo if frac == 0.0 else (
            x_lo + (float(w[min(lo + 1, len(w) - 1)]) - x_lo) * frac)
    out["med7_cents"] = med
    return out[["day", "day_cents", "med7_cents"]]


# ---------------------------------------------------------------------------
# first-seen cohort sizes (new users per day): per-batch min-ts-per-user
# partials -> one user-keyed groupby-min -> tiny day rollup.  The exchange
# carries one row per user per block, never the event log.
# ---------------------------------------------------------------------------

def q_new_users_daily(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "ts": batch.column("ts").cast(pa.int64())})
        g = t.group_by("user_id").aggregate([("ts", "min")])
        return g.rename_columns(["user_id", "p_ts"])

    first = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("p_ts", alias_name="first_ts")))

    def day_partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(
            batch.column("first_ts").cast(pa.timestamp("us")), unit="day")
        g = (pa.table({"day": day}).group_by("day")
             .aggregate([("day", "count")]))
        return g.rename_columns(["day", "pn"])

    out = (first.map_batches(day_partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("pn", alias_name="n_new_users"))
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("datetime64[us]")
    out["n_new_users"] = out["n_new_users"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# ratio-to-report: each nation's share of global order revenue.  The grand
# total folds from the bounded per-nation table driver-side; each share is
# one division of exact integer sums.
# ---------------------------------------------------------------------------

def q_revenue_share_by_nation(sf_dir: str):
    per = q_revenue_by_nation(sf_dir).sort_values("n_name")
    per["revenue_cents"] = per["revenue_cents"].astype("int64")
    total = int(per["revenue_cents"].sum())
    per = per.reset_index(drop=True)
    per["revenue_share"] = (per["revenue_cents"].to_numpy().astype(np.float64)
                            / np.float64(total))
    return per[["n_name", "revenue_cents", "revenue_share"]]


# ---------------------------------------------------------------------------
# approximate quantiles via the mergeable stratified sketch — the
# unbounded-domain scale path beside the exact cents-histogram percentile
# queries.  <= QSK_K rows leave each block; the driver folds O(k x blocks)
# rows.  Rows-only (approximate by design); the 1/(2k) rank-error bound is
# asserted against exact nearest-rank in tests/test_sketch.py.
# ---------------------------------------------------------------------------

def q_events_value_approx_quantiles(sf_dir: str):
    from ..functions.sketch import quantile_partial, quantile_query

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        return quantile_partial(cents.to_numpy())

    merged = (ds.map_batches(partial, batch_format="pyarrow").to_pandas())
    p50, p90, p99 = quantile_query(merged["qv"].to_numpy(),
                                   merged["qw"].to_numpy(),
                                   [0.5, 0.9, 0.99])
    return pa.table({"p50_approx": pa.array([p50], pa.int64()),
                     "p90_approx": pa.array([p90], pa.int64()),
                     "p99_approx": pa.array([p99], pa.int64()),
                     "n_events": pa.array([int(merged["qw"].sum())],
                                          pa.int64())})


# ---------------------------------------------------------------------------
# activity heatmap (day-of-week x hour): bounded 7x24 key space — pure
# partial-agg shape.  Arrow's day_of_week is Monday=0; DuckDB's dayofweek is
# Sunday=0 — shifted to the SQL convention before the fold.
# ---------------------------------------------------------------------------

def q_events_dow_hour_heatmap(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        dow_mon0 = pc.day_of_week(batch.column("ts"))  # Monday=0
        dow = pc.if_else(pc.equal(dow_mon0, 6), pa.scalar(0, pa.int64()),
                         pc.cast(pc.add(dow_mon0, 1), pa.int64()))
        hour = pc.cast(pc.hour(batch.column("ts")), pa.int64())
        g = (pa.table({"dow": dow, "hour": hour})
             .group_by(["dow", "hour"]).aggregate([("dow", "count")]))
        return g.rename_columns(["dow", "hour", "pn"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["dow", "hour"]).aggregate(Sum("pn", alias_name="n"))
           .to_pandas().sort_values(["dow", "hour"]).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# customer RFM (recency / frequency / monetary): the whole segmentation is
# one grouped fold of three integer partials per customer per block.
# ---------------------------------------------------------------------------

def q_customer_rfm(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "d": batch.column("o_orderdate").cast(pa.int64()),
                      "cents": cents})
        g = t.group_by("o_custkey").aggregate(
            [("d", "max"), ("cents", "count"), ("cents", "sum")])
        return g.rename_columns(["o_custkey", "p_last", "p_n", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("p_last", alias_name="last_order"),
                      Sum("p_n", alias_name="n_orders"),
                      Sum("p_cents", alias_name="total_cents"))
           .to_pandas().sort_values("o_custkey").reset_index(drop=True))
    out["last_order"] = out["last_order"].astype("datetime64[us]")
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out[["o_custkey", "last_order", "n_orders", "total_cents"]]


# ---------------------------------------------------------------------------
# EWMA of daily revenue: distributed daily integer fold, then the inherently
# sequential recurrence runs over the bounded daily rows driver-side with
# the SAME association order (0.3*x + 0.7*prev) as the oracle's recursive
# CTE — bit-identical floats.
# ---------------------------------------------------------------------------

def q_events_value_ewma(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        g = (pa.table({"day": day, "cents": cents})
             .group_by("day").aggregate([("cents", "sum")]))
        return g.rename_columns(["day", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("p_cents", alias_name="day_cents"))
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("datetime64[us]")
    out["day_cents"] = out["day_cents"].astype("int64")
    c = out["day_cents"].to_numpy()
    ew = np.empty(len(c), np.float64)
    if len(c):
        ew[0] = float(c[0])
        for i in range(1, len(c)):
            ew[i] = 0.3 * float(c[i]) + 0.7 * ew[i - 1]
    out["ewma_cents"] = ew
    return out[["day", "day_cents", "ewma_cents"]]


# ---------------------------------------------------------------------------
# Pareto concentration (top-decile revenue share): per-customer integer
# revenue folds distributed (customer is a bounded dimension); the top-k
# prefix and both divisions run on the bounded driver table with the
# oracle's exact ceil(0.1*n) size rule and division order.
# ---------------------------------------------------------------------------

_DECILE_BUCKET_SHIFT = 16  # cents >> 16: value-domain buckets, data-size-free


def q_customer_top_decile_share(sf_dir: str, *, route: str | None = None):
    """Revenue share of the top 10% of customers.  Size-routed: below
    _BCAST_DIM_MAX_ROWS the per-customer revenue table sorts on the
    driver; past it the k-th-largest threshold is found by a two-pass
    distributed order statistic — a value-domain bucket histogram (pass
    1, bounded by domain >> 16 buckets regardless of row count or skew)
    locates the boundary bucket, an exact within-bucket value histogram
    (pass 2, <= 65536 distinct values) pins the threshold T, and
    top_cents = sum(cents > T) + (k - count(> T)) * T (ties all equal T,
    so the custkey tie-break cannot change the sum)."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("local"
                 if pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "distributed")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        g = (pa.table({"o_custkey": batch.column("o_custkey"),
                       "cents": cents})
             .group_by("o_custkey").aggregate([("cents", "sum")]))
        return g.rename_columns(["o_custkey", "p_cents"])

    per_ds = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("o_custkey")
              .aggregate(Sum("p_cents", alias_name="cents")))

    if route == "local":
        per = per_ds.to_pandas()  # bounded by |customers with orders|
        per["cents"] = per["cents"].astype("int64")
        n = len(per)
        total = int(per["cents"].sum())
        k = int(math.ceil(0.1 * n))
        top = (per.sort_values(["cents", "o_custkey"],
                               ascending=[False, True]).head(k))
        top_cents = int(top["cents"].sum())
    else:
        per_ds = per_ds.materialize()  # consumed by three bounded passes
        n = per_ds.count()
        total = int(per_ds.sum("cents") or 0)
        k = int(math.ceil(0.1 * n))

        def bkt_partial(t: pa.Table) -> pa.Table:
            c = t.column("cents").to_numpy()
            g = (pa.table({"bkt": pa.array(c >> _DECILE_BUCKET_SHIFT,
                                           pa.int64()),
                           "c": pa.array(c, pa.int64())})
                 .group_by("bkt").aggregate([("c", "sum"), ("c", "count")]))
            return g.rename_columns(["bkt", "ps", "pn"])

        hist = (per_ds.map_batches(bkt_partial, batch_format="pyarrow")
                .groupby("bkt")
                .aggregate(Sum("ps", alias_name="s"),
                           Sum("pn", alias_name="n"))
                .to_pandas().sort_values("bkt", ascending=False)
                .reset_index(drop=True))  # <= value-domain >> 16 rows
        cum = hist["n"].cumsum().to_numpy()
        bi = int(np.searchsorted(cum, k))  # boundary bucket index
        above_n = int(cum[bi - 1]) if bi else 0
        above_s = int(hist["s"].iloc[:bi].sum())
        boundary = int(hist["bkt"].iloc[bi])

        def in_bucket(t: pa.Table) -> pa.Table:
            c = t.column("cents").to_numpy()
            c = c[(c >> _DECILE_BUCKET_SHIFT) == boundary]
            g = (pa.table({"c": pa.array(c, pa.int64())})
                 .group_by("c").aggregate([("c", "count")]))
            return g.rename_columns(["c", "pn"])

        vals = (per_ds.map_batches(in_bucket, batch_format="pyarrow")
                .groupby("c").aggregate(Sum("pn", alias_name="n"))
                .to_pandas().sort_values("c", ascending=False)
                .reset_index(drop=True))  # <= 2^16 distinct values
        vcum = vals["n"].cumsum().to_numpy() + above_n
        vi = int(np.searchsorted(vcum, k))
        thr = int(vals["c"].iloc[vi])
        gt_n = above_n + (int(vcum[vi - 1]) - above_n if vi else 0)
        gt_s = above_s + int((vals["c"].iloc[:vi]
                              * vals["n"].iloc[:vi]).sum())
        top_cents = gt_s + (k - gt_n) * thr
    return pa.table({
        "n_top": pa.array([k], pa.int64()),
        "n_customers": pa.array([n], pa.int64()),
        "top_cents": pa.array([top_cents], pa.int64()),
        "revenue_share": pa.array([top_cents / total], pa.float64())})


# ---------------------------------------------------------------------------
# inter-event gap percentiles: per-user lag gaps computed inside user-hash
# buckets (vectorized diff over the sorted bucket — the sessionization
# exchange), truncated to whole seconds so the distinct-gap histogram stays
# bounded; nearest-rank fold on the driver.
# ---------------------------------------------------------------------------

def q_user_gap_percentiles(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")

    def gaps_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["ts"].astype("int64").to_numpy()
        if len(u) < 2:
            return pd.DataFrame({"gap_s": pd.Series([], dtype="int64"),
                                 "pn": pd.Series([], dtype="int64")})
        same = u[1:] == u[:-1]
        gap_s = (t[1:] - t[:-1])[same] // 1_000_000
        vc = pd.Series(gap_s).value_counts()
        return pd.DataFrame({"gap_s": vc.index.to_numpy(dtype="int64"),
                             "pn": vc.to_numpy().astype("int64")})

    hist = (ds.groupby("ubucket").map_groups(gaps_of, batch_format="pandas")
            .groupby("gap_s").aggregate(Sum("pn", alias_name="n"))
            .to_pandas().sort_values("gap_s").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1])
    vals = hist["gap_s"].to_numpy()

    def pick(q: float) -> int:
        rank = min(total, max(1, math.ceil(q * total)))
        return int(vals[int(np.searchsorted(cum, rank))])

    return pa.table({
        "p50_gap_s": pa.array([pick(0.5)], pa.int64()),
        "p90_gap_s": pa.array([pick(0.9)], pa.int64()),
        "p99_gap_s": pa.array([pick(0.99)], pa.int64()),
        "n_gaps": pa.array([total], pa.int64())})


# ---------------------------------------------------------------------------
# shuffle-skew audit: distribution of an md5-based partition key over the
# corpus — the operational check that a planned hash shuffle has no hot
# bucket.  256 hex-prefix buckets, per-batch partial counts, stats folded
# from the bounded bucket table with oracle-mirrored division order.
# ---------------------------------------------------------------------------

def q_text_partition_skew(sf_dir: str):
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch["text"].map(
            lambda t: hashlib.md5((t or "").encode()).hexdigest()[:2])
        vc = b.value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(dtype=object),
                             "pn": vc.to_numpy().astype("int64")})

    per = (_docs(sf_dir, ["text"])
           .map_batches(partial, batch_format="pandas")
           .groupby("bucket").aggregate(Sum("pn", alias_name="n"))
           .to_pandas())  # <= 256 rows
    per["n"] = per["n"].astype("int64")
    n_buckets = len(per)
    total = int(per["n"].sum())
    mx, mn = int(per["n"].max()), int(per["n"].min())
    avg = total / n_buckets
    return pa.table({
        "n_buckets": pa.array([n_buckets], pa.int64()),
        "min_n": pa.array([mn], pa.int64()),
        "max_n": pa.array([mx], pa.int64()),
        "avg_n": pa.array([avg], pa.float64()),
        "skew_ratio": pa.array([mx / avg], pa.float64())})


# ---------------------------------------------------------------------------
# Simpson diversity index per document: sum c_w*(c_w-1) / (n*(n-1)) over
# word counts — both numerator and denominator are exact integers, one
# division, so the float is oracle-stable.  Shuffle-free (per-doc kernel).
# ---------------------------------------------------------------------------

def q_doc_simpson_diversity(sf_dir: str):
    def batch_fn(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split()
        n = words.str.len().fillna(0).astype("int64")

        def rep_sum(ws):
            if not isinstance(ws, list) or not ws:
                return 0
            vc = pd.Series(ws).value_counts().to_numpy()
            return int((vc * (vc - 1)).sum())

        rep = words.apply(rep_sum).astype("int64")
        nn = n.to_numpy()
        simpson = np.where(nn > 1,
                           rep.to_numpy().astype(np.float64)
                           / np.maximum(nn * (nn - 1), 1).astype(np.float64),
                           0.0)
        return pd.DataFrame({"doc_id": b["doc_id"], "n_words": n,
                             "rep_pairs": rep, "simpson": simpson})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(batch_fn, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# event-type transition matrix (Markov counts): consecutive event pairs per
# user inside the user-hash-bucket exchange, vectorized shift compare; the
# (from, to) rollup is bounded by |event types|^2.
# ---------------------------------------------------------------------------

def q_event_type_transitions(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")

    def trans_of(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(u) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "pn": pd.Series([], dtype="int64")})
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"from_type": et[:-1][same],
                              "to_type": et[1:][same]})
        vc = pairs.groupby(["from_type", "to_type"]).size().rename("pn")
        return vc.reset_index().astype({"pn": "int64"})

    out = (ds.groupby("ubucket").map_groups(trans_of, batch_format="pandas")
           .groupby(["from_type", "to_type"])
           .aggregate(Sum("pn", alias_name="n"))
           .to_pandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# TPC-H Q6 analogue (forecast revenue change): pure scan-side predicate fold
# — date/discount/quantity filters pushed into the parquet read, one integer
# partial row per batch, no shuffle at all.
# ---------------------------------------------------------------------------

def q_forecast_revenue(sf_dir: str):
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)
                & (pds.field("l_discount") >= 0.05)
                & (pds.field("l_discount") <= 0.07)
                & (pds.field("l_quantity") < 24.0)))

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(
            pc.multiply(pc.multiply(batch.column("l_extendedprice"),
                                    batch.column("l_discount")),
                        pa.scalar(100.0)),
            round_mode="half_towards_infinity"), pa.int64())
        return pa.table({
            "p_cents": pa.array([int(cents.to_numpy().sum())], pa.int64()),
            "p_n": pa.array([batch.num_rows], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("p_cents", alias_name="c"),
                      Sum("p_n", alias_name="n")))
    return pa.table({
        "revenue_cents": pa.array([int(agg["c"] or 0)], pa.int64()),
        "n_lineitems": pa.array([int(agg["n"] or 0)], pa.int64())})


# ---------------------------------------------------------------------------
# TPC-H Q4 analogue (priority counts over a semi join): orders in a window
# having at least one RETURNED lineitem.  The lineitem side collapses to
# DISTINCT orderkeys inside map_batches (returnflag filter pushed into the
# scan), meets the date-filtered orders projection in one hash join, and the
# priority rollup is bounded by |priorities|.
# ---------------------------------------------------------------------------

def q_priority_returned_orders(sf_dir: str):
    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"],
                         filter=(pds.field("l_returnflag") == "R"))
    keys = (li.map_batches(
        lambda t: t.group_by("l_orderkey").aggregate([]).rename_columns(
            ["o_orderkey"]),
        batch_format="pyarrow")       # per-block distinct partial ...
        .groupby("o_orderkey").aggregate(Count(alias_name="nc"))
        .map_batches(lambda t: t.select(["o_orderkey"]),
                     batch_format="pyarrow"))  # ... then exact global distinct
    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1996-01-01")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=((pds.field("o_orderdate") >= lo)
                & (pds.field("o_orderdate") < hi)))
    nparts = _join_parts(sf_dir, "lineitem")
    key_schema = pa.schema([("o_orderkey", pa.int64())])
    ord_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_orderpriority", pa.string())])
    joined = fit_for_join(orders, ord_schema).join(
        fit_for_join(keys, key_schema), join_type="inner",
        num_partitions=nparts, on=("o_orderkey",), right_on=("o_orderkey",))

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderkey", "count")])
        return g.rename_columns(["o_orderpriority", "pn"])

    out = (joined.map_batches(fold, batch_format="pyarrow")
           .groupby("o_orderpriority").aggregate(Sum("pn", alias_name="n"))
           .to_pandas().sort_values("o_orderpriority").reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# grouped linear-regression slope (value trend per event type): five exact
# int64 moment sums per (type, block) partial — x is whole days since epoch,
# y is cents, both bounded so the products stay inside int64 — assembled
# driver-side with the oracle's exact (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
# term order in DOUBLE.
# ---------------------------------------------------------------------------

def q_value_trend_by_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.divide(batch.column("ts").cast(pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))  # whole days
        y = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64())
        xy = pc.multiply(x, y)
        xx = pc.multiply(x, x)
        t = pa.table({"event_type": batch.column("event_type"),
                      "x": x, "y": y, "xy": xy, "xx": xx,
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xy", "sum"), ("xx", "sum")])
        return g.rename_columns(["event_type", "pn", "px", "py", "pxy", "pxx"])

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("event_type")
         .aggregate(Sum("pn", alias_name="n"), Sum("px", alias_name="sx"),
                    Sum("py", alias_name="sy"), Sum("pxy", alias_name="sxy"),
                    Sum("pxx", alias_name="sxx"))
         .to_pandas().sort_values("event_type").reset_index(drop=True))
    n = m["n"].to_numpy().astype(np.float64)
    sx = m["sx"].to_numpy().astype(np.float64)
    sy = m["sy"].to_numpy().astype(np.float64)
    sxy = m["sxy"].to_numpy().astype(np.float64)
    sxx = m["sxx"].to_numpy().astype(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "n": pa.array(m["n"].astype("int64"), pa.int64()),
        "slope_cents_per_day": pa.array(slope, pa.float64())})


# ---------------------------------------------------------------------------
# cume_dist window per user: rank-le count / n — both exact integers inside
# the user-hash bucket, one division per row.
# ---------------------------------------------------------------------------

def _cume_dist_bucket(g: pd.DataFrame) -> pd.DataFrame:
    r = g.groupby("user_id")["value"].rank(method="max", ascending=True)
    n = g.groupby("user_id")["value"].transform("count")
    return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                         "user_id": g["user_id"].to_numpy(),
                         "cd": r.to_numpy() / n.to_numpy()})


def q_user_value_cume_dist(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
    ds = ds.map_batches(lambda t: _bucket_users(t, nb), batch_format="pyarrow")
    out = ds.groupby("ubucket").map_groups(_cume_dist_bucket,
                                           batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Flesch-style readability: words / sentence-groups / vowel-group syllable
# proxy are all integer regex counts (vectorized pandas str.count == RE2
# regexp_extract_all lengths), and the score expression is replayed with the
# oracle's exact term order in DOUBLE — a shuffle-free per-doc kernel.
# ---------------------------------------------------------------------------

def q_doc_readability(sf_dir: str):
    def batch_fn(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"]
        words = s.str.count(r"[A-Za-z]+").astype("int64")
        sents = s.str.count(r"[.!?]+").astype("int64")
        syll = s.str.count(r"[aeiouAEIOU]+").astype("int64")
        w = words.to_numpy().astype(np.float64)
        st = np.maximum(sents.to_numpy(), 1).astype(np.float64)
        sy = syll.to_numpy().astype(np.float64)
        score = np.where(words.to_numpy() > 0,
                         206.835 - 1.015 * (w / st) - 84.6 * (sy / w),
                         0.0)
        return pd.DataFrame({"doc_id": b["doc_id"], "n_words_alpha": words,
                             "n_sentences": sents, "n_syllable_groups": syll,
                             "flesch": score})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(batch_fn, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# burst detection (anomalous days): daily counts fold distributed; the
# population z-score uses exact integer S/S2/N assembled with the oracle's
# mean = S/N, var = S2/N - mean^2 term order, and the >2-sigma filter runs
# on the bounded daily table.
# ---------------------------------------------------------------------------

def q_events_burst_days(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        g = pa.table({"day": day}).group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "pn"])

    daily = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("pn", alias_name="n"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    daily["day"] = daily["day"].astype("datetime64[us]")
    daily["n"] = daily["n"].astype("int64")
    c = daily["n"].to_numpy()
    N = np.float64(len(c))
    S = np.float64(int(c.sum()))
    S2 = np.float64(int((c * c).sum()))
    mean = S / N
    var = S2 / N - mean * mean
    std = np.sqrt(var)
    z = (c.astype(np.float64) - mean) / std
    daily["z"] = z
    out = daily[daily["z"] > 2.0][["day", "n", "z"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# bigram-LM document scoring (rows-only: the model is Python; bit-exact
# equivalence with a single-process reference + block-layout determinism
# are pinned in tests/test_lm.py — fixed-point micronat accumulation makes
# the distributed float order irrelevant).
# ---------------------------------------------------------------------------

def q_bigram_logprob(sf_dir: str):
    from ..functions.lm import score_docs_bigram_lm

    return score_docs_bigram_lm(_docs(sf_dir, ["doc_id", "text"]))


# ---------------------------------------------------------------------------
# distributed BPE tokenizer training (rows-only: iterative, not
# SQL-expressible; equivalence with the single-process reference is pinned
# in tests/test_bpe.py).  State is the distinct-word table; each merge is
# one vocabulary-sized partial-agg exchange.
# ---------------------------------------------------------------------------

def q_bpe_merges(sf_dir: str):
    from ..functions.bpe import train_bpe_distributed

    merges = train_bpe_distributed(_docs(sf_dir, ["text"]), n_merges=10)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string())})


# ---------------------------------------------------------------------------
# PageRank over the source-citation graph (rows-only: iterative).  Edges
# come from a layout-independent adjacent-row self-join (doc_id -> doc_id+1
# via one hash join — the testdata documents carry no cross-domain links,
# so consecutive doc sources stand in for citations); the rank machinery
# (broadcast rank vector, per-block contribution partials, node-sized
# exchange per iteration) is verified against a dense numpy reference in
# tests/test_graph.py.
# ---------------------------------------------------------------------------

def _source_edges(sf_dir: str):
    """Edge Dataset (src, dst int64 node ids) + the bounded source-name
    list for the citation-graph queries."""
    from ..rayops import fit_for_join

    docs = _docs(sf_dir, ["doc_id", "source"])
    # distinct node set via per-block unique partials + one small groupby:
    # the exchange carries at most (blocks x distinct-per-block) rows and
    # only the DISTINCT set (bounded — domains, not documents) reaches the
    # driver, never the full 10^12-row source column.
    distinct = (_docs(sf_dir, ["source"])
                .map_batches(
                    lambda t: pa.table({"source":
                                        pc.unique(t.column("source"))}),
                    batch_format="pyarrow")
                .groupby("source").count())
    src_names = sorted(r["source"] for r in distinct.take_all())
    # node id = position in the sorted name list; the lookup is the
    # vectorized pc.index_in against a broadcast value set (no per-row
    # Python dict probe)
    names_ref = ray.put(pa.array(src_names))

    def lhs_fn(t: pa.Table) -> pa.Table:
        vs = ray.get(names_ref)
        return pa.table({
            "k": pc.add(t.column("doc_id"), 1).cast(pa.int64()),
            "src": pc.index_in(t.column("source"),
                               value_set=vs).cast(pa.int64())})

    def rhs_fn(t: pa.Table) -> pa.Table:
        vs = ray.get(names_ref)
        return pa.table({
            "k": t.column("doc_id").cast(pa.int64()),
            "dst": pc.index_in(t.column("source"),
                               value_set=vs).cast(pa.int64())})

    l_schema = pa.schema([("k", pa.int64()), ("src", pa.int64())])
    r_schema = pa.schema([("k", pa.int64()), ("dst", pa.int64())])
    edges = fit_for_join(
        docs.map_batches(lhs_fn, batch_format="pyarrow"), l_schema).join(
        fit_for_join(docs.map_batches(rhs_fn, batch_format="pyarrow"),
                     r_schema),
        join_type="inner", num_partitions=_join_parts(sf_dir, "documents"),
        on=("k",), right_on=("k",))
    edges = edges.map_batches(lambda t: t.select(["src", "dst"]),
                              batch_format="pyarrow").materialize()
    return edges, src_names


def q_source_pagerank(sf_dir: str):
    from ..functions.graph import pagerank_distributed

    edges, src_names = _source_edges(sf_dir)
    rank = pagerank_distributed(edges, len(src_names), n_iter=10)
    return pa.table({
        "source": pa.array(src_names, pa.string()),
        "rank": pa.array(rank, pa.float64())})


def q_source_pagerank_join(sf_dir: str):
    """The 10^10-node scale path: identical output to ``source_pagerank``
    but rank/degree state lives in a node-keyed Dataset and every power
    iteration is a hash join against the edge table — no driver array
    sized by |nodes| (functions/graph.py pagerank_join; tests pin the two
    paths equal to 1e-12)."""
    from ..functions.graph import pagerank_join

    edges, src_names = _source_edges(sf_dir)
    out = (pagerank_join(edges, len(src_names), n_iter=10)
           .to_pandas().sort_values("node"))  # bounded by |sources|
    return pa.table({
        "source": pa.array(src_names, pa.string()),
        "rank": pa.array(out["rank"].to_numpy(), pa.float64())})


# ---------------------------------------------------------------------------
# argmax ROW per group (each customer's highest-value order, whole row):
# per-batch lexsort keep-last partials — one candidate row per customer per
# block — final argmax over the bounded candidate table.
# ---------------------------------------------------------------------------

def q_customer_best_order(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        t = batch.append_column("cents", cents)
        u = t.column("o_custkey").to_numpy()
        c = t.column("cents").to_numpy()
        k = t.column("o_orderkey").to_numpy()
        order = np.lexsort((-k, c, u))  # custkey asc, cents asc, orderkey desc
        last = np.concatenate((u[order][1:] != u[order][:-1], [True]))
        return t.take(pa.array(order[last]))

    cand = (ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas())  # <= |customers| x |blocks|
    cand = cand.sort_values(["o_custkey", "cents", "o_orderkey"],
                            ascending=[True, True, False])
    out = cand.groupby("o_custkey", as_index=False).tail(1)
    out = out.sort_values("o_custkey").reset_index(drop=True)
    out["best_cents"] = out["cents"].astype("int64")
    return out[["o_custkey", "o_orderkey", "best_cents"]]


# ---------------------------------------------------------------------------
# year-over-year growth by calendar month: distributed (year, month)
# integer fold; the partitioned lag runs over the bounded month table.
# ---------------------------------------------------------------------------

def q_orders_yoy_growth(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        m = pc.cast(pc.month(batch.column("o_orderdate")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        g = (pa.table({"y": y, "m": m, "cents": cents})
             .group_by(["y", "m"]).aggregate([("cents", "sum")]))
        return g.rename_columns(["y", "m", "p_cents"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["y", "m"]).aggregate(Sum("p_cents", alias_name="cents"))
           .to_pandas().sort_values(["m", "y"]).reset_index(drop=True))
    out["cents"] = out["cents"].astype("int64")
    prev = out.groupby("m")["cents"].shift(1)
    out["prev_year_cents"] = prev.fillna(0).astype("int64")
    out["has_prev"] = prev.notna()
    out["yoy_delta_cents"] = np.where(
        out["has_prev"], out["cents"] - out["prev_year_cents"], 0).astype("int64")
    out = out[out["has_prev"]]
    out = out.sort_values(["y", "m"]).reset_index(drop=True)
    return out[["y", "m", "cents", "prev_year_cents", "yoy_delta_cents"]]


# ---------------------------------------------------------------------------
# pairwise source-vocabulary overlap (corpus diagnostics: which sources
# share wording?): (source, word) distinct pairs fold distributed; each
# word's bounded source-set explodes into per-word pair partials; the final
# (source a, source b) rollup is |sources|^2-bounded and every jaccard is
# one division of exact integers.
# ---------------------------------------------------------------------------

def q_source_vocab_overlap(sf_dir: str):
    def sw_partial(b: pd.DataFrame) -> pd.DataFrame:
        words = b.set_index("source")["text"].str.split().explode().dropna()
        out = (words.to_frame("w").reset_index()
               .drop_duplicates())  # per-block distinct (source, w)
        return out[["source", "w"]]

    nbs = _session_buckets()

    def add_src_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["sbk"] = (pd.util.hash_array(b["source"].to_numpy(object))
                    % nbs).astype(np.int32)
        return b

    def sw_fold(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (source, w) via in-bucket drop_duplicates — the
        # Dataset-level two-key aggregate took 11.4 s on the 38k partial
        # rows here (quadratic accumulate); bucketing by source hash
        # co-locates every duplicate
        return g.drop_duplicates(["source", "w"])[["source", "w"]]

    sw = (_docs(sf_dir, ["source", "text"])
          .map_batches(sw_partial, batch_format="pandas")
          .map_batches(add_src_bucket, batch_format="pandas")
          .groupby("sbk").map_groups(sw_fold, batch_format="pandas"))

    def size_partial(t: pa.Table) -> pa.Table:
        g = t.select(["source"]).group_by("source").aggregate(
            [("source", "count")])
        return g.rename_columns(["source", "pn"])

    sizes = (sw.map_batches(size_partial, batch_format="pyarrow")
             .groupby("source").aggregate(Sum("pn", alias_name="n"))
             .to_pandas())  # <= |sources|
    n_of = dict(zip(sizes["source"], sizes["n"].astype("int64")))

    # coarse-bucket the word key (per-GROUP UDF dispatch over every
    # distinct word would be dispatch-bound — same defense as the LSH
    # group-bys), then segment within the bucket
    import zlib as _zlib
    nb = _session_buckets()  # O(cpus) coarse buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.fromiter((_zlib.crc32(w.encode()) % nb
                         for w in t.column("w").to_pylist()),
                        dtype=np.int64, count=t.num_rows)
        return t.append_column("wbucket", pa.array(b, pa.int64()))

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _w, grp in g.groupby("w", sort=False):
            srcs = sorted(set(grp["source"]))
            m = len(srcs)
            for i in range(m):
                for j in range(i + 1, m):
                    out_a.append(srcs[i])
                    out_b.append(srcs[j])
        if not out_a:
            return pd.DataFrame({"sa": pd.Series([], dtype=object),
                                 "sb": pd.Series([], dtype=object),
                                 "pi": pd.Series([], dtype="int64")})
        vc = pd.DataFrame({"sa": out_a, "sb": out_b}).value_counts()
        idx = vc.index.to_frame(index=False)
        return pd.DataFrame({"sa": idx["sa"], "sb": idx["sb"],
                             "pi": vc.to_numpy().astype("int64")})

    def add_pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["pbk"] = (pd.util.hash_array(b["sa"].to_numpy(object))
                    % nbs).astype(np.int32)
        return b

    def inter_fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby(["sa", "sb"], as_index=False)["pi"].sum()
        o["pi"] = o["pi"].astype("int64")
        return o.rename(columns={"pi": "i"})

    inter = (sw.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("wbucket").map_groups(pair_bucket,
                                            batch_format="pandas")
             .map_batches(add_pair_bucket, batch_format="pandas")
             .groupby("pbk").map_groups(inter_fold, batch_format="pandas")
             .to_pandas().sort_values(["sa", "sb"]).reset_index(drop=True))
    inter["i"] = inter["i"].astype("int64")
    na = inter["sa"].map(n_of).astype("int64")
    nb = inter["sb"].map(n_of).astype("int64")
    inter["n_a"], inter["n_b"] = na, nb
    union = (na + nb - inter["i"]).astype("int64")
    inter["jaccard"] = (inter["i"].to_numpy().astype(np.float64)
                        / union.to_numpy().astype(np.float64))
    return inter[["sa", "sb", "i", "n_a", "n_b", "jaccard"]]


# ---------------------------------------------------------------------------
# robust burst detection (MAD z-score): daily counts fold distributed; the
# median/MAD fold runs on the bounded daily table with quantile_cont
# interpolation mirrored, and the robust z uses the oracle's exact
# (n - med) / (1.4826 * mad) term order.
# ---------------------------------------------------------------------------

def q_events_burst_days_robust(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        g = pa.table({"day": day}).group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "pn"])

    daily = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("pn", alias_name="n"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    daily["day"] = daily["day"].astype("datetime64[us]")
    daily["n"] = daily["n"].astype("int64")
    c = daily["n"].to_numpy().astype(np.float64)

    def q_cont(v: np.ndarray, q: float) -> float:
        v = np.sort(v)
        h = (len(v) - 1) * q
        lo = math.floor(h)
        frac = h - lo
        x_lo = float(v[lo])
        if frac == 0.0:
            return x_lo
        return x_lo + (float(v[min(lo + 1, len(v) - 1)]) - x_lo) * frac

    med = q_cont(c, 0.5)
    mad = q_cont(np.abs(c - med), 0.5)
    z = (c - med) / (1.4826 * mad)
    daily["robust_z"] = z
    out = daily[daily["robust_z"] > 2.0][["day", "n", "robust_z"]]
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# diverse retrieval (rows-only): stage 1 distributed exact knn candidates
# (50), stage 2 driver-side MMR re-rank over the bounded candidate set —
# the two-stage retrieve-then-rerank shape every RAG pipeline runs.
# ---------------------------------------------------------------------------

def q_embedding_knn_diverse(sf_dir: str):
    import pyarrow.parquet as pq

    from ..functions.similarity import knn_topk, mmr_rerank

    q0 = np.asarray(pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"],
        filters=[("vec_id", "==", 0)]).column("embedding").to_pylist()[0])
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cand = knn_topk(ds, q0[None, :], k=50)  # bounded candidates
    ids = cand["vec_id"].to_numpy()
    # re-fetch ONLY the candidate vectors (row-group pushdown — the corpus
    # never reaches the driver)
    cand_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(i) for i in ids])])
    by_id = dict(zip(cand_tbl.column("vec_id").to_pylist(),
                     cand_tbl.column("embedding").to_pylist()))
    vecs = np.asarray([by_id[int(i)] for i in ids], dtype=np.float64)
    scores = cand["cos_sim"].to_numpy()
    order = mmr_rerank(vecs, scores, k=10, lam=0.7)
    return pa.table({"rank": pa.array(range(len(order)), pa.int64()),
                     "vec_id": pa.array(ids[order].astype("int64"),
                                        pa.int64())})


# ---------------------------------------------------------------------------
# grouped sample standard deviation from exact integer moments (same
# term-for-term mirror discipline as the correlation query — DuckDB's
# incremental stddev_samp would NOT match bit-for-bit, so the oracle spells
# out sqrt((n*S2 - S*S) / (n*(n-1))) exactly like the engine).
# ---------------------------------------------------------------------------

def q_events_value_stddev_by_type(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)),
                        pa.int64())
        sq = pc.multiply(cents, cents)
        t = pa.table({"event_type": batch.column("event_type"),
                      "c": cents, "c2": sq,
                      "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("c", "sum"), ("c2", "sum")])
        return g.rename_columns(["event_type", "pn", "ps", "ps2"])

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("event_type")
         .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"),
                    Sum("ps2", alias_name="s2"))
         .to_pandas().sort_values("event_type").reset_index(drop=True))
    n = m["n"].to_numpy().astype(np.float64)
    s = m["s"].to_numpy().astype(np.float64)
    s2 = m["s2"].to_numpy().astype(np.float64)
    std = np.sqrt((n * s2 - s * s) / (n * (n - 1.0)))
    return pa.table({
        "event_type": pa.array(m["event_type"], pa.string()),
        "n": pa.array(m["n"].astype("int64"), pa.int64()),
        "stddev_cents": pa.array(std, pa.float64())})


# ---------------------------------------------------------------------------
# quarterly revenue rollup: bounded (year, quarter) partial-agg fold.
# ---------------------------------------------------------------------------

def q_orders_quarterly(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        qr = pc.cast(pc.quarter(batch.column("o_orderdate")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"),
                                             100.0)), pa.int64())
        g = (pa.table({"y": y, "quarter": qr, "cents": cents})
             .group_by(["y", "quarter"])
             .aggregate([("cents", "sum"), ("cents", "count")]))
        return g.rename_columns(["y", "quarter", "p_cents", "p_n"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["y", "quarter"])
           .aggregate(Sum("p_cents", alias_name="revenue_cents"),
                      Sum("p_n", alias_name="n_orders"))
           .to_pandas().sort_values(["y", "quarter"]).reset_index(drop=True))
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# part-size histogram: bounded-domain count fold (sizes 1..50).
# ---------------------------------------------------------------------------

def q_part_size_histogram(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_size"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("p_size").aggregate([("p_size", "count")])
        return g.rename_columns(["p_size", "pn"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("p_size").aggregate(Sum("pn", alias_name="n"))
           .to_pandas().sort_values("p_size").reset_index(drop=True))
    out["p_size"] = out["p_size"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (rich idle customers): global-average threshold + exact
# distributed ANTI-join.  The above-average test is an exact integer
# cross-multiplication (cents * n > sum_cents) so no float average crosses
# the boundary differently on the two engines; the NOT EXISTS is the
# customers_lapsed left_outer + null-probe idiom over the distinct-key fold
# of the filtered orders side.  Per-nation rollup is bounded by |nation|.
# ---------------------------------------------------------------------------

def q_rich_idle_customers(sf_dir: str):
    from ..rayops import fit_for_join

    # exact positive-balance average as (sum_cents, n)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100.0)),
                        pa.int64())
        pos = pc.greater(t.column("c_acctbal"), 0.0)
        kept = pa.table({"cents": cents}).filter(pos)
        return pa.table({"s": pa.array([pc.sum(kept.column("cents")).as_py()
                                        or 0], pa.int64()),
                         "n": pa.array([kept.num_rows], pa.int64())})

    stats = (cust.map_batches(bal_partial, batch_format="pyarrow")
             .sum(["s", "n"]))
    s_cents, n_pos = int(stats["sum(s)"]), int(stats["sum(n)"])

    def rich_filter(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100.0)),
                        pa.int64())
        keep = pc.greater(pc.multiply(cents, n_pos), s_cents)
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "c_nationkey": t.column("c_nationkey"),
                         "cents": cents}).filter(keep)

    rich = cust.map_batches(rich_filter, batch_format="pyarrow")

    # distinct custkeys among URGENT orders (the anti-join's right side)
    nparts = _join_parts(sf_dir, "orders")
    keys_schema = pa.schema([("o_custkey", pa.int64()), ("pn", pa.int64())])
    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pds.field("o_orderpriority") == "1-URGENT")
    keys = fit_for_join(
        urgent.map_batches(
            lambda t: t.group_by("o_custkey").aggregate(
                [("o_custkey", "count")]).rename_columns(["o_custkey", "pn"]),
            batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("pn", alias_name="pn")),
        keys_schema)
    joined = rich.join(keys, join_type="left_outer", num_partitions=nparts,
                       on=("c_custkey",), right_on=("o_custkey",))

    def idle_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("pn")))
        g = t.group_by("c_nationkey").aggregate(
            [("c_custkey", "count"), ("cents", "sum")])
        return g.rename_columns(["c_nationkey", "pc", "ps"])

    per_nation = (joined.map_batches(idle_partial, batch_format="pyarrow")
                  .groupby("c_nationkey")
                  .aggregate(Sum("pc", alias_name="n_cust"),
                             Sum("ps", alias_name="bal_cents"))
                  .to_pandas())   # <= |nation| rows
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    out = per_nation.merge(nation, left_on="c_nationkey",
                           right_on="n_nationkey")
    out = out.rename(columns={"n_name": "nation"})
    out["n_cust"] = out["n_cust"].astype("int64")
    out["bal_cents"] = out["bal_cents"].astype("int64")
    return (out[["nation", "n_cust", "bal_cents"]]
            .sort_values("nation").reset_index(drop=True))


# ---------------------------------------------------------------------------
# TPC-H Q13 shape (customer order-count distribution): the zero-order
# bucket forces a left_outer join — a semi-join or inner join silently
# drops exactly the customers the distribution exists to expose.  Orders
# fold to one (custkey, n) row per key BEFORE the join (partial combine),
# and the final distribution is a second partial-combined rollup keyed by
# n_orders (cardinality <= max orders per customer, tiny).
# ---------------------------------------------------------------------------

def q_customer_distribution(sf_dir: str):
    from ..rayops import fit_for_join

    nparts = _join_parts(sf_dir, "orders")
    counts_schema = pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    counts = fit_for_join(
        orders.map_batches(
            lambda t: t.group_by("o_custkey").aggregate(
                [("o_custkey", "count")]).rename_columns(["o_custkey", "pn"]),
            batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("pn", alias_name="n")),
        counts_schema)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = cust.join(counts, join_type="left_outer", num_partitions=nparts,
                       on=("c_custkey",), right_on=("o_custkey",))

    def dist_partial(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(t.column("n"), pa.int64()), 0)
        g = pa.table({"n_orders": n}).group_by("n_orders").aggregate(
            [("n_orders", "count")])
        return g.rename_columns(["n_orders", "pc"])

    out = (joined.map_batches(dist_partial, batch_format="pyarrow")
           .groupby("n_orders").aggregate(Sum("pc", alias_name="n_cust"))
           .to_pandas())
    out["n_orders"] = out["n_orders"].astype("int64")
    out["n_cust"] = out["n_cust"].astype("int64")
    return (out[["n_orders", "n_cust"]]
            .sort_values("n_orders").reset_index(drop=True))


# ---------------------------------------------------------------------------
# TPC-H Q17 shape (small-quantity revenue for one brand): the brand filter
# bounds the part side to ~1/|brands| of the part table, so its partkeys
# broadcast (ray.put once, probed per batch) and lineitem is NEVER
# shuffled — two pruned scans: (1) per-part quantity partials folded to a
# driver dict (bounded by the brand's part count), (2) the below-average
# filter + revenue partial.  The 0.2*avg threshold is evaluated as the
# exact integer cross-multiplication qty * 5 * n < sum_qty, so no float
# average can round differently between the two engines.
# ---------------------------------------------------------------------------

def q_small_qty_part_revenue(sf_dir: str, *, route: str | None = None):
    """TPC-H Q17 analogue.  Size-routed: below _BCAST_DIM_MAX_ROWS the
    brand partkey set (then the per-part quantity stats) are broadcast
    into two lineitem scans; past it both phases become hash-partitioned
    joins — per-partkey stats partials meet the brand-filtered part read,
    then per-(partkey, qty) revenue partials meet the stats Dataset —
    so nothing part-sized is driver-materialized."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")

    def li(cols):
        return rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    if route == "hashjoin":
        from ..rayops import fit_for_join

        nparts = _join_parts(sf_dir, "lineitem")
        brand = fit_for_join(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"],
                            filter=(pc.field("p_brand") == "Brand#13")),
            pa.schema([("p_partkey", pa.int64())]))
        if brand.count() == 0:  # join rejects a fully-empty side
            return pd.DataFrame({"revenue_cents": [0], "n_items": [0]})

        def qty_partial(t: pa.Table) -> pa.Table:
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "q": pc.cast(t.column("l_quantity"), pa.int64())})
                 .group_by("l_partkey")
                 .aggregate([("q", "sum"), ("q", "count")]))
            return g.rename_columns(["l_partkey", "sq", "nq"])

        stats_ds = (fit_for_join(
            li(["l_partkey", "l_quantity"])
            .map_batches(qty_partial, batch_format="pyarrow"),
            pa.schema([("l_partkey", pa.int64()), ("sq", pa.int64()),
                       ("nq", pa.int64())]))
            .join(brand, join_type="inner", num_partitions=nparts,
                  on=("l_partkey",), right_on=("p_partkey",))
            .groupby("l_partkey")
            .aggregate(Sum("sq", alias_name="sq"),
                       Sum("nq", alias_name="nq")))

        def rev_partial(t: pa.Table) -> pa.Table:
            # per-(partkey, qty) partials: the filter q*5*nq < sq depends
            # only on this pair, so per-row ec sums fold before the join
            ec = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64())
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "q": pc.cast(t.column("l_quantity"), pa.int64()),
                           "ec": ec})
                 .group_by(["l_partkey", "q"])
                 .aggregate([("ec", "sum"), ("ec", "count")]))
            return g.rename_columns(["l_partkey", "q", "p_ec", "p_n"])

        rev = fit_for_join(
            li(["l_partkey", "l_quantity", "l_extendedprice"])
            .map_batches(rev_partial, batch_format="pyarrow"),
            pa.schema([("l_partkey", pa.int64()), ("q", pa.int64()),
                       ("p_ec", pa.int64()), ("p_n", pa.int64())]))
        joined = rev.join(
            fit_for_join(stats_ds.map_batches(
                lambda t: t.rename_columns(["pk", "sq", "nq"]),
                batch_format="pyarrow"),
                pa.schema([("pk", pa.int64()), ("sq", pa.int64()),
                           ("nq", pa.int64())])),
            join_type="inner", num_partitions=nparts,
            on=("l_partkey",), right_on=("pk",))

        def keep_fold(t: pa.Table) -> pa.Table:
            keep = (t.column("q").to_numpy() * 5 * t.column("nq").to_numpy()
                    < t.column("sq").to_numpy())
            ec = t.column("p_ec").to_numpy()
            n = t.column("p_n").to_numpy()
            return pa.table({
                "pr": pa.array([int(ec[keep].sum())], pa.int64()),
                "pn": pa.array([int(n[keep].sum())], pa.int64())})

        agg = joined.map_batches(keep_fold,
                                 batch_format="pyarrow").sum(["pr", "pn"])
        return pd.DataFrame({"revenue_cents": [int(agg["sum(pr)"])],
                             "n_items": [int(agg["sum(pn)"])]})

    brand_keys = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
        filters=[("p_brand", "=", "Brand#13")]).column("p_partkey")
    keys_ref = ray.put(np.sort(brand_keys.to_numpy()))

    class _QtyPartial:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t.column("l_partkey").to_numpy()
            pos = np.searchsorted(self.keys, pk)
            pos = np.clip(pos, 0, max(len(self.keys) - 1, 0))
            hit = (self.keys[pos] == pk) if len(self.keys) else \
                np.zeros(len(pk), bool)
            kept = pa.table({
                "l_partkey": t.column("l_partkey"),
                "q": pc.cast(t.column("l_quantity"), pa.int64()),
            }).filter(pa.array(hit))
            g = kept.group_by("l_partkey").aggregate(
                [("q", "sum"), ("q", "count")])
            return g.rename_columns(["l_partkey", "sq", "nq"])

    stats = (li(["l_partkey", "l_quantity"])
             .map_batches(_QtyPartial, batch_format="pyarrow",
                          concurrency=(1, 8))
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("nq", alias_name="nq"))
             .to_pandas()
             .sort_values("l_partkey"))  # <= |brand parts| rows
    stats_ref = ray.put((stats["l_partkey"].to_numpy(np.int64),
                         stats["sq"].to_numpy(np.int64),
                         stats["nq"].to_numpy(np.int64)))

    class _RevPartial:
        def __init__(self):
            # sorted parallel arrays: the per-batch probe is one vectorized
            # searchsorted, never a Python loop over rows.
            self.pk, self.sq, self.nq = ray.get(stats_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t.column("l_partkey").to_numpy()
            q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy()
            ec = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()).to_numpy()
            pos = np.searchsorted(self.pk, pk)
            pos_c = np.clip(pos, 0, max(len(self.pk) - 1, 0))
            hit = (self.pk[pos_c] == pk) if len(self.pk) else \
                np.zeros(len(pk), bool)
            keep = np.zeros(len(pk), bool)
            keep[hit] = (q[hit] * 5 * self.nq[pos_c[hit]]
                         < self.sq[pos_c[hit]])
            return pa.table({
                "pr": pa.array([int(ec[keep].sum())], pa.int64()),
                "pn": pa.array([int(keep.sum())], pa.int64())})

    agg = (li(["l_partkey", "l_quantity", "l_extendedprice"])
           .map_batches(_RevPartial, batch_format="pyarrow",
                        concurrency=(1, 8))
           .sum(["pr", "pn"]))
    return pd.DataFrame({"revenue_cents": [int(agg["sum(pr)"])],
                         "n_items": [int(agg["sum(pn)"])]})


# ---------------------------------------------------------------------------
# TPC-H Q4 shape (EXISTS semi-join rollup): orders with at least one
# lineitem shipped > 90 days after the order date, counted per priority.
# The EXISTS collapses to a per-orderkey MAX(l_shipdate) partial fold
# (one row per orderkey leaves each block), then ONE hash join against
# orders and a priority-keyed rollup bounded by |priorities|.  Timestamp
# arithmetic is exact int64 microseconds on both engines.
# ---------------------------------------------------------------------------

def q_slow_orders_by_priority(sf_dir: str):
    from ..rayops import fit_for_join

    nparts = _join_parts(sf_dir, "lineitem")
    ship_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("max_ship", pa.timestamp("us"))])
    ships = fit_for_join(
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_orderkey", "l_shipdate"])
        .map_batches(
            lambda t: t.group_by("l_orderkey").aggregate(
                [("l_shipdate", "max")])
            .rename_columns(["l_orderkey", "pm"]),
            batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Max("pm", alias_name="max_ship")),
        ship_schema)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    joined = orders.join(ships, join_type="inner", num_partitions=nparts,
                         on=("o_orderkey",), right_on=("l_orderkey",))
    lag_us = 90 * 86400 * 1_000_000

    def slow_partial(t: pa.Table) -> pa.Table:
        ship_us = pc.cast(t.column("max_ship"), pa.int64())
        order_us = pc.cast(t.column("o_orderdate"), pa.int64())
        keep = pc.greater(ship_us, pc.add(order_us, lag_us))
        kept = pa.table({"o_orderpriority": t.column("o_orderpriority")}
                        ).filter(keep)
        g = kept.group_by("o_orderpriority").aggregate(
            [("o_orderpriority", "count")])
        return g.rename_columns(["o_orderpriority", "pc"])

    out = (joined.map_batches(slow_partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Sum("pc", alias_name="n_orders"))
           .to_pandas())
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["o_orderpriority", "n_orders"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


# ---------------------------------------------------------------------------
# TPC-H Q16 shape (distinct-supplier counts per part group): lineitem is
# decorated with (p_brand, p_size) — the part table shuffles ONCE through
# a hash join keyed by partkey (at TPC-H shape part is ~30x smaller than
# lineitem) — then the distinct is a two-level fold: per-block distinct
# (map_batches) -> global distinct (groupby first) -> bounded rollup per
# (brand, size).  No row-level data ever reaches the driver.
# ---------------------------------------------------------------------------

def q_brand_supplier_counts(sf_dir: str):
    from ..rayops import fit_for_join

    # the join probe side is ~|distinct (partkey, suppkey)| ~ |lineitem|
    # and flows straight into a 3-key distinct groupby — size the exchange
    # finer than the default heuristic (measured 65 s -> 9 s at sf0.1).
    nparts = _join_parts(sf_dir, "lineitem", rows_per_part=100_000)
    part_schema = pa.schema([("p_partkey", pa.int64()),
                             ("p_brand", pa.string()),
                             ("p_size", pa.int32())])
    part = fit_for_join(
        rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand", "p_size"]),
        part_schema)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    # pre-distinct inside each block BEFORE the join: (partkey, suppkey)
    # repeats collapse early, shrinking the shuffle.
    li = li.map_batches(
        lambda t: t.group_by(["l_partkey", "l_suppkey"]).aggregate([]),
        batch_format="pyarrow")
    joined = li.join(part, join_type="inner", num_partitions=nparts,
                     on=("l_partkey",), right_on=("p_partkey",))
    # global distinct of (brand, size, suppkey), then count per (brand, size)
    distinct = (joined.map_batches(
        lambda t: t.group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([]),
        batch_format="pyarrow")
        .groupby(["p_brand", "p_size", "l_suppkey"])
        .aggregate(Count(alias_name="_c")))

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_size"]).aggregate([("_c", "count")])
        return g.rename_columns(["p_brand", "p_size", "pc"])

    out = (distinct.map_batches(cnt_partial, batch_format="pyarrow")
           .groupby(["p_brand", "p_size"])
           .aggregate(Sum("pc", alias_name="n_suppliers"))
           .to_pandas())
    out["p_size"] = out["p_size"].astype("int32")
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return (out[["p_brand", "p_size", "n_suppliers"]]
            .sort_values(["p_brand", "p_size"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Distributed triangle counting over the co-order part graph (parts are
# nodes; an edge means two parts appear in the same order).  The classic
# two-exchange plan: (1) canonical a<b edges generated VECTORIZED per
# order-hash bucket (ragged all-pairs via repeat/arange index arithmetic —
# no per-order Python), deduped by a (a,b) groupby; (2) wedges a<b<c from
# ONE edge self-join on the middle vertex; (3) triangles = wedges
# semi-joined against the edge set on (a, c) and counted — only the count
# crosses back to the driver.  Skew note for 100 TB: wedge fan-out is
# sum(deg(b)^2); the standard mitigation (pivot wedges at the
# LOWEST-DEGREE vertex of each edge instead of the canonical middle)
# drops it to O(m^1.5) and slots into the same plan by re-canonicalizing
# edges on (degree, id) order before step 2.
# ---------------------------------------------------------------------------

def _co_order_edges(sf_dir: str):
    """Distinct canonical (a < b) part-pair edges of the co-order graph,
    materialized for reuse: vectorized ragged all-pairs per order-hash
    bucket, local pre-dedup, then a COARSE-BUCKET global dedup — one
    map_groups over ~2×cpus hash buckets of the composite pair key with
    a vectorized in-bucket drop_duplicates.  A Dataset-level
    groupby((a, b)).aggregate(Count) here was measured at 222 s for the
    sf0.1 graph (1.2M pairs ≈ 1.2M one-row groups — per-group aggregate
    overhead dominates); the coarse-bucket pass does the identical dedup
    in ~2 s because the group count is O(cpus), not O(edges)."""
    from ..config import cluster_cpus
    from ..rayops import fit_for_join

    nb = max(16, cluster_cpus() * 2)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def pre(t: pa.Table) -> pa.Table:
        d = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        b = pc.cast(pc.subtract(
            d.column("l_orderkey"),
            pc.multiply(pc.divide(d.column("l_orderkey"), nb), nb)),
            pa.int32())
        return d.append_column("obucket", b)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["l_orderkey", "l_partkey"])
             .sort_values(["l_orderkey", "l_partkey"]))
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        n = len(ok)
        if n == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        seg_start = np.r_[0, np.nonzero(np.diff(ok))[0] + 1]
        seg_len = np.diff(np.r_[seg_start, n])
        local = np.arange(n) - np.repeat(seg_start, seg_len)
        reps = np.repeat(seg_len, seg_len) - 1 - local  # pairs per row
        a_idx = np.repeat(np.arange(n), reps)
        excl = np.cumsum(reps) - reps
        b_idx = a_idx + 1 + (np.arange(int(reps.sum()))
                             - np.repeat(excl, reps))
        out = pd.DataFrame({"a": pk[a_idx], "b": pk[b_idx]})
        out = out.drop_duplicates()  # local pre-dedup shrinks the shuffle
        av = out["a"].to_numpy().astype(np.uint64)
        bv = out["b"].to_numpy().astype(np.uint64)
        out["pb"] = (((av * np.uint64(2654435761)) ^ bv)
                     % np.uint64(nb)).astype(np.int32)
        return out

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    edges = (li.map_batches(pre, batch_format="pyarrow")
             .groupby("obucket")
             .map_groups(pairs_bucket, batch_format="pandas")
             .groupby("pb")
             .map_groups(dedup_bucket, batch_format="pandas"))
    e_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    return fit_for_join(edges, e_schema).materialize()


def _tri_parts(sf_dir: str, n_edges: int) -> int:
    """Join partition count for the WEDGE exchange.  ``_join_parts`` sizes
    by input-table rows, but the wedge intermediate explodes to roughly
    sum(deg^2) ~ 2*m^2/n rows — at sf0.1 that is ~64M rows from a 600k-row
    lineitem, and routing them through the 2 aggregators the input-row
    heuristic picks serializes the whole query (measured: >10 min vs ~1 min
    after this fix).  Size by the ESTIMATED INTERMEDIATE instead."""
    import pyarrow.parquet as pq

    from ..config import cluster_cpus

    n_nodes = max(pq.read_metadata(f"{sf_dir}/part.parquet").num_rows, 1)
    w_est = 2 * n_edges * n_edges / n_nodes
    need = -(-int(w_est) // 1_500_000)
    return int(max(2, min(cluster_cpus(), need)))


# edge sets up to this many pairs broadcast as one sorted uint64 array
# (16 B/edge -> 80 MB at the cap); past it — or when node ids exceed
# 32 bits — the closure falls back to the hash join, which never holds
# the edge set in one piece.
TRI_BROADCAST_EDGES = 5_000_000


def _edge_bcast(edges, n_edges: int, orient_deg=None):
    """Broadcast bundle for the triangle family: ``(key_ref, csr_ref)``,
    or None when the edge set exceeds the broadcast budget / id width.

    ``key_ref`` is the SORTED composite (a << 32 | b) edge-key array for
    closure probes.  ``csr_ref`` is a (nodes, indptr, nbrs) adjacency over
    the canonical a→b pairs — or, when ``orient_deg=(nodes, degs)`` is
    given, over the (deg, id)-ORIENTED pairs — so wedges are GENERATED
    locally per edge batch (ragged CSR gather) instead of through the
    wedge-emitting hash join.  That join was the dominant cost once the
    closure probe stopped shuffling (measured 257 s → 181 s for the probe,
    then 218 s → ~7 s at sf0.1 for this change: the ~2m²/n-row wedge
    intermediate now never exists as a dataset at all — each batch emits,
    probes and folds its wedges in one numpy pass)."""
    if n_edges > TRI_BROADCAST_EDGES:
        return None
    df = edges.to_pandas()
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    if len(a) and (int(a.max()) >= 2**32 or int(b.max()) >= 2**32
                   or int(a.min()) < 0 or int(b.min()) < 0):
        return None
    key = np.sort((a.astype(np.uint64) << np.uint64(32))
                  | b.astype(np.uint64))
    if orient_deg is not None:
        dn, dd = orient_deg
        da = dd[np.searchsorted(dn, a)]
        db = dd[np.searchsorted(dn, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        x = np.where(a_first, a, b)
        y = np.where(a_first, b, a)
    else:
        x, y = a, b
    order = np.lexsort((y, x))
    sx, sy = x[order], y[order]
    nodes, counts = np.unique(sx, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    return ray.put(key), ray.put((nodes, indptr, sy))


def _csr_rows(nodes: np.ndarray, indptr: np.ndarray, probe: np.ndarray):
    """Vectorized ragged gather of each probe row's CSR out-list.

    Returns ``(row, flat)``: ``row[i]`` is the probe index the i-th
    emitted neighbor belongs to, ``flat[i]`` its index into the CSR
    neighbor array.  Probes absent from ``nodes`` contribute nothing."""
    n = len(nodes)
    if n == 0 or len(probe) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos = np.searchsorted(nodes, probe)
    np.clip(pos, 0, n - 1, out=pos)
    ok = nodes[pos] == probe
    starts = np.where(ok, indptr[pos], 0)
    lens = np.where(ok, indptr[pos + 1] - indptr[pos], 0)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row = np.repeat(np.arange(len(probe), dtype=np.int64), lens)
    offs = (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens))
    flat = np.repeat(starts, lens) + offs
    return row, flat


class _ClosureProbe:
    """Vectorized membership test of id-canonical (x, y) pairs against the
    broadcast sorted edge-key array."""

    def __init__(self, key_ref):
        self.keys = ray.get(key_ref)

    def hits(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        k = (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)
        if not len(self.keys):
            return np.zeros(len(k), bool)
        pos = np.clip(np.searchsorted(self.keys, k), 0, len(self.keys) - 1)
        return self.keys[pos] == k


def q_part_triangles(sf_dir: str):
    edges = _co_order_edges(sf_dir)  # reused below
    m = edges.count()
    # wedge (a < b < c) closes iff (a, c) is an edge
    bc = _edge_bcast(edges, m)
    if bc is not None:
        key_ref, csr_ref = bc

        class _CountClosed(_ClosureProbe):
            def __init__(self):
                super().__init__(key_ref)
                self.nodes, self.indptr, self.nbrs = ray.get(csr_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                # wedges generated in place: per edge (a, b), c ranges
                # over outN(b) (all > b by canonicality) — no wedge join
                a = t.column("a").to_numpy()
                b = t.column("b").to_numpy()
                row, flat = _csr_rows(self.nodes, self.indptr, b)
                h = self.hits(a[row], self.nbrs[flat])
                return pa.table({"pt": pa.array([int(h.sum())], pa.int64())})

        total = edges.map_batches(_CountClosed, batch_format="pyarrow",
                                  batch_size=4096,
                                  concurrency=(1, 16)).sum("pt")
        return pd.DataFrame({"n_triangles": pd.Series([int(total)],
                                                      dtype="int64")})
    right = edges.map_batches(
        lambda t: t.rename_columns(["mid", "c"]), batch_format="pyarrow")
    wedges = edges.join(right, join_type="inner",
                        num_partitions=_tri_parts(sf_dir, m),
                        on=("b",), right_on=("mid",))
    closed = wedges.map_batches(
        lambda t: t.select(["a", "c"]), batch_format="pyarrow").join(
        edges.map_batches(lambda t: t.rename_columns(["ea", "eb"]),
                          batch_format="pyarrow"),
        join_type="inner", num_partitions=_tri_parts(sf_dir, m),
        on=("a", "c"), right_on=("ea", "eb"))
    return pd.DataFrame({"n_triangles": pd.Series([closed.count()],
                                                  dtype="int64")})


def q_part_triangles_ordered(sf_dir: str):
    """The O(m^1.5) skew-defended triangle count: identical result to
    ``part_triangles`` (same SQL oracle), but wedges pivot at each edge's
    LOWEST-(degree, id) endpoint instead of the canonical middle vertex.
    Orienting every edge from its lower- to its higher-degree endpoint
    bounds per-pivot out-degree by O(sqrt(m)), so the wedge fan-out is
    O(m^1.5) total regardless of hub skew — the standard mitigation for
    power-law web graphs where the id-canonical pivot explodes at hubs.
    Each triangle is produced exactly once (at its unique lowest-(deg,id)
    vertex); the closure probe stays id-canonical so no second degree
    lookup is needed.  Degrees are broadcast as sorted parallel arrays
    (bounded by |parts| — the pagerank-broadcast regime; the node-keyed
    join swap in functions/graph.py is the documented 10^10-node path).
    """
    edges = _co_order_edges(sf_dir)

    # degree fold: one (node, deg) row per node, << |edges|
    def deg_partial(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t.column("a").combine_chunks(),
                                 t.column("b").combine_chunks()])
        g = pa.table({"node": node}).group_by("node").aggregate(
            [("node", "count")])
        return g.rename_columns(["node", "pd"])

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("pd", alias_name="deg"))
           .to_pandas().sort_values("node"))
    deg_ref = ray.put((deg["node"].to_numpy(np.int64),
                       deg["deg"].to_numpy(np.int64)))

    class _Orient:
        """(a, b) -> (u, v) with (deg, id)(u) < (deg, id)(v)."""

        def __init__(self):
            self.nodes, self.degs = ray.get(deg_ref)

        def _deg(self, x: np.ndarray) -> np.ndarray:
            return self.degs[np.searchsorted(self.nodes, x)]

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy()
            b = t.column("b").to_numpy()
            da, db = self._deg(a), self._deg(b)
            a_first = (da < db) | ((da == db) & (a < b))
            return pa.table({"u": np.where(a_first, a, b),
                             "v": np.where(a_first, b, a)})

    m = edges.count()
    bc = _edge_bcast(edges, m,
                     orient_deg=(deg["node"].to_numpy(np.int64),
                                 deg["deg"].to_numpy(np.int64)))
    if bc is not None:
        key_ref, csr_ref = bc

        class _CountClosed(_ClosureProbe):
            def __init__(self):
                super().__init__(key_ref)
                self.dnodes, self.degs = ray.get(deg_ref)
                self.nodes, self.indptr, self.nbrs = ray.get(csr_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                # orient the batch, then generate the O(sqrt(m))-bounded
                # out-wedges per oriented edge locally: for (u, v), w
                # ranges over outN(u) with w > v (each unordered out-pair
                # once, id-canonical for the probe) — no wedge join
                a = t.column("a").to_numpy()
                b = t.column("b").to_numpy()
                da = self.degs[np.searchsorted(self.dnodes, a)]
                db = self.degs[np.searchsorted(self.dnodes, b)]
                a_first = (da < db) | ((da == db) & (a < b))
                u = np.where(a_first, a, b)
                v = np.where(a_first, b, a)
                row, flat = _csr_rows(self.nodes, self.indptr, u)
                w = self.nbrs[flat]
                vv = v[row]
                keep = vv < w
                h = self.hits(vv[keep], w[keep])
                return pa.table({"pt": pa.array([int(h.sum())], pa.int64())})

        total = edges.map_batches(_CountClosed, batch_format="pyarrow",
                                  batch_size=4096,
                                  concurrency=(1, 16)).sum("pt")
        return pd.DataFrame({"n_triangles": pd.Series([int(total)],
                                                      dtype="int64")})

    oriented = edges.map_batches(_Orient, batch_format="pyarrow",
                                 concurrency=(1, 4)).materialize()
    nparts = _tri_parts(sf_dir, m)
    right = oriented.map_batches(
        lambda t: t.rename_columns(["u2", "w"]), batch_format="pyarrow")
    wedge = oriented.join(right, join_type="inner", num_partitions=nparts,
                          on=("u",), right_on=("u2",))

    def half(t: pa.Table) -> pa.Table:
        # keep each unordered out-pair once, id-canonical for the probe
        v = t.column("v").to_numpy()
        w = t.column("w").to_numpy()
        keep = v < w
        return pa.table({"a": v[keep], "c": w[keep]})

    closed = wedge.map_batches(half, batch_format="pyarrow").join(
        edges.map_batches(lambda t: t.rename_columns(["ea", "eb"]),
                          batch_format="pyarrow"),
        join_type="inner", num_partitions=nparts,
        on=("a", "c"), right_on=("ea", "eb"))
    return pd.DataFrame({"n_triangles": pd.Series([closed.count()],
                                                  dtype="int64")})


def q_part_clustering_coeff(sf_dir: str):
    """Local clustering coefficient per node over the co-order part graph:
    coeff(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1)).  Triangle and
    degree counts are exact distributed integer folds (the id-canonical
    wedge/closure plan keeping all three vertices per closed triangle,
    then a 3-way explode + per-node sum); the ONLY float op is the single
    final division, performed identically by the oracle, so the double
    output hashes bit-equal.  The final (node, n_tri, deg) merge happens
    driver-side — bounded by |parts|, the graph family's documented
    broadcast regime."""
    edges = _co_order_edges(sf_dir)
    m = edges.count()

    # wedges keeping the middle vertex: (a, b, c) with a < b < c
    bc = _edge_bcast(edges, m)
    if bc is not None:
        # broadcast closure + local wedge generation: each edge batch
        # emits its wedges from the CSR, keeps the closed triangles in
        # place and folds to per-node partials — no wedge join
        key_ref, csr_ref = bc

        class _TriPartial(_ClosureProbe):
            def __init__(self):
                super().__init__(key_ref)
                self.nodes, self.indptr, self.nbrs = ray.get(csr_ref)
                # dense node index for O(n + k) bincount partials (the
                # np.unique sort was the probe loop's hot spot)
                self.allnodes = np.unique(
                    np.concatenate([self.nodes, self.nbrs]))

            def __call__(self, t: pa.Table) -> pa.Table:
                a = t.column("a").to_numpy()
                b = t.column("b").to_numpy()
                row, flat = _csr_rows(self.nodes, self.indptr, b)
                av = a[row]
                cv = self.nbrs[flat]
                h = self.hits(av, cv)
                node = np.concatenate([av[h], b[row][h], cv[h]])
                cnt = np.bincount(np.searchsorted(self.allnodes, node),
                                  minlength=len(self.allnodes))
                nz = np.flatnonzero(cnt)
                return pa.table({"node": pa.array(self.allnodes[nz],
                                                  pa.int64()),
                                 "pt": pa.array(cnt[nz], pa.int64())})

        tri = (_bucket_fold(
            edges.map_batches(_TriPartial, batch_format="pyarrow",
                              batch_size=16384, concurrency=(1, 8)),
            "node", {"pt": ("n_tri", "sum")})
               .to_pandas())  # <= |parts| rows
    else:
        nparts = _tri_parts(sf_dir, m)
        right = edges.map_batches(
            lambda t: t.rename_columns(["mid", "c"]), batch_format="pyarrow")
        wedges = edges.join(right, join_type="inner", num_partitions=nparts,
                            on=("b",), right_on=("mid",))
        closed = wedges.map_batches(
            lambda t: t.select(["a", "b", "c"]), batch_format="pyarrow").join(
            edges.map_batches(lambda t: t.rename_columns(["ea", "eb"]),
                              batch_format="pyarrow"),
            join_type="inner", num_partitions=nparts,
            on=("a", "c"), right_on=("ea", "eb"))

        def tri_explode(t: pa.Table) -> pa.Table:
            node = pa.concat_arrays(
                [t.column(c).combine_chunks() for c in ("a", "b", "c")])
            g = pa.table({"node": node}).group_by("node").aggregate(
                [("node", "count")])
            return g.rename_columns(["node", "pt"])

        tri = (closed.map_batches(tri_explode, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("pt", alias_name="n_tri"))
               .to_pandas())  # <= |parts| rows

    def deg_partial(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays([t.column("a").combine_chunks(),
                                 t.column("b").combine_chunks()])
        g = pa.table({"node": node}).group_by("node").aggregate(
            [("node", "count")])
        return g.rename_columns(["node", "pd"])

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("pd", alias_name="deg"))
           .to_pandas())  # <= |parts| rows
    out = deg.merge(tri, on="node", how="left")
    out["n_tri"] = out["n_tri"].fillna(0).astype("int64")
    out["deg"] = out["deg"].astype("int64")
    d = out["deg"].to_numpy(np.int64)
    t2 = out["n_tri"].to_numpy(np.int64)
    coeff = np.zeros(len(out), np.float64)
    m = d >= 2
    coeff[m] = (2.0 * t2[m]) / (d[m] * (d[m] - 1))
    out["coeff"] = coeff
    return (out[["node", "n_tri", "deg", "coeff"]]
            .sort_values("node").reset_index(drop=True))


# ---------------------------------------------------------------------------
# TPC-H Q6 shape (forecasting revenue change): the purest predicate-pushdown
# demonstration — date window + discount band + quantity cap ALL evaluated
# in the parquet scan (row-group pruning on l_shipdate statistics), a single
# per-batch integer partial, one global sum.  No shuffle, no join, nothing
# row-level on the driver.  Revenue is reported in exact 1e-4-dollar units
# (cents x discount-percent) so no float product ordering can differ.
# ---------------------------------------------------------------------------

def q_discounted_revenue(sf_dir: str):
    import datetime as _dt

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1997, 1, 1)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity"],
        filter=((pds.field("l_shipdate") >= lo)
                & (pds.field("l_shipdate") < hi)))

    def partial(t: pa.Table) -> pa.Table:
        d100 = pc.cast(pc.round(pc.multiply(t.column("l_discount"), 100.0)),
                       pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(d100, 5), pc.less_equal(d100, 7)),
            pc.less(t.column("l_quantity"), 24.0))
        ec = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)),
                     pa.int64())
        kept = pa.table({"ec": ec, "d100": d100}).filter(keep)
        rev = pc.sum(pc.multiply(kept.column("ec"),
                                 kept.column("d100"))).as_py() or 0
        return pa.table({"pr": pa.array([int(rev)], pa.int64()),
                         "pn": pa.array([kept.num_rows], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["pr", "pn"])
    return pd.DataFrame({"revenue_c4": [int(agg["sum(pr)"])],
                         "n_items": [int(agg["sum(pn)"])]})


# ---------------------------------------------------------------------------
# TPC-H Q19 shape (disjunctive predicate revenue): an OR-of-ANDs across BOTH
# join sides.  The part-side conditions bound the part table to three
# (type, size-range) families, so the qualifying partkeys broadcast as
# sorted arrays with a per-key family tag; each lineitem batch probes them
# with ONE searchsorted and evaluates the family-specific quantity band
# vectorized — the disjunction never forces a join or a shuffle.  Revenue is
# exact integer cents x (100 - discount-percent), 1e-4-dollar units.
# ---------------------------------------------------------------------------

def _disj_fam_table(t: pa.Table) -> pa.Table:
    """(p_partkey, fam) rows for parts matching any Q19 family."""
    ptype = t.column("p_type").to_numpy(zero_copy_only=False)
    psize = t.column("p_size").to_numpy()
    fam = np.full(t.num_rows, -1, np.int8)
    fam[(ptype == "PROMO") & (psize >= 1) & (psize <= 15)] = 0
    fam[(ptype == "ECONOMY") & (psize >= 10) & (psize <= 30)] = 1
    fam[(ptype == "LARGE") & (psize >= 20) & (psize <= 50)] = 2
    hit = fam >= 0
    return pa.table({
        "p_partkey": t.column("p_partkey").filter(pa.array(hit)),
        "fam": pa.array(fam[hit].astype(np.int64), pa.int64())})


def q_disjunctive_revenue(sf_dir: str, *, route: str | None = None):
    """TPC-H Q19 analogue (OR-of-ANDs revenue).  Size-routed: below
    _BCAST_DIM_MAX_ROWS the family-tagged partkey probe is broadcast into
    the lineitem scan (zero shuffle); past it per-(partkey, qty) revenue
    partials — the keep decision depends only on that pair — meet the
    family-tagged part read in a hash-partitioned join."""
    import pyarrow.parquet as pq

    if route is None:
        route = ("broadcast"
                 if pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
                 <= _BCAST_DIM_MAX_ROWS else "hashjoin")
    qlo = np.array([1, 10, 20], np.int64)
    qhi = np.array([20, 35, 50], np.int64)

    if route == "hashjoin":
        from ..rayops import fit_for_join

        nparts = _join_parts(sf_dir, "lineitem")
        fam_ds = fit_for_join(
            rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_type", "p_size"])
            .map_batches(_disj_fam_table, batch_format="pyarrow"),
            pa.schema([("p_partkey", pa.int64()), ("fam", pa.int64())]))
        if fam_ds.count() == 0:  # join rejects a fully-empty side
            return pd.DataFrame({"revenue_c4": [0], "n_items": [0]})

        def li_partial(t: pa.Table) -> pa.Table:
            # identical per-row arithmetic to _Probe: rev term is
            # ec * (100 - d100); keep depends only on (partkey, q)
            q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy()
            ec = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()).to_numpy()
            d100 = pc.cast(pc.round(pc.multiply(
                t.column("l_discount"), 100.0)), pa.int64()).to_numpy()
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "q": pa.array(q, pa.int64()),
                           "rev": pa.array(ec * (100 - d100), pa.int64())})
                 .group_by(["l_partkey", "q"])
                 .aggregate([("rev", "sum"), ("rev", "count")]))
            return g.rename_columns(["l_partkey", "q", "p_rev", "p_n"])

        li_parts = fit_for_join(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_quantity",
                                     "l_extendedprice", "l_discount"])
            .map_batches(li_partial, batch_format="pyarrow"),
            pa.schema([("l_partkey", pa.int64()), ("q", pa.int64()),
                       ("p_rev", pa.int64()), ("p_n", pa.int64())]))
        joined = li_parts.join(fam_ds, join_type="inner",
                               num_partitions=nparts,
                               on=("l_partkey",), right_on=("p_partkey",))

        def band_fold(t: pa.Table) -> pa.Table:
            f = t.column("fam").to_numpy()
            q = t.column("q").to_numpy()
            keep = (q >= qlo[f]) & (q <= qhi[f])
            return pa.table({
                "pr": pa.array([int(t.column("p_rev").to_numpy()[keep]
                                    .sum())], pa.int64()),
                "pn": pa.array([int(t.column("p_n").to_numpy()[keep]
                                    .sum())], pa.int64())})

        agg = joined.map_batches(band_fold,
                                 batch_format="pyarrow").sum(["pr", "pn"])
        return pd.DataFrame({"revenue_c4": [int(agg["sum(pr)"])],
                             "n_items": [int(agg["sum(pn)"])]})

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type", "p_size"])
    tagged = _disj_fam_table(part)
    pkey_hit = tagged.column("p_partkey").to_numpy()
    fam_hit = tagged.column("fam").to_numpy().astype(np.int8)
    order = np.argsort(pkey_hit)
    keys_ref = ray.put((pkey_hit[order], fam_hit[order]))

    class _Probe:
        def __init__(self):
            self.keys, self.fam = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t.column("l_partkey").to_numpy()
            q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy()
            ec = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100.0)), pa.int64()).to_numpy()
            d100 = pc.cast(pc.round(pc.multiply(
                t.column("l_discount"), 100.0)), pa.int64()).to_numpy()
            pos = np.searchsorted(self.keys, pk)
            pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
            m = (self.keys[pos_c] == pk) if len(self.keys) else \
                np.zeros(len(pk), bool)
            f = self.fam[pos_c[m]].astype(np.int64)
            qm = q[m]
            band = (qm >= qlo[f]) & (qm <= qhi[f])
            keep = np.zeros(len(pk), bool)
            keep[np.nonzero(m)[0][band]] = True
            rev = int((ec[keep] * (100 - d100[keep])).sum())
            return pa.table({"pr": pa.array([rev], pa.int64()),
                             "pn": pa.array([int(keep.sum())], pa.int64())})

    agg = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])
           .map_batches(lambda t: _Probe()(t), batch_format="pyarrow")
           .sum(["pr", "pn"]))
    return pd.DataFrame({"revenue_c4": [int(agg["sum(pr)"])],
                         "n_items": [int(agg["sum(pn)"])]})


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (suppliers who kept multi-supplier orders waiting —
# EXISTS other-supplier + NOT EXISTS other-late-supplier per order): one
# lineitem ⋈ orders hash join date-decorates the lineitems, per-batch
# (orderkey, suppkey) max-late partials shrink the exchange, then ONE
# orderkey-hash coarse-bucket map_groups resolves both quantified
# predicates with vectorized segment folds — no second shuffle keyed by
# orderkey and no per-order UDF dispatch.  The supplier-name decoration
# joins the (<= |supplier|-row) count table, never lineitem, and the final
# top-25 is the local-top-k merge, not a global sort.
# ---------------------------------------------------------------------------

WAIT_LAG_US = 60 * 86400 * 1_000_000


def _maxship_partial(t: pa.Table) -> pa.Table:
    # "any line late" == "max(shipdate) late", so the per-(orderkey,
    # suppkey) max folds BEFORE the join and the probe side shrinks from
    # |lineitem| to ~|distinct (orderkey, suppkey)|
    g = (pa.table({"l_orderkey": t.column("l_orderkey"),
                   "l_suppkey": t.column("l_suppkey"),
                   "ship_us": pc.cast(t.column("l_shipdate"), pa.int64())})
         .group_by(["l_orderkey", "l_suppkey"])
         .aggregate([("ship_us", "max")]))
    return g.rename_columns(["l_orderkey", "l_suppkey", "ship_us"])


def _late_partial(t: pa.Table) -> pa.Table:
    late = pc.cast(
        pc.greater(t.column("ship_us"),
                   pc.add(pc.cast(t.column("o_orderdate"), pa.int64()),
                          WAIT_LAG_US)), pa.int8())
    g = (pa.table({"l_orderkey": t.column("l_orderkey"),
                   "l_suppkey": t.column("l_suppkey"),
                   "late": late})
         .group_by(["l_orderkey", "l_suppkey"]).aggregate([("late", "max")]))
    return g.rename_columns(["l_orderkey", "l_suppkey", "late"])


def _waiting_bucket(g: pd.DataFrame) -> pd.DataFrame:
    # finish the (orderkey, suppkey) max-late fold — complete inside the
    # bucket because the bucket key is a pure function of orderkey —
    # then both EXISTS predicates are per-order scalar aggregates
    gg = (g.groupby(["l_orderkey", "l_suppkey"], sort=False)["late"].max()
          .reset_index())
    st = gg.groupby("l_orderkey", sort=False)["late"].agg(
        n_supp="count", n_late="sum")
    gg = gg.join(st, on="l_orderkey")
    hit = gg[(gg["late"] == 1) & (gg["n_supp"] >= 2) & (gg["n_late"] == 1)]
    return (hit.groupby("l_suppkey", sort=False).size()
            .reset_index(name="pn"))


def q_suppliers_kept_waiting(sf_dir: str, *, route: str | None = None):
    """TPC-H Q21 shape: suppliers whose late lineitem (shipdate more than
    60 days after the order date) is the ONLY late one in an order served
    by >= 2 distinct suppliers; count per supplier, top 25 by (numwait
    desc, s_name).

    Size-routed like returned_revenue_topk: below _BCAST_DIM_MAX_ROWS the
    orderkey→orderdate map is broadcast as two sorted int64 arrays and
    the late flag is a map-side lookup, so the only lineitem-sized
    exchange left is the obucket co-location groupby; past the threshold
    the hash-join plan runs.  Both routes pinned bit-equal in
    tests/test_query_shapes.py."""
    import pyarrow.parquet as pq
    from ..rayops import fit_for_join

    nb = _session_buckets()
    if route is None:
        n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        route = ("broadcast" if n_orders <= _BCAST_DIM_MAX_ROWS
                 else "hashjoin")

    if route == "broadcast":
        orders_t = pq.read_table(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_orderdate"])
        ok = orders_t.column("o_orderkey").to_numpy()
        od = pc.cast(orders_t.column("o_orderdate"), pa.int64()).to_numpy()
        oo = np.argsort(ok)
        ref = ray.put((ok[oo], od[oo]))

        class _LateBcast:
            def __init__(self, r):
                self.keys, self.od = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                g = _maxship_partial(t)
                k = g.column("l_orderkey").to_numpy()
                # inner-join semantics vs orders; empty-safe lookup
                hit, od_at = _sorted_lookup(self.keys, self.od, k)
                late = (g.column("ship_us").to_numpy()
                        > od_at + WAIT_LAG_US).astype(np.int8)
                kh = k[hit]
                return pa.table({
                    "l_orderkey": pa.array(kh, pa.int64()),
                    "l_suppkey": pa.array(
                        g.column("l_suppkey").to_numpy()[hit], pa.int64()),
                    "late": pa.array(late[hit], pa.int8()),
                    "obucket": pa.array((kh % nb).astype(np.int32),
                                        pa.int32())})

        flags = (rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"])
            .map_batches(_LateBcast, fn_constructor_kwargs={"r": ref},
                         batch_format="pyarrow", concurrency=(1, 8)))
        counts = _bucket_fold(
            flags.groupby("obucket")
            .map_groups(_waiting_bucket, batch_format="pandas"),
            "l_suppkey", {"pn": ("numwait", "sum")})
    else:
        nparts = _join_parts(sf_dir, "lineitem")
        ord_schema = pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))])
        orders = fit_for_join(
            rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_orderdate"]),
            ord_schema)
        li = (rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"])
            .map_batches(_maxship_partial, batch_format="pyarrow"))
        joined = li.join(orders, join_type="inner", num_partitions=nparts,
                         on=("l_orderkey",), right_on=("o_orderkey",))
        flags = joined.map_batches(_late_partial, batch_format="pyarrow")

        def add_obucket(t: pa.Table) -> pa.Table:
            b = pc.cast(pc.subtract(
                t.column("l_orderkey"),
                pc.multiply(pc.divide(t.column("l_orderkey"), nb), nb)),
                pa.int32())
            return t.append_column("obucket", b)

        counts = (flags.map_batches(add_obucket, batch_format="pyarrow")
                  .groupby("obucket")
                  .map_groups(_waiting_bucket, batch_format="pandas")
                  .groupby("l_suppkey")
                  .aggregate(Sum("pn", alias_name="numwait")))
    supp_schema = pa.schema([("s_suppkey", pa.int64()),
                             ("s_name", pa.string())])
    supp = fit_for_join(
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]), supp_schema)
    named = counts.join(supp, join_type="inner", num_partitions=2,
                        on=("l_suppkey",), right_on=("s_suppkey",))
    out = _topk(named, "numwait", "s_name", 25)
    out["numwait"] = out["numwait"].astype("int64")
    return out[["s_name", "numwait"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Gaps-and-islands (longest consecutive-day streak per user): the classic
# "day - rank(day)" island id, computed distributedly — per-batch distinct
# (user, day) partials shrink the exchange to one row per user-day per
# block, then ONE user-hash coarse-bucket map_groups finds islands in a
# single vectorized pass.  No global sort, no per-user dispatch.
# ---------------------------------------------------------------------------

def _streak_bucket(g: pd.DataFrame) -> pd.DataFrame:
    gg = (g.drop_duplicates(["user_id", "day"])
          .sort_values(["user_id", "day"]).reset_index(drop=True))
    rn = gg.groupby("user_id", sort=False).cumcount()
    isl = gg["day"].to_numpy() - rn.to_numpy()
    runs = (pd.DataFrame({"user_id": gg["user_id"], "isl": isl})
            .groupby(["user_id", "isl"], sort=False).size()
            .reset_index(name="len"))
    out = (runs.groupby("user_id", sort=False)["len"]
           .agg(n_days="sum", longest_streak="max").reset_index())
    out["n_days"] = out["n_days"].astype("int64")
    out["longest_streak"] = out["longest_streak"].astype("int64")
    return out


def q_user_streaks(sf_dir: str):
    """Per-user distinct active days + longest run of consecutive calendar
    days (UTC epoch days, exact integer arithmetic end to end)."""
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), 86_400_000_000)
        g = (pa.table({"user_id": t.column("user_id"), "day": day})
             .group_by(["user_id", "day"]).aggregate([]))
        b = pc.cast(pc.subtract(
            g.column("user_id"),
            pc.multiply(pc.divide(g.column("user_id"), nb), nb)), pa.int32())
        return g.append_column("ubucket", b)

    return (ds.map_batches(day_partial, batch_format="pyarrow")
            .groupby("ubucket")
            .map_groups(_streak_bucket, batch_format="pandas")
            .to_pandas().sort_values("user_id").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (parts minimal in size while maximal in retail
# price): local skyline per block, union, one refine pass.  Soundness: a
# true frontier row is dominated by nobody, so every block keeps it; a
# pruned row's pruner (or its transitive dominator) survives into the
# union, so the refine pass over the small candidate set removes exactly
# the globally-dominated rows.  The exchange is the candidate union —
# bounded by |distinct sizes| x per-size ties per block — never the table.
# ---------------------------------------------------------------------------

def _local_skyline(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return t
    size = t.column("p_size").to_numpy()
    price = t.column("p_retailprice").to_numpy()
    order = np.lexsort((-price, size))
    s, p = size[order], price[order]
    first = np.ones(len(s), bool)
    first[1:] = s[1:] != s[:-1]
    gidx = np.cumsum(first) - 1
    # per size-group max price is its first row (price sorted desc in group)
    cmax_le = np.maximum.accumulate(p[first])   # max price over size <= g
    cmax_lt = np.empty_like(cmax_le)            # max price over size <  g
    cmax_lt[0] = -np.inf
    cmax_lt[1:] = cmax_le[:-1]
    dominated = (cmax_lt[gidx] >= p) | (cmax_le[gidx] > p)
    keep = np.sort(order[~dominated])
    return t.take(pa.array(keep, pa.int64()))


def q_part_skyline(sf_dir: str):
    """Pareto-dominance filter: keep parts for which no other part has
    size <= AND retailprice >= with at least one strict inequality (ties
    on both axes are mutually non-dominating and all kept)."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size", "p_retailprice"])
    cand = pa.concat_tables(
        ds.map_batches(_local_skyline, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    refined = _local_skyline(cand.combine_chunks())
    return refined.take(
        pc.sort_indices(refined, sort_keys=[("p_partkey", "ascending")]))


# ---------------------------------------------------------------------------
# Edit-distance-1 similarity join over the distinct part-name vocabulary
# (FastSS / SymSpell deletion-neighborhood): d(a, b) <= 1 implies a and b
# share a member of {s} ∪ deletions1(s), so emitting |s|+1 keys per
# distinct name and grouping by key yields a provably complete candidate
# set; each candidate pair is then verified with an exact O(len) distance-
# <=1 check.  Everything past the first distinct runs at VOCABULARY size
# (distinct names), never at row count — the standard shape for fuzzy
# joins over categorical string columns at 100 TB.  No candidate cap: the
# per-key group size is bounded by the deletion-neighborhood fan-in
# (alphabet x length), not by data skew.
# ---------------------------------------------------------------------------

def _lev_le1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if a == b:
        return True
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _emit_del1(t: pa.Table, nb: int) -> pa.Table:
    import zlib

    ks, ns, bs = [], [], []
    for name in t.column("p_name").to_pylist():
        for k in [name] + [name[:i] + name[i + 1:] for i in range(len(name))]:
            ks.append(k)
            ns.append(name)
            bs.append(zlib.crc32(k.encode("utf-8")) % nb)
    return pa.table({"kbucket": pa.array(bs, pa.int32()),
                     "k": pa.array(ks, pa.string()),
                     "p_name": pa.array(ns, pa.string())})


def _editpairs_bucket(g: pd.DataFrame) -> pa.Table:
    pairs = set()
    for _, grp in g.groupby("k", sort=False):
        names = sorted(set(grp["p_name"]))
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                a, b = names[i], names[j]
                if (a, b) not in pairs and _lev_le1(a, b):
                    pairs.add((a, b))
    srt = sorted(pairs)
    # typed Arrow output (not object-dtype pandas) so empty buckets carry
    # a real string schema through the exchange
    return pa.table({"name_a": pa.array([p[0] for p in srt], pa.string()),
                     "name_b": pa.array([p[1] for p in srt], pa.string())})


def q_name_edit_pairs(sf_dir: str):
    """All unordered pairs of DISTINCT part names within Levenshtein
    distance 1, via complete deletion-neighborhood candidate generation
    plus exact verification (bit-equal to brute-force levenshtein SQL)."""
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    distinct = (ds.map_batches(
        lambda t: t.group_by("p_name").aggregate([]),
        batch_format="pyarrow")
        .groupby("p_name").aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"]))
    pairs = (distinct
             .map_batches(lambda t: _emit_del1(t, nb),
                          batch_format="pyarrow")
             .groupby("kbucket")
             .map_groups(_editpairs_bucket, batch_format="pandas")
             .groupby(["name_a", "name_b"])
             .aggregate(Count(alias_name="_c")))
    out = pairs.to_pandas()
    if out.empty:
        return pd.DataFrame({"name_a": pd.Series(dtype=object),
                             "name_b": pd.Series(dtype=object)})
    return (out.sort_values(["name_a", "name_b"]).reset_index(drop=True)
            [["name_a", "name_b"]])


# ---------------------------------------------------------------------------
# Distributed sweep line (peak interval concurrency per day): every event
# occupies [ts, ts + 15 min); concurrency is the running sum of ±1
# endpoint deltas in global (t, d) order.  The global ordered prefix sum
# is the sequence_pack shape re-used on time: per-day delta sums -> a
# driver cumsum over the (calendar-bounded) day table -> per-day carry-in
# offsets -> ONE day-keyed map_groups does the in-day cumsum + max
# vectorized.  No global sort of the endpoint stream; the exchange moves
# 2 rows per event once, partitioned by day.
# ---------------------------------------------------------------------------

CONCUR_SPAN_US = 15 * 60 * 1_000_000
_DAY_US = 86_400_000_000


def _endpoints_partial(t: pa.Table) -> pa.Table:
    ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    tt = np.concatenate([ts, ts + CONCUR_SPAN_US])
    d = np.concatenate([np.ones(len(ts), np.int64),
                        np.full(len(ts), -1, np.int64)])
    # pre-collapse to one row per (day, t, d) with summed deltas
    g = (pa.table({"day": pa.array(tt // _DAY_US),
                   "t": pa.array(tt), "d": pa.array(d),
                   "dv": pa.array(d)})
         .group_by(["day", "t", "d"]).aggregate([("dv", "sum")]))
    return g.rename_columns(["day", "t", "d", "dsum"])


def q_peak_concurrency(sf_dir: str):
    """Max concurrent 15-minute event intervals per day (RANGE-frame
    running-sum semantics: ties on (t, d) are folded before the max, so
    the result is order-independent and bit-stable)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    eps = ds.map_batches(_endpoints_partial, batch_format="pyarrow")
    # pass 1: per-day delta totals -> driver cumsum -> carry-in per day
    day_sums = (eps.groupby("day").aggregate(Sum("dsum", alias_name="dtot"))
                .to_pandas().sort_values("day"))
    carry = dict(zip(day_sums["day"],
                     day_sums["dtot"].cumsum().shift(fill_value=0)
                     .astype("int64")))
    carry_ref = ray.put(carry)

    def peak_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = int(ray.get(carry_ref)[int(g["day"].iloc[0])])
        gg = (g.groupby(["t", "d"], sort=False)["dsum"].sum().reset_index()
              .sort_values(["t", "d"]))
        run = base + gg["dsum"].cumsum()
        return pd.DataFrame({"day": [int(g["day"].iloc[0])],
                             "peak": [int(run.max())]})

    out = (eps.groupby("day").map_groups(peak_bucket, batch_format="pandas")
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["peak"] = out["peak"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Model-based quality filtering: distributed full-batch logistic
# regression (functions/logreg.py) trained ON THE ENGINE — per-iteration
# exchange is one (d+2)-float partial per block, weights broadcast via
# ray.put, bstart-ordered deterministic reduce (the kmeans shape applied
# to gradient descent).  The feature table (4 floats + id) is
# materialized once so the 30 GD passes don't re-tokenize text.
# ---------------------------------------------------------------------------

def _logreg_featurize(b: pd.DataFrame) -> pd.DataFrame:
    n_chars = b["n_chars"].to_numpy(dtype=np.float64)
    words = (b["text"].str.count(" ").to_numpy(dtype=np.float64) + 1.0)
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy(),
        "lang": b["lang"].to_numpy(),
        "f1": np.log1p(words),
        "f2": n_chars / words,                 # mean word length + 1
        "y": (n_chars >= 300).astype(np.int8),  # "long-form" label
    })


def q_quality_logreg(sf_dir: str):
    """Model-based quality filtering demo: learn the long-form cut
    (n_chars >= 300) from word-count shape features, then report per-lang
    (docs, true long, predicted long).  The corpus labels languages over
    one shared vocabulary, so lang itself is unlearnable by construction —
    the length cut is the honest learnable target.  Integer outputs;
    training is bit-deterministic (bstart-ordered reduces end to end)."""
    from ..functions.logreg import feature_stats, logreg_fit, logreg_predict

    cols = ["f1", "f2"]
    raw = (_docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
           .map_batches(_logreg_featurize, batch_format="pandas")
           .materialize())
    mu, sd = feature_stats(raw, cols, "doc_id")

    def zscore(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        for i, c in enumerate(cols):
            out[c] = (b[c].to_numpy(dtype=np.float64) - mu[i]) / sd[i]
        return out

    feats = raw.map_batches(zscore, batch_format="pandas").materialize()
    w, hist = logreg_fit(feats, cols, "y", "doc_id", iters=60, lr=1.0)
    scored = logreg_predict(feats, w, cols)

    def perlang_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"lang": t.column("lang"),
                       "pred": pc.cast(t.column("pred"), pa.int64()),
                       "yl": pc.cast(t.column("y"), pa.int64()),
                       "one": pa.array(np.ones(t.num_rows, np.int64))})
             .group_by("lang").aggregate([("one", "sum"), ("yl", "sum"),
                                          ("pred", "sum")]))
        return g.rename_columns(["lang", "pn", "py", "ppred"])

    out = (scored.map_batches(perlang_partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("pn", alias_name="n_docs"),
                      Sum("py", alias_name="n_long"),
                      Sum("ppred", alias_name="n_pred_long"))
           .to_pandas().sort_values("lang").reset_index(drop=True))
    for c in ("n_docs", "n_long", "n_pred_long"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# TPC-H Q11 plan shape (per-group aggregate filtered by a correlated
# GLOBAL-aggregate threshold): the per-part quantity table is built once
# with the partial/combiner pattern and materialized (bounded by |part|),
# the global total is a sum over THAT table (never a second lineitem
# scan), and the share filter is an exact integer cross-multiplication —
# no floats, no correlated re-scan.
# ---------------------------------------------------------------------------

def q_important_parts(sf_dir: str):
    """Parts whose total ordered quantity exceeds 1.5x the per-part
    average — exact integer cross-multiplication (qty * n_parts * 2 >
    3 * total), so the threshold is SCALE-INVARIANT: the qualifying
    fraction stays stable as |part| grows with the corpus."""
    def qty_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"l_partkey": t.column("l_partkey"),
                       "q": pc.cast(t.column("l_quantity"), pa.int64())})
             .group_by("l_partkey").aggregate([("q", "sum")]))
        return g.rename_columns(["l_partkey", "pq"])

    per_part = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_partkey", "l_quantity"])
                .map_batches(qty_partial, batch_format="pyarrow")
                .groupby("l_partkey").aggregate(Sum("pq", alias_name="qty"))
                .materialize())
    total = int(per_part.sum("qty"))
    n_parts = int(per_part.count())

    def share_filter(t: pa.Table) -> pa.Table:
        qty = pc.cast(t.column("qty"), pa.int64())
        keep = pc.greater(pc.multiply(qty, 2 * n_parts), 3 * total)
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "qty": qty}).filter(keep)

    out = (per_part.map_batches(share_filter, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        out = pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                            "qty": pd.Series(dtype="int64")})
    return out.sort_values("l_partkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT as per-key boolean flag folds: which parts were
# ordered in BOTH 1996 and 1997, and in exactly one?  The year window is
# pushed into the orders scan (parts outside both years contribute zero
# to every output, so pre-filtering is lossless) and two MAX folds per
# partkey resolve set membership — the set-algebra answer without
# materializing either set.  Size-routed like returned_revenue_topk:
# below _BCAST_DIM_MAX_ROWS the windowed orderkey→year-flag map is
# broadcast (sorted arrays) and the plan is ONE groupby; past it, the
# lineitem pre-distinct + hash-join plan runs instead.  Both routes
# pinned bit-equal in tests/test_query_shapes.py.
# ---------------------------------------------------------------------------

def q_part_year_flags(sf_dir: str, *, route: str | None = None):
    import pyarrow.parquet as pq
    from ..rayops import fit_for_join

    y96 = (pd.Timestamp("1996-01-01").value // 1000,
           pd.Timestamp("1997-01-01").value // 1000)

    if route is None:
        n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
        route = ("broadcast" if n_orders <= _BCAST_DIM_MAX_ROWS
                 else "hashjoin")

    if route == "broadcast":
        # orders fits the broadcast budget: ship the WINDOWED orderkey →
        # in-1996 flag as two sorted arrays (the two-year filter is pushed
        # into the point read, so the payload is the window's orders, not
        # the table) and the whole query is map-side lookups + ONE
        # groupby(l_partkey) — no lineitem-sized join exchange.  The
        # per-batch (orderkey, partkey) pre-distinct disappears too: MAX
        # over duplicate pairs equals MAX over the distinct set.
        orders_t = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
            filters=(pds.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
            & (pds.field("o_orderdate") < pd.Timestamp("1998-01-01")))
        ok = orders_t.column("o_orderkey").to_numpy()
        od_us = pc.cast(orders_t.column("o_orderdate"),
                        pa.int64()).to_numpy()
        oo = np.argsort(ok)
        y1_arr = (od_us < y96[1]).astype(np.int8)
        ref = ray.put((ok[oo], y1_arr[oo]))

        class _FlagPartial:
            def __init__(self, r):
                self.keys, self.y1 = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                k = t.column("l_orderkey").to_numpy()
                # inner-join semantics vs the windowed orders; empty-safe
                hit, y1_at = _sorted_lookup(self.keys, self.y1, k)
                y1v = y1_at[hit]
                g = (pa.table({
                    "l_partkey": pa.array(
                        t.column("l_partkey").to_numpy()[hit], pa.int64()),
                    "y1": pa.array(y1v, pa.int8()),
                    "y2": pa.array(1 - y1v, pa.int8())})
                    .group_by("l_partkey")
                    .aggregate([("y1", "max"), ("y2", "max")]))
                return g.rename_columns(["l_partkey", "y1", "y2"])

        flags = _bucket_fold(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
            .map_batches(_FlagPartial, fn_constructor_kwargs={"r": ref},
                         batch_format="pyarrow", concurrency=(1, 8)),
            "l_partkey", {"y1": ("m1", "max"), "y2": ("m2", "max")})
    else:
        nparts = _join_parts(sf_dir, "lineitem")
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"],
            filter=(pds.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
            & (pds.field("o_orderdate") < pd.Timestamp("1998-01-01")))

        def year_flags(t: pa.Table) -> pa.Table:
            us = pc.cast(t.column("o_orderdate"), pa.int64())
            in96 = pc.and_(pc.greater_equal(us, y96[0]), pc.less(us, y96[1]))
            return pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "y1": pc.cast(in96, pa.int8()),
                "y2": pc.cast(pc.invert(in96), pa.int8())})

        orders = orders.map_batches(year_flags, batch_format="pyarrow")
        ord_schema = pa.schema([("o_orderkey", pa.int64()),
                                ("y1", pa.int8()), ("y2", pa.int8())])
        li = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_partkey"])
              .map_batches(
                  lambda t: t.group_by(
                      ["l_orderkey", "l_partkey"]).aggregate([]),
                  batch_format="pyarrow"))
        joined = li.join(fit_for_join(orders, ord_schema), join_type="inner",
                         num_partitions=nparts,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def flag_partial(t: pa.Table) -> pa.Table:
            g = (pa.table({"l_partkey": t.column("l_partkey"),
                           "y1": t.column("y1"), "y2": t.column("y2")})
                 .group_by("l_partkey")
                 .aggregate([("y1", "max"), ("y2", "max")]))
            return g.rename_columns(["l_partkey", "y1", "y2"])

        flags = (joined.map_batches(flag_partial, batch_format="pyarrow")
                 .groupby("l_partkey")
                 .aggregate(Max("y1", alias_name="m1"),
                            Max("y2", alias_name="m2")))

    def count_partial(t: pa.Table) -> pa.Table:
        m1 = pc.cast(t.column("m1"), pa.int64()).to_numpy()
        m2 = pc.cast(t.column("m2"), pa.int64()).to_numpy()
        return pa.table({
            "pb": pa.array([int((m1 & m2).sum())], pa.int64()),
            "p1": pa.array([int((m1 & (1 - m2)).sum())], pa.int64()),
            "p2": pa.array([int(((1 - m1) & m2).sum())], pa.int64())})

    agg = flags.map_batches(count_partial, batch_format="pyarrow").sum(
        ["pb", "p1", "p2"])
    return pd.DataFrame({"n_both": [int(agg["sum(pb)"])],
                         "n_only_1996": [int(agg["sum(p1)"])],
                         "n_only_1997": [int(agg["sum(p2)"])]})


# ---------------------------------------------------------------------------
# Corpus tokenization with a trained BPE vocabulary: train once
# (distributed, cluster-batched merges), broadcast the merge list via
# ray.put, tokenize per batch through a per-actor WORD CACHE — the corpus
# re-uses each distinct word's tokenization, so encode cost scales with
# the vocabulary inside a batch, not with token count.  Output is
# integer per-lang stats (deterministic: BPE training and inference are
# both exact).
# ---------------------------------------------------------------------------

def q_bpe_tokenize_stats(sf_dir: str):
    from ..functions.bpe import apply_bpe, train_bpe_distributed

    merges = train_bpe_distributed(_docs(sf_dir, ["text"]), n_merges=30)
    merges_ref = ray.put(merges)

    class _Tokenize:
        def __init__(self):
            self.merges = ray.get(merges_ref)
            self.cache: dict[str, int] = {}

        def _ntok(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = len(apply_bpe(w, self.merges))
                self.cache[w] = n
            return n

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = np.fromiter(
                (sum(self._ntok(w) for w in t.split()) for t in b["text"]),
                dtype=np.int64, count=len(b))
            words = b["text"].str.split().str.len().fillna(0).astype("int64")
            g = (pd.DataFrame({"lang": b["lang"], "ptok": toks,
                               "pw": words.to_numpy(), "pn": 1})
                 .groupby("lang", sort=False).sum().reset_index())
            return g

    out = (_docs(sf_dir, ["text", "lang"])
           .map_batches(_Tokenize, batch_format="pandas",
                        concurrency=(1, 8))
           .groupby("lang")
           .aggregate(Sum("pn", alias_name="n_docs"),
                      Sum("pw", alias_name="n_words"),
                      Sum("ptok", alias_name="n_tokens"))
           .to_pandas().sort_values("lang").reset_index(drop=True))
    for c in ("n_docs", "n_words", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Variable-duration interval overlap join (concurrent session pairs per
# day): sessions are replicated to every day bucket their interval
# touches; each pair is counted EXACTLY ONCE at the later session start
# (the sweep-line owner rule — the later start lies in one bucket and
# both intervals provably reach it), so no cross-bucket dedup pass is
# needed.  Inside a bucket the count per owner is two searchsorted
# lookups (#starts < s  −  #ends < s); equal-start groups add C(k,2)
# once.  The exchange moves each session ≤ (span-days + 1) times — never
# a pairwise blowup.
# ---------------------------------------------------------------------------

def q_session_overlap_pairs(sf_dir: str):
    """Pairs of user sessions (30-min-gap sessionization, inclusive
    endpoint overlap) that were active simultaneously, grouped by the day
    of the later session start.  Same-user sessions never overlap by
    construction, so pairs are cross-user automatically."""
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    sessions = (ds.map_batches(lambda t: _bucket_users(t, nb),
                               batch_format="pyarrow")
                .groupby("ubucket")
                .map_groups(_sessionize_bucket, batch_format="pandas"))

    def replicate_days(b: pd.DataFrame) -> pd.DataFrame:
        st = b["session_start"].astype("int64").to_numpy()
        en = b["session_end"].astype("int64").to_numpy()
        d0 = st // _DAY_US
        d1 = en // _DAY_US
        reps = (d1 - d0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), reps)
        day = np.concatenate(
            [np.arange(a, z + 1) for a, z in zip(d0, d1)]) if len(b) else \
            np.empty(0, np.int64)
        return pd.DataFrame({"day": day, "st": st[idx], "en": en[idx],
                             "owner": (day == d0[idx]).astype(np.int8)})

    def overlap_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = int(g["day"].iloc[0])
        starts = np.sort(g["st"].to_numpy())
        ends = np.sort(g["en"].to_numpy())
        own = g[g["owner"] == 1]
        s = own["st"].to_numpy()
        cnt = (np.searchsorted(starts, s, side="left")
               - np.searchsorted(ends, s, side="left")).sum()
        # equal-start owner groups overlap mutually: C(k, 2) each, once
        _, k = np.unique(s, return_counts=True)
        cnt += int((k * (k - 1) // 2).sum())
        if cnt == 0:
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "n_pairs": pd.Series(dtype="int64")})
        return pd.DataFrame({"day": [day], "n_pairs": [int(cnt)]})

    out = (sessions.map_batches(replicate_days, batch_format="pandas")
           .groupby("day").map_groups(overlap_bucket, batch_format="pandas")
           .to_pandas().sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Sliding-window COUNT DISTINCT, exact (trailing-7-day active users per
# day): per-batch distinct (user, day) partials; ONE user-hash bucket
# pass finishes the per-user distinct, replicates each active day to the
# <= 7 result days it covers, dedups (user, result-day) LOCALLY (complete
# per user inside the bucket) and emits per-day partial counts — the
# global exchange is (buckets x days) tiny rows, never user-level data.
# The exact alternative to a sliding HLL, for when the answer must hash-
# match.
# ---------------------------------------------------------------------------

ROLL_WINDOW_DAYS = 7


def q_rolling_distinct_users(sf_dir: str):
    nb = _session_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def ud_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), _DAY_US)
        g = (pa.table({"user_id": t.column("user_id"), "day": day})
             .group_by(["user_id", "day"]).aggregate([]))
        b = pc.cast(pc.subtract(
            g.column("user_id"),
            pc.multiply(pc.divide(g.column("user_id"), nb), nb)), pa.int32())
        return g.append_column("ubucket", b)

    ud = ds.map_batches(ud_partial, batch_format="pyarrow").materialize()
    present = set(ud.groupby("day").aggregate(Count(alias_name="_c"))
                  .to_pandas()["day"].astype("int64"))

    def win_partial(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["user_id", "day"])
        days = gg["day"].to_numpy(dtype=np.int64)
        users = gg["user_id"].to_numpy()
        rday = (days[:, None] + np.arange(ROLL_WINDOW_DAYS)).ravel()
        cov = (pd.DataFrame({"u": np.repeat(users, ROLL_WINDOW_DAYS),
                             "rday": rday}).drop_duplicates()
               .groupby("rday").size().reset_index(name="pu"))
        cov["pu"] = cov["pu"].astype("int64")
        return cov

    counts = (ud.groupby("ubucket")
              .map_groups(win_partial, batch_format="pandas")
              .groupby("rday").aggregate(Sum("pu", alias_name="users_7d"))
              .to_pandas())
    counts = counts[counts["rday"].isin(present)]
    out = (counts.rename(columns={"rday": "day"})
           .sort_values("day").reset_index(drop=True))
    out["day"] = out["day"].astype("int64")
    out["users_7d"] = out["users_7d"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Hot-key weighted join (salted): events join a 5-row per-type weight
# table on event_type — a worst-case skewed key (5 distinct values over
# the whole fact table, so a plain hash join can keep at most 5
# aggregators busy no matter how many partitions it gets).  Routed
# through rayops.salted_join when the RIGHT side's distinct key count is
# below num_partitions x _SALT_KEY_FACTOR: each hot key splits across 8
# salt cells, bounding the largest partition by hot_key_rows / 8 while
# the 5-row weight table replicates 8x (the cheap side of the trade).
# Past the threshold the key space already spreads the hash join and the
# plain path wins — both routes pinned equal in tests/test_query_shapes.py.
# ---------------------------------------------------------------------------

EVENT_TYPE_WEIGHTS = [("view", 1), ("click", 2), ("purchase", 10),
                      ("signup", 5), ("error", 0)]
_SALT_KEY_FACTOR = 4


def q_events_topk_weighted(sf_dir: str, *, route: str | None = None):
    from ..rayops import fit_for_join, salted_join

    wt = pa.table({
        "w_event_type": pa.array([k for k, _ in EVENT_TYPE_WEIGHTS]),
        "weight": pa.array([w for _, w in EVENT_TYPE_WEIGHTS], pa.int64())})
    nparts = _join_parts(sf_dir, "events")
    if route is None:
        route = ("salted" if wt.num_rows < nparts * _SALT_KEY_FACTOR
                 else "plain")

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "value_cents": cents})

    ev = fit_for_join(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_id", "event_type", "value"])
        .map_batches(to_cents, batch_format="pyarrow"),
        pa.schema([("event_id", pa.int64()), ("event_type", pa.string()),
                   ("value_cents", pa.int64())]))
    weights = rd.from_arrow(wt)
    if route == "salted":
        joined = salted_join(ev, weights, on="event_type",
                             right_on="w_event_type",
                             num_partitions=nparts, salt=8)
    else:
        joined = ev.join(weights, join_type="inner", num_partitions=nparts,
                         on=("event_type",), right_on=("w_event_type",))

    def local_topk(t: pa.Table) -> pa.Table:
        t = pa.table({
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "weighted_cents": pc.multiply(t.column("value_cents"),
                                          t.column("weight"))})
        idx = pc.sort_indices(t, sort_keys=[("weighted_cents", "descending"),
                                            ("event_id", "ascending")])
        return t.take(idx[:20])

    head = (joined.map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    head = head.sort_values(["weighted_cents", "event_id"],
                            ascending=[False, True]).head(20)
    return head.reset_index(drop=True)


QUERIES = {
    "doc_count": q_doc_count,
    "doc_chars_sum": q_doc_chars_sum,
    "doc_chars_avg": q_doc_chars_avg,
    "summary_by_lang": q_summary_by_lang,
    "docs_topk_chars": q_docs_topk_chars,
    "docs_page2": q_docs_page2,
    "docs_sample_mod": q_docs_sample_mod,
    "engine_info": q_engine_info,
    "media_features": q_media_features,
    "media_features_real": q_media_features_real,
    "events_topk_value": q_events_topk_value,
    "events_topk_weighted": q_events_topk_weighted,
    "docs_filter": q_docs_filter,
    "dedup_exact": q_dedup_exact,
    "norm_exact_dedup": q_norm_exact_dedup,
    "crawl_diff": q_crawl_diff,
    "word_count": q_word_count,
    "events_by_type": q_events_by_type,
    "events_value_stats": q_events_value_stats,
    "distinct_sources": q_distinct_sources,
    "orders_by_month": q_orders_by_month,
    "customer_order_counts": q_customer_order_counts,
    "revenue_by_nation": q_revenue_by_nation,
    "brands_having": q_brands_having,
    "pricing_summary": q_pricing_summary,
    "revenue_by_segment": q_revenue_by_segment,
    "extract_flagship": q_extract_flagship,
    "pages_sniff_counts": q_pages_sniff_counts,
    "extract_markdown": q_extract_markdown,
    "extract_markdown_ref": q_extract_markdown_ref,
    "pdf_classify": q_pdf_classify,
    "pdf_doc_info": q_pdf_doc_info,
    "extract_summary_md": q_extract_summary_md,
    "events_hourly": q_events_hourly,
    "revenue_by_priority": q_revenue_by_priority,
    "user_sessions": q_user_sessions,
    "events_asof_orders": q_events_asof_orders,
    "quality_scores": q_quality_scores,
    "token_counts": q_token_counts,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "minhash_near_dups": q_minhash_near_dups,
    "jaccard_clusters": q_jaccard_clusters,
    "simhash_signatures": q_simhash_signatures,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_knn": q_embedding_knn,
    "embedding_ivf_knn": q_embedding_ivf_knn,
    "embedding_near_dups": q_embedding_near_dups,
    "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
    "customers_lapsed": q_customers_lapsed,
    "top_events_per_user": q_top_events_per_user,
    "user_running_value": q_user_running_value,
    "user_interarrival": q_user_interarrival,
    "events_value_band_join": q_events_value_band_join,
    "events_value_percentiles": q_events_value_percentiles,
    "events_type_percentiles": q_events_type_percentiles,
    "dup_ngrams_topk": q_dup_ngrams_topk,
    "doc_dup_ngram_coverage": q_doc_dup_ngram_coverage,
    "orders_status_pivot": q_orders_status_pivot,
    "events_value_tiers": q_events_value_tiers,
    "repeat_customers": q_repeat_customers,
    "top_words": q_top_words,
    "word_diversity": q_word_diversity,
    "props_value_by_type": q_props_value_by_type,
    "text_normalize": q_text_normalize,
    "approx_distinct_custkeys": q_approx_distinct_custkeys,
    "doc_top_terms": q_doc_top_terms,
    "value_p50_by_type": q_value_p50_by_type,
    "near_dup_clusters": q_near_dup_clusters,
    "curation": q_curation,
    "curation_extended": q_curation_extended,
    "embedding_knn_diverse": q_embedding_knn_diverse,
    "events_value_stddev_by_type": q_events_value_stddev_by_type,
    "orders_quarterly": q_orders_quarterly,
    "part_size_histogram": q_part_size_histogram,
    "user_event_gaps": q_user_event_gaps,
    "events_hopping_2h": q_events_hopping_2h,
    "building_orders": q_building_orders,
    "domain_quota": q_domain_quota,
    "top_bigrams": q_top_bigrams,
    "source_profiles": q_source_profiles,
    "decontaminate": q_decontaminate,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "pii_scrub": q_pii_scrub,
    "bloom_semi_join": q_bloom_semi_join,
    "corr_value_props": q_corr_value_props,
    "events_error_rate_daily": q_events_error_rate_daily,
    "doc_length_zscore": q_doc_length_zscore,
    "orders_monthly_growth": q_orders_monthly_growth,
    "events_value_7day_ma": q_events_value_7day_ma,
    "user_last_event": q_user_last_event,
    "events_value_winsorized": q_events_value_winsorized,
    "user_event_pairs_1h": q_user_event_pairs_1h,
    "local_supplier_revenue": q_local_supplier_revenue,
    "events_value_percentiles_cont": q_events_value_percentiles_cont,
    "promo_revenue_share": q_promo_revenue_share,
    "top_supplier_revenue": q_top_supplier_revenue,
    "nation_pair_volume": q_nation_pair_volume,
    "region_market_share": q_region_market_share,
    "token_familiarity": q_token_familiarity,
    "value_p50_by_type_cont": q_value_p50_by_type_cont,
    "set_similarity_join": q_set_similarity_join,
    "events_value_7day_median": q_events_value_7day_median,
    "new_users_daily": q_new_users_daily,
    "revenue_share_by_nation": q_revenue_share_by_nation,
    "events_value_approx_quantiles": q_events_value_approx_quantiles,
    "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
    "customer_rfm": q_customer_rfm,
    "events_value_ewma": q_events_value_ewma,
    "customer_top_decile_share": q_customer_top_decile_share,
    "user_gap_percentiles": q_user_gap_percentiles,
    "text_partition_skew": q_text_partition_skew,
    "doc_simpson_diversity": q_doc_simpson_diversity,
    "event_type_transitions": q_event_type_transitions,
    "forecast_revenue": q_forecast_revenue,
    "priority_returned_orders": q_priority_returned_orders,
    "value_trend_by_type": q_value_trend_by_type,
    "user_value_cume_dist": q_user_value_cume_dist,
    "doc_readability": q_doc_readability,
    "events_burst_days": q_events_burst_days,
    "bpe_merges": q_bpe_merges,
    "bigram_logprob": q_bigram_logprob,
    "source_pagerank": q_source_pagerank,
    "source_pagerank_join": q_source_pagerank_join,
    "customer_best_order": q_customer_best_order,
    "orders_yoy_growth": q_orders_yoy_growth,
    "source_vocab_overlap": q_source_vocab_overlap,
    "events_burst_days_robust": q_events_burst_days_robust,
    "events_value_ntile": q_events_value_ntile,
    "doc_metrics_unpivot": q_doc_metrics_unpivot,
    "char_class_profile": q_char_class_profile,
    "bigram_pmi": q_bigram_pmi,
    "events_value_mad": q_events_value_mad,
    "user_top_event_type": q_user_top_event_type,
    "nation_cust_supp": q_nation_cust_supp,
    "brand_weighted_price": q_brand_weighted_price,
    "cms_top_words": q_cms_top_words,
    "stratified_sample": q_stratified_sample,
    "orders_cube": q_orders_cube,
    "nation_customer_names": q_nation_customer_names,
    "big_orders_report": q_big_orders_report,
    "returned_revenue_topk": q_returned_revenue_topk,
    "funnel_conversion": q_funnel_conversion,
    "shipping_priority": q_shipping_priority,
    "repetition_ratio": q_repetition_ratio,
    "lang_rebalance": q_lang_rebalance,
    "events_hourly_users": q_events_hourly_users,
    "dup_rate_by_source": q_dup_rate_by_source,
    "docs_above_p90": q_docs_above_p90,
    "winnow_near_dups": q_winnow_near_dups,
    "shared_run_pairs": q_shared_run_pairs,
    "user_value_rank": q_user_value_rank,
    "events_after_cursor": q_events_after_cursor,
    "value_histogram": q_value_histogram,
    "orders_rollup": q_orders_rollup,
    "segment_dedup": q_segment_dedup,
    "doc_chunks": q_doc_chunks,
    "doc_chunks_overlap": q_doc_chunks_overlap,
    "sequence_pack": q_sequence_pack,
    "embedding_kmeans": q_embedding_kmeans,
    "semantic_dedup": q_semantic_dedup,
    "train_val_split": q_train_val_split,
    "cohort_retention": q_cohort_retention,
    "user_value_pct_rank": q_user_value_pct_rank,
    "bm25_topk": q_bm25_topk,
    "dsir_weights": q_dsir_weights,
    "weighted_sample": q_weighted_sample,
    "rich_idle_customers": q_rich_idle_customers,
    "customer_distribution": q_customer_distribution,
    "small_qty_part_revenue": q_small_qty_part_revenue,
    "slow_orders_by_priority": q_slow_orders_by_priority,
    "brand_supplier_counts": q_brand_supplier_counts,
    "part_triangles": q_part_triangles,
    "part_triangles_ordered": q_part_triangles_ordered,
    "part_clustering_coeff": q_part_clustering_coeff,
    "discounted_revenue": q_discounted_revenue,
    "disjunctive_revenue": q_disjunctive_revenue,
    "suppliers_kept_waiting": q_suppliers_kept_waiting,
    "user_streaks": q_user_streaks,
    "part_skyline": q_part_skyline,
    "name_edit_pairs": q_name_edit_pairs,
    "peak_concurrency": q_peak_concurrency,
    "quality_logreg": q_quality_logreg,
    "important_parts": q_important_parts,
    "part_year_flags": q_part_year_flags,
    "bpe_tokenize_stats": q_bpe_tokenize_stats,
    "session_overlap_pairs": q_session_overlap_pairs,
    "rolling_distinct_users": q_rolling_distinct_users,
}

ORACLE_SQL = {
    "doc_count": "SELECT count(*) AS n FROM documents",
    # every integer sum is CAST to BIGINT: DuckDB's sum(BIGINT) returns
    # HUGEINT/decimal128 while the Ray side emits int64 — values equal, the
    # driver's typed value-hash not (round-1 verdict root cause).
    "doc_chars_sum": "SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents",
    "doc_chars_avg": (
        "SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars FROM documents"
    ),
    "summary_by_lang": (
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars "
        "FROM documents GROUP BY lang"
    ),
    "docs_topk_chars": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 20"
    ),
    "events_topk_value": (
        "SELECT event_id, event_type, value FROM events "
        "ORDER BY value DESC, event_id LIMIT 50"
    ),
    "events_topk_weighted": (
        "WITH w(event_type, weight) AS (VALUES ('view', 1), ('click', 2), "
        "('purchase', 10), ('signup', 5), ('error', 0)) "
        "SELECT e.event_id, e.event_type, "
        "CAST(round(e.value * 100) AS BIGINT) * w.weight AS weighted_cents "
        "FROM events e JOIN w ON e.event_type = w.event_type "
        "ORDER BY weighted_cents DESC, e.event_id LIMIT 20"
    ),
    "docs_page2": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 20 OFFSET 20"
    ),
    "docs_sample_mod": (
        "SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 = 0"
    ),
    "docs_filter": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE n_chars >= 300 AND lang = 'en'"
    ),
    "dedup_exact": (
        "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, "
        "count(*) AS n_copies FROM documents GROUP BY md5(text)"
    ),
    # normalization mirrored operation-for-operation: ASCII-ws collapse
    # (the [ \t\r\n]+ class reads the same in RE2 and Python re), space
    # trim, lowercase, THEN md5
    "norm_exact_dedup": (
        "WITH n AS (SELECT doc_id, lower(trim(regexp_replace("
        "text, '[ \\t\\r\\n]+', ' ', 'g'), ' ')) AS norm FROM documents) "
        "SELECT md5(norm) AS text_hash, min(doc_id) AS doc_id, "
        "count(*) AS n_copies FROM n GROUP BY md5(norm)"
    ),
    "crawl_diff": (
        "WITH b AS ("
        "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' [updated]' "
        "ELSE text END AS text FROM documents WHERE doc_id % 11 <> 0 "
        "UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, "
        "'new page ' || CAST(doc_id AS VARCHAR) AS text "
        "FROM documents WHERE doc_id % 13 = 0) "
        "SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM ("
        "SELECT CASE WHEN a.doc_id IS NULL THEN 'added' "
        "WHEN b.doc_id IS NULL THEN 'removed' "
        "WHEN a.text = b.text THEN 'unchanged' "
        "ELSE 'changed' END AS status "
        "FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id) "
        "GROUP BY status"
    ),
    "word_count": (
        "SELECT doc_id, CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' "
        "THEN 0 ELSE len(string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words "
        "FROM documents"
    ),
    "events_by_type": (
        "SELECT event_type, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents, "
        "count(*) AS n_events FROM events GROUP BY event_type"
    ),
    "events_value_stats": (
        "SELECT min(value) AS min_value, max(value) AS max_value, "
        "count(*) AS n_events FROM events"
    ),
    "distinct_sources": (
        "SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM documents"
    ),
    "orders_by_month": (
        "SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, "
        "count(*) AS n_orders FROM orders GROUP BY 1"
    ),
    "customer_order_counts": (
        "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c_custkey"
    ),
    "revenue_by_nation": (
        "SELECT n_name, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, "
        "count(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n_name"
    ),
    "brands_having": (
        "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts FROM part "
        "GROUP BY p_brand HAVING count(*) > 5"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
        "count(*) AS n, sum(l_quantity) / count(*) AS avg_qty "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "revenue_by_segment": (
        "SELECT c_mktsegment, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS total_revenue_cents, count(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c_mktsegment"
    ),
    "revenue_by_priority": (
        "SELECT o_orderpriority, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, "
        "count(*) AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o_orderpriority"
    ),
    "user_sessions": (
        "WITH x AS (SELECT user_id, event_id, ts, "
        "CAST(round(value * 100) AS BIGINT) AS cents, "
        "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
        "> INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events), "
        "y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM x) "
        "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, "
        "count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS value_cents "
        "FROM y GROUP BY user_id, sid"
    ),
    "events_asof_orders": (
        "SELECT e.event_id, e.user_id, max(o.o_orderdate) AS last_order_date, "
        "count(o.o_orderdate) AS n_prior_orders "
        "FROM events e LEFT JOIN orders o "
        "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts "
        "GROUP BY e.event_id, e.user_id"
    ),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS hour, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents, "
        "count(*) AS n_events FROM events GROUP BY 1"
    ),
    "quality_scores": (
        "SELECT doc_id, length(text) AS n_chars_text, "
        "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(len(list_filter(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'), "
        "x -> lower(x) IN ('the','a','and','of','to','in','is','on','for','with'))) AS DOUBLE) / n_words END AS stopword_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / n_words END AS mean_word_len "
        "FROM documents"
    ),
    "token_counts": (
        "SELECT doc_id, "
        "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_ws_tokens, "
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens "
        "FROM documents"
    ),
    "embedding_knn": (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
        "SELECT e.vec_id FROM embeddings e, q "
        "ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id LIMIT 10"
    ),
    "embedding_near_dups": (
        "SELECT a.vec_id AS a, b.vec_id AS b "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
    ),
    "embedding_near_dups_lsh": (
        "SELECT a.vec_id AS a, b.vec_id AS b "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
    ),
    "customers_lapsed": (
        "SELECT c_custkey, c_name FROM customer c LEFT JOIN "
        "(SELECT DISTINCT o_custkey FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1999-01-01') o "
        "ON o.o_custkey = c.c_custkey WHERE o.o_custkey IS NULL"
    ),
    "top_events_per_user": (
        "SELECT user_id, event_id, value FROM ("
        "SELECT user_id, event_id, value, row_number() OVER ("
        "PARTITION BY user_id ORDER BY value DESC, event_id) AS rn "
        "FROM events) WHERE rn <= 3"
    ),
    "user_running_value": (
        "SELECT event_id, user_id, ts, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents FROM events"
    ),
    "user_interarrival": (
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, "
        "CAST(sum(gap_us) AS BIGINT) AS sum_gap_us, "
        "CAST(max(gap_us) AS BIGINT) AS max_gap_us FROM ("
        "SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events) "
        "WHERE gap_us IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "events_value_band_join": (
        "WITH bands(band, lo, hi) AS (VALUES "
        "('micro', 0, 1000), ('small', 1000, 5000), "
        "('medium', 5000, 20000), ('large', 20000, 100000)) "
        "SELECT b.band, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents "
        "FROM events e JOIN bands b "
        "ON CAST(round(e.value * 100) AS BIGINT) >= b.lo "
        "AND CAST(round(e.value * 100) AS BIGINT) < b.hi "
        "GROUP BY b.band ORDER BY b.band"
    ),
    "dup_ngrams_topk": (
        "WITH toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS w FROM documents), "
        "pos AS (SELECT doc_id, w, "
        "unnest(generate_series(1, greatest(len(w)-7, 0))) AS i FROM toks), "
        "grams AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g "
        "FROM pos), "
        "agg AS (SELECT g, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_occ FROM grams GROUP BY g "
        "HAVING count(DISTINCT doc_id) >= 2) "
        "SELECT g, n_docs, n_occ FROM agg "
        "ORDER BY n_docs DESC, n_occ DESC, g LIMIT 100"
    ),
    "doc_dup_ngram_coverage": (
        "WITH toks AS (SELECT doc_id, "
        "regexp_split_to_array(trim(text), '\\s+') AS w FROM documents), "
        "pos AS (SELECT doc_id, w, "
        "unnest(generate_series(1, greatest(len(w)-7, 0))) AS i FROM toks), "
        "grams AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g "
        "FROM pos), "
        "dup AS (SELECT g FROM grams GROUP BY g "
        "HAVING count(DISTINCT doc_id) >= 2) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_dup, "
        "CAST(sum(CASE WHEN g IN (SELECT g FROM dup) THEN 1 ELSE 0 END) "
        "AS DOUBLE) / count(*) AS dup_coverage "
        "FROM grams GROUP BY doc_id ORDER BY doc_id"
    ),
    "events_type_percentiles": (
        "SELECT event_type, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS p90_cents, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    "events_value_percentiles": (
        "SELECT quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS p90_cents, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS p99_cents, "
        "count(*) AS n_events FROM events"
    ),
    "orders_status_pivot": (
        "SELECT CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_fulfilled, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending "
        "FROM orders"
    ),
    "events_value_tiers": (
        "SELECT CASE WHEN value < 25 THEN 't0_low' WHEN value < 50 THEN 't1_mid' "
        "WHEN value < 100 THEN 't2_high' ELSE 't3_top' END AS tier, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents, "
        "count(*) AS n_events FROM events GROUP BY 1"
    ),
    "repeat_customers": (
        "WITH y AS (SELECT o_custkey, "
        "max(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS a, "
        "max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS b "
        "FROM orders GROUP BY o_custkey) "
        "SELECT CAST(count(*) FILTER (WHERE a = 1 AND b = 1) AS BIGINT) AS n_both, "
        "CAST(count(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS n_only_1995, "
        "CAST(count(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS n_only_1996 "
        "FROM y"
    ),
    "top_words": (
        "SELECT w, count(*) AS n FROM (SELECT unnest(string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w "
        "FROM documents) WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20"
    ),
    "word_diversity": (
        "WITH s AS (SELECT doc_id, "
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "w AS (SELECT doc_id, CASE WHEN st = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(st, '\\s+') END AS ws FROM s) "
        "SELECT doc_id, len(ws) AS n_words, "
        "len(list_distinct(ws)) AS n_distinct_words, "
        "CASE WHEN len(ws) = 0 THEN 0.0 ELSE "
        "CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END AS distinct_ratio "
        "FROM w"
    ),
    "user_event_gaps": (
        "SELECT event_id, user_id, date_diff('microseconds', "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) "
        "AS gap_us FROM events"
    ),
    "events_hopping_2h": (
        "SELECT window_start, CAST(sum(cents) AS BIGINT) AS total_value_cents, "
        "count(*) AS n_events FROM ("
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
        "UNION ALL "
        "SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP), "
        "CAST(round(value * 100) AS BIGINT) FROM events"
        ") GROUP BY window_start"
    ),
    "building_orders": (
        "SELECT CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_mktsegment = 'BUILDING'"
    ),
    "doc_top_terms": (
        "WITH words AS (SELECT doc_id, unnest(string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS w "
        "FROM documents), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM words WHERE w <> '' "
        "GROUP BY doc_id, w), "
        "df AS (SELECT w, count(*) AS df FROM "
        "(SELECT DISTINCT doc_id, w FROM words WHERE w <> '') GROUP BY w), "
        "ranked AS (SELECT doc_id, tf.w AS w, tf, df, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY tf DESC, tf.w) AS rn "
        "FROM tf JOIN df USING (w)) "
        "SELECT doc_id, w, tf, df FROM ranked WHERE rn <= 5"
    ),
    "value_p50_by_type": (
        "SELECT event_type, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents, "
        "count(*) AS n_events FROM events GROUP BY event_type"
    ),
    "props_value_by_type": (
        "SELECT event_type, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum, "
        "count(*) AS n_events FROM events GROUP BY event_type"
    ),
    "text_normalize": (
        "SELECT doc_id, length(nfc_normalize(trim(regexp_replace("
        "text, '\\s+', ' ', 'g')))) AS n_chars_norm FROM documents"
    ),
    "domain_quota": (
        "SELECT doc_id, source, n_chars FROM ("
        "SELECT doc_id, source, n_chars, "
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn "
        "FROM documents) WHERE rn <= 10 ORDER BY doc_id"
    ),
    "top_bigrams": (
        "WITH w AS (SELECT doc_id, unnest(ws) AS w, "
        "generate_subscripts(ws, 1) AS pos FROM ("
        "SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents)) "
        "SELECT a.w || ' ' || b.w AS bg, count(*) AS n "
        "FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "WHERE a.w <> '' AND b.w <> '' "
        "GROUP BY 1 ORDER BY n DESC, bg LIMIT 20"
    ),
    "source_profiles": (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    "decontaminate": (
        "WITH g AS (SELECT doc_id, "
        "array_to_string(ws[p : p + 3], ' ') AS gram FROM ("
        "SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 3, 0))) "
        "AS p, ws FROM (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents))), "
        "tg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 47 = 0), "
        "tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 47 <> 0) "
        "SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared "
        "FROM tr JOIN tg USING (gram) GROUP BY tr.doc_id ORDER BY tr.doc_id"
    ),
    "events_error_rate_daily": (
        # date_trunc('day'/'month') returns DATE in DuckDB; the engine keeps
        # the column a timestamp (pc.floor_temporal) -> cast the oracle
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) "
        "AS n_errors, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) "
        "/ CAST(count(*) AS BIGINT) AS error_rate "
        "FROM events GROUP BY date_trunc('day', ts) ORDER BY day"
    ),
    "doc_length_zscore": (
        # mirror the engine's two-pass standardizer term-for-term in DOUBLE
        "WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(n_chars) AS BIGINT) AS sx, "
        "CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx FROM documents) "
        "SELECT doc_id, (CAST(n_chars AS DOUBLE) "
        "- CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) "
        "/ sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS z_len "
        "FROM documents, m ORDER BY doc_id"
    ),
    "orders_monthly_growth": (
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents FROM orders GROUP BY date_trunc('month', o_orderdate)) "
        "SELECT CAST(month AS TIMESTAMP) AS month, revenue_cents, "
        "CAST(coalesce(revenue_cents - lag(revenue_cents) "
        "OVER (ORDER BY month), 0) AS BIGINT) AS delta_cents "
        "FROM m ORDER BY month"
    ),
    "events_value_7day_ma": (
        "WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents "
        "FROM events GROUP BY 1) "
        "SELECT day, day_cents, "
        "CAST(sum(day_cents) OVER w AS DOUBLE) "
        "/ CAST(count(*) OVER w AS DOUBLE) AS ma7_cents "
        "FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING "
        "AND CURRENT ROW) ORDER BY day"
    ),
    "user_last_event": (
        "SELECT user_id, ts, value AS last_value FROM ("
        "SELECT user_id, ts, value, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM events) WHERE rn = 1 ORDER BY user_id"
    ),
    "user_event_pairs_1h": (
        "SELECT e1.user_id, CAST(count(*) AS BIGINT) AS n_pairs "
        "FROM events e1 JOIN events e2 USING (user_id) "
        "WHERE e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR "
        "AND (e2.ts > e1.ts OR e2.event_id > e1.event_id) "
        "GROUP BY e1.user_id ORDER BY e1.user_id"
    ),
    "local_supplier_revenue": (
        "SELECT n.n_name AS nation, "
        "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM customer c, orders o, lineitem l, supplier s, nation n "
        "WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey "
        "AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
        "AND s.s_nationkey = n.n_nationkey "
        "AND o.o_orderdate >= TIMESTAMP '1995-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-01-01' "
        "GROUP BY n.n_name ORDER BY revenue_cents DESC, nation"
    ),
    "events_value_percentiles_cont": (
        "SELECT quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p25_cents, "
        "quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents, "
        "quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p75_cents, "
        "count(*) AS n_events FROM events"
    ),
    "promo_revenue_share": (
        "WITH x AS (SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) "
        "* 100) AS BIGINT) AS cents, p.p_type = 'PROMO' AS is_promo "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1996-02-01') "
        "SELECT CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT) "
        "AS promo_cents, CAST(sum(cents) AS BIGINT) AS total_cents, "
        "CAST(sum(CASE WHEN is_promo THEN cents ELSE 0 END) AS DOUBLE) "
        "/ CAST(sum(cents) AS DOUBLE) AS promo_share FROM x"
    ),
    "top_supplier_revenue": (
        "WITH rev AS (SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice "
        "* (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s.s_suppkey, s.s_name, r.total_cents AS total_revenue_cents "
        "FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey "
        "WHERE r.total_cents = (SELECT max(total_cents) FROM rev) "
        "ORDER BY s.s_suppkey"
    ),
    "nation_pair_volume": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
        "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM supplier s, lineitem l, orders o, customer c, "
        "nation n1, nation n2 "
        "WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey "
        "AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey "
        "AND c.c_nationkey = n2.n_nationkey "
        "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l.l_shipdate >= TIMESTAMP '1995-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    ),
    "region_market_share": (
        "WITH x AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
        "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) "
        "AS cents, s.s_nationkey = 2 AS is_target "
        "FROM lineitem l, orders o, customer c, supplier s, nation n, region r "
        "WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey "
        "AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = n.n_nationkey "
        "AND n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA' "
        "AND o.o_orderdate >= TIMESTAMP '1995-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01') "
        "SELECT o_year, "
        "CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END) AS BIGINT) "
        "AS target_cents, CAST(sum(cents) AS BIGINT) AS total_cents, "
        "CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END) AS DOUBLE) "
        "/ CAST(sum(cents) AS DOUBLE) AS mkt_share "
        "FROM x GROUP BY o_year ORDER BY o_year"
    ),
    "token_familiarity": (
        "WITH s AS (SELECT doc_id, "
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "w AS (SELECT doc_id, unnest(string_split_regex(st, '\\s+')) AS w "
        "FROM s WHERE st <> ''), "
        "c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w) "
        "SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(c.c) AS BIGINT) AS familiarity_sum, "
        "CAST(sum(c.c) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
        "AS avg_familiarity "
        "FROM w JOIN c USING (w) GROUP BY w.doc_id ORDER BY w.doc_id"
    ),
    "value_p50_by_type_cont": (
        "SELECT event_type, "
        "quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_cents "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    "set_similarity_join": (
        "WITH w AS (SELECT DISTINCT doc_id, w FROM ("
        "SELECT doc_id, unnest(string_split_regex(regexp_replace(text, "
        "'^\\s+|\\s+$', '', 'g'), '\\s+')) AS w FROM documents) "
        "WHERE w <> ''), "
        "sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM w "
        "GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS a, b.doc_id AS b, "
        "CAST(count(*) AS BIGINT) AS i FROM w a JOIN w b "
        "ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT a, b FROM inter "
        "JOIN sz sa ON inter.a = sa.doc_id JOIN sz sb ON inter.b = sb.doc_id "
        "WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5e0 "
        "ORDER BY a, b"
    ),
    "source_vocab_overlap": (
        "WITH s AS (SELECT source, "
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "sw AS (SELECT DISTINCT source, w FROM ("
        "SELECT source, unnest(string_split_regex(st, '\\s+')) AS w "
        "FROM s WHERE st <> '')), "
        "sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sw "
        "GROUP BY source), "
        "inter AS (SELECT a.source AS sa, b.source AS sb, "
        "CAST(count(*) AS BIGINT) AS i FROM sw a JOIN sw b "
        "ON a.w = b.w AND a.source < b.source GROUP BY 1, 2) "
        "SELECT sa, sb, i, za.n AS n_a, zb.n AS n_b, "
        "CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard "
        "FROM inter JOIN sz za ON inter.sa = za.source "
        "JOIN sz zb ON inter.sb = zb.source ORDER BY sa, sb"
    ),
    "customer_best_order": (
        "SELECT o_custkey, o_orderkey, best_cents FROM ("
        "SELECT o_custkey, o_orderkey, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS best_cents, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY "
        "CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn "
        "FROM orders) WHERE rn = 1 ORDER BY o_custkey"
    ),
    "orders_yoy_growth": (
        "WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, "
        "CAST(month(o_orderdate) AS BIGINT) AS m, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents FROM orders GROUP BY 1, 2), "
        "l AS (SELECT y, m, cents, lag(cents) OVER ("
        "PARTITION BY m ORDER BY y) AS prev FROM m) "
        "SELECT y, m, cents, CAST(prev AS BIGINT) AS prev_year_cents, "
        "CAST(cents - prev AS BIGINT) AS yoy_delta_cents "
        "FROM l WHERE prev IS NOT NULL ORDER BY y, m"
    ),
    "events_value_stddev_by_type": (
        "WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT) "
        "* CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2 "
        "FROM events GROUP BY event_type) "
        "SELECT event_type, n, "
        "sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) "
        "- CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0))) "
        "AS stddev_cents FROM m ORDER BY event_type"
    ),
    "orders_quarterly": (
        "SELECT CAST(year(o_orderdate) AS BIGINT) AS y, "
        "CAST(quarter(o_orderdate) AS BIGINT) AS quarter, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "part_size_histogram": (
        "SELECT CAST(p_size AS BIGINT) AS p_size, "
        "CAST(count(*) AS BIGINT) AS n FROM part "
        "GROUP BY p_size ORDER BY p_size"
    ),
    "events_burst_days_robust": (
        "WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "s AS (SELECT quantile_cont(CAST(n AS DOUBLE), 0.5) AS med FROM d), "
        "m AS (SELECT quantile_cont(abs(CAST(d.n AS DOUBLE) - s.med), 0.5) "
        "AS mad FROM d, s) "
        "SELECT day, n, (CAST(n AS DOUBLE) - s.med) / (1.4826e0 * m.mad) "
        "AS robust_z FROM d, s, m "
        "WHERE (CAST(n AS DOUBLE) - s.med) / (1.4826e0 * m.mad) > 2.0e0 "
        "ORDER BY day"
    ),
    "events_burst_days": (
        "WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS nn, "
        "CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2 "
        "FROM d) "
        "SELECT day, n, "
        "(CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "/ sqrt(CAST(s2 AS DOUBLE) / CAST(nn AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "* (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE))) AS z "
        "FROM d, s WHERE (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) "
        "/ CAST(nn AS DOUBLE)) / sqrt(CAST(s2 AS DOUBLE) / CAST(nn AS DOUBLE) "
        "- (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE)) "
        "* (CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE))) > 2.0e0 "
        "ORDER BY day"
    ),
    "doc_readability": (
        "SELECT doc_id, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) "
        "AS n_words_alpha, "
        "CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) "
        "AS n_sentences, "
        "CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS BIGINT) "
        "AS n_syllable_groups, "
        "CASE WHEN len(regexp_extract_all(text, '[A-Za-z]+')) = 0 THEN 0.0 "
        "ELSE 206.835e0 - 1.015e0 * "
        "(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE) "
        "/ CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) "
        "AS DOUBLE)) "
        "- 84.6e0 * "
        "(CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS DOUBLE) "
        "/ CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)) END "
        "AS flesch "
        "FROM documents ORDER BY doc_id"
    ),
    "value_trend_by_type": (
        "WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(epoch_us(ts) // 86400000000) AS BIGINT) AS sx, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy, "
        "CAST(sum((epoch_us(ts) // 86400000000) "
        "* CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxy, "
        "CAST(sum((epoch_us(ts) // 86400000000) "
        "* (epoch_us(ts) // 86400000000)) AS BIGINT) AS sxx "
        "FROM events GROUP BY event_type) "
        "SELECT event_type, n, "
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents_per_day "
        "FROM m ORDER BY event_type"
    ),
    "user_value_cume_dist": (
        "SELECT event_id, user_id, cume_dist() OVER ("
        "PARTITION BY user_id ORDER BY value) AS cd "
        "FROM events ORDER BY event_id"
    ),
    "forecast_revenue": (
        "SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents, "
        "CAST(count(*) AS BIGINT) AS n_lineitems FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount >= 0.05e0 AND l_discount <= 0.07e0 "
        "AND l_quantity < 24e0"
    ),
    "priority_returned_orders": (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n "
        "FROM orders o WHERE o.o_orderdate >= TIMESTAMP '1995-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "doc_simpson_diversity": (
        "WITH s AS (SELECT doc_id, "
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS st FROM documents), "
        "w AS (SELECT doc_id, unnest(string_split_regex(st, '\\s+')) AS w "
        "FROM s WHERE st <> ''), "
        "c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt FROM w "
        "GROUP BY doc_id, w), "
        "m AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words, "
        "CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS rep_pairs FROM c "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(m.n_words, 0) AS n_words, "
        "coalesce(m.rep_pairs, 0) AS rep_pairs, "
        "CASE WHEN coalesce(m.n_words, 0) > 1 THEN "
        "CAST(m.rep_pairs AS DOUBLE) "
        "/ CAST(m.n_words * (m.n_words - 1) AS DOUBLE) ELSE 0.0 END "
        "AS simpson "
        "FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id "
        "ORDER BY d.doc_id"
    ),
    "event_type_transitions": (
        "WITH p AS (SELECT event_type AS to_type, lag(event_type) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS from_type "
        "FROM events) "
        "SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM p "
        "WHERE from_type IS NOT NULL "
        "GROUP BY from_type, to_type ORDER BY from_type, to_type"
    ),
    "customer_top_decile_share": (
        "WITH r AS (SELECT o_custkey, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents FROM orders GROUP BY o_custkey), "
        "t AS (SELECT CAST(sum(cents) AS BIGINT) AS total, "
        "CAST(count(*) AS BIGINT) AS n FROM r), "
        "k AS (SELECT CAST(ceil(0.1e0 * n) AS BIGINT) AS kk FROM t), "
        "top AS (SELECT cents FROM r ORDER BY cents DESC, o_custkey "
        "LIMIT (SELECT kk FROM k)) "
        "SELECT (SELECT kk FROM k) AS n_top, t.n AS n_customers, "
        "(SELECT CAST(sum(cents) AS BIGINT) FROM top) AS top_cents, "
        "CAST((SELECT CAST(sum(cents) AS BIGINT) FROM top) AS DOUBLE) "
        "/ CAST(t.total AS DOUBLE) AS revenue_share FROM t"
    ),
    "user_gap_percentiles": (
        "WITH g AS (SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s "
        "FROM events) "
        "SELECT quantile_disc(gap_s, 0.5) AS p50_gap_s, "
        "quantile_disc(gap_s, 0.9) AS p90_gap_s, "
        "quantile_disc(gap_s, 0.99) AS p99_gap_s, "
        "CAST(count(gap_s) AS BIGINT) AS n_gaps FROM g "
        "WHERE gap_s IS NOT NULL"
    ),
    "text_partition_skew": (
        "WITH b AS (SELECT substr(md5(text), 1, 2) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1), "
        "s AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
        "CAST(min(n) AS BIGINT) AS min_n, CAST(max(n) AS BIGINT) AS max_n, "
        "CAST(sum(n) AS BIGINT) AS total FROM b) "
        "SELECT n_buckets, min_n, max_n, "
        "CAST(total AS DOUBLE) / CAST(n_buckets AS DOUBLE) AS avg_n, "
        "CAST(max_n AS DOUBLE) / (CAST(total AS DOUBLE) "
        "/ CAST(n_buckets AS DOUBLE)) AS skew_ratio FROM s"
    ),
    "events_dow_hour_heatmap": (
        "SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, "
        "CAST(hour(ts) AS BIGINT) AS hour, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "customer_rfm": (
        "SELECT o_custkey, max(o_orderdate) AS last_order, "
        "CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS total_cents FROM orders GROUP BY o_custkey ORDER BY o_custkey"
    ),
    "events_value_ewma": (
        "WITH RECURSIVE d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) "
        "AS day, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
        "AS day_cents, row_number() OVER (ORDER BY "
        "CAST(date_trunc('day', ts) AS TIMESTAMP)) AS rn "
        "FROM events GROUP BY 1), "
        "e AS (SELECT rn, day, day_cents, CAST(day_cents AS DOUBLE) AS "
        "ewma_cents FROM d WHERE rn = 1 "
        "UNION ALL SELECT d.rn, d.day, d.day_cents, "
        "0.3e0 * CAST(d.day_cents AS DOUBLE) + 0.7e0 * e.ewma_cents "
        "FROM d JOIN e ON d.rn = e.rn + 1) "
        "SELECT day, day_cents, ewma_cents FROM e ORDER BY day"
    ),
    "events_value_7day_median": (
        "WITH d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents "
        "FROM events GROUP BY 1) "
        "SELECT day, day_cents, median(day_cents) OVER w AS med7_cents "
        "FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING "
        "AND CURRENT ROW) ORDER BY day"
    ),
    "new_users_daily": (
        "SELECT day, CAST(count(*) AS BIGINT) AS n_new_users FROM ("
        "SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day "
        "FROM events GROUP BY user_id) GROUP BY day ORDER BY day"
    ),
    "revenue_share_by_nation": (
        "WITH r AS (SELECT n_name, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n_name) "
        "SELECT n_name, revenue_cents, CAST(revenue_cents AS DOUBLE) "
        "/ CAST((SELECT CAST(sum(revenue_cents) AS BIGINT) FROM r) AS DOUBLE) "
        "AS revenue_share FROM r ORDER BY n_name"
    ),
    "events_value_ntile": (
        "SELECT event_id, ntile(4) OVER (ORDER BY "
        "CAST(round(value * 100) AS BIGINT), event_id) AS quartile "
        "FROM events ORDER BY event_id"
    ),
    "doc_metrics_unpivot": (
        "WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
        "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(string_split_regex(regexp_replace(text, "
        "'^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words FROM documents) "
        "SELECT doc_id, 'n_chars' AS metric, n_chars AS v FROM m "
        "UNION ALL SELECT doc_id, 'n_words' AS metric, "
        "CAST(n_words AS BIGINT) AS v FROM m ORDER BY doc_id, metric"
    ),
    "char_class_profile": (
        "SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars_text, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha, "
        "CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit, "
        "CAST(len(regexp_extract_all(text, '[ \\t\\n\\r\\f]')) AS BIGINT) "
        "AS n_space, "
        "CAST(len(text) - len(regexp_extract_all(text, '[A-Za-z]')) "
        "- len(regexp_extract_all(text, '[0-9]')) "
        "- len(regexp_extract_all(text, '[ \\t\\n\\r\\f]')) AS BIGINT) "
        "AS n_other, "
        "CASE WHEN len(text) = 0 THEN 0.0 ELSE "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) "
        "/ CAST(len(text) AS DOUBLE) END AS alpha_ratio "
        "FROM documents ORDER BY doc_id"
    ),
    "bigram_pmi": (
        "WITH w AS (SELECT doc_id, unnest(ws) AS w, "
        "generate_subscripts(ws, 1) AS pos FROM ("
        "SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents)), "
        "u AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w "
        "WHERE w <> '' GROUP BY w), "
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM u), "
        "bg AS (SELECT a.w AS wa, b.w AS wb, a.w || ' ' || b.w AS bg, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "WHERE a.w <> '' AND b.w <> '' GROUP BY 1, 2, 3), "
        "bt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM bg), "
        "top AS (SELECT * FROM bg ORDER BY n DESC, bg LIMIT 20) "
        "SELECT top.bg, top.n AS n_bigram, ua.c AS n_a, ub.c AS n_b, "
        "ln((CAST(top.n AS DOUBLE) / bt.total) / "
        "((CAST(ua.c AS DOUBLE) / t.total) * (CAST(ub.c AS DOUBLE) / t.total))) "
        "AS pmi "
        "FROM top, bt, t, u ua, u ub WHERE ua.w = top.wa AND ub.w = top.wb "
        "ORDER BY n_bigram DESC, bg"
    ),
    "events_value_winsorized": (
        "WITH b AS (SELECT "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.05) AS lo, "
        "quantile_disc(CAST(round(value * 100) AS BIGINT), 0.95) AS hi "
        "FROM events) "
        "SELECT event_type, "
        "CAST(sum(least(greatest(CAST(round(value * 100) AS BIGINT), b.lo), "
        "b.hi)) AS BIGINT) AS winsorized_cents, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM events, b GROUP BY event_type ORDER BY event_type"
    ),
    "corr_value_props": (
        # mirror the engine's exact-moment formula term-for-term in DOUBLE
        # (DuckDB's corr() uses a different incremental algorithm -> not
        # bit-comparable; this expression IS)
        "WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "sum(CAST(round(value * 100) AS BIGINT)) AS sx, "
        "sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sy, "
        "sum(CAST(round(value * 100) AS BIGINT) "
        "* CAST(json_extract(props, '$.k') AS BIGINT)) AS sxy, "
        "sum(CAST(round(value * 100) AS BIGINT) "
        "* CAST(round(value * 100) AS BIGINT)) AS sxx, "
        "sum(CAST(json_extract(props, '$.k') AS BIGINT) "
        "* CAST(json_extract(props, '$.k') AS BIGINT)) AS syy FROM events) "
        "SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) "
        "/ (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
        "* sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_value_k, "
        "n AS n_events FROM m"
    ),
    "events_value_mad": (
        "WITH c AS (SELECT event_type, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
        "med AS (SELECT event_type, CAST(quantile_disc(cents, 0.5) AS BIGINT) "
        "AS median_cents FROM c GROUP BY event_type) "
        "SELECT c.event_type, any_value(med.median_cents) AS median_cents, "
        "CAST(quantile_disc(abs(c.cents - med.median_cents), 0.5) AS BIGINT) "
        "AS mad_cents FROM c JOIN med USING (event_type) "
        "GROUP BY c.event_type ORDER BY c.event_type"
    ),
    "user_top_event_type": (
        "WITH g AS (SELECT user_id, event_type, count(*) AS n FROM events "
        "GROUP BY user_id, event_type), "
        "r AS (SELECT user_id, event_type, n, row_number() OVER ("
        "PARTITION BY user_id ORDER BY n DESC, event_type) AS rn FROM g) "
        "SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS "
        "n_events FROM r WHERE rn = 1 ORDER BY user_id"
    ),
    "bloom_semi_join": (
        f"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, "
        f"CAST(sum(l_quantity) AS BIGINT) AS total_qty FROM lineitem "
        f"WHERE l_partkey IN (SELECT p_partkey FROM part "
        f"WHERE p_size >= {BIG_PART_SIZE}) "
        f"GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "nation_cust_supp": (
        "SELECT n.n_name, CAST(coalesce(c.n, 0) AS BIGINT) AS n_customers, "
        "CAST(coalesce(s.n, 0) AS BIGINT) AS n_suppliers FROM nation n "
        "LEFT JOIN (SELECT c_nationkey, count(*) AS n FROM customer "
        "GROUP BY c_nationkey) c ON n.n_nationkey = c.c_nationkey "
        "LEFT JOIN (SELECT s_nationkey, count(*) AS n FROM supplier "
        "GROUP BY s_nationkey) s ON n.n_nationkey = s.s_nationkey "
        "ORDER BY n.n_name"
    ),
    "brand_weighted_price": (
        "SELECT p_brand, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
        "* CAST(l_quantity AS BIGINT)) AS BIGINT) "
        "/ CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) "
        "AS wavg_price_cents, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "GROUP BY p_brand ORDER BY p_brand"
    ),
    "pii_scrub": (
        f"SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) "
        f"+ len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_pii, "
        f"regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g') AS text_clean "
        f"FROM documents ORDER BY doc_id"
    ),
    "stratified_sample": (
        f"SELECT doc_id, lang FROM ("
        f"SELECT doc_id, lang, row_number() OVER (PARTITION BY lang "
        f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
        f"FROM documents) WHERE rn <= {STRAT_K} ORDER BY lang, doc_id"
    ),
    "orders_cube": (
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)"
    ),
    "nation_customer_names": (
        f"WITH r AS (SELECT n.n_name, c.c_name, row_number() OVER ("
        f"PARTITION BY n.n_name ORDER BY c.c_name, c.c_custkey) AS rn "
        f"FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey) "
        f"SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers, "
        f"string_agg(CASE WHEN rn <= {NAME_AGG_K} THEN c_name END, ',' "
        f"ORDER BY c_name) AS sample_names "
        f"FROM r GROUP BY n_name ORDER BY n_name"
    ),
    "orders_above_cust_avg": (
        "WITH a AS (SELECT o_custkey, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s, "
        "count(*) AS n FROM orders GROUP BY o_custkey) "
        "SELECT o.o_orderkey, o.o_custkey FROM orders o "
        "JOIN a USING (o_custkey) "
        "WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * a.n > a.s "
        "ORDER BY o.o_orderkey"
    ),
    "big_orders_report": (
        "WITH q AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS "
        "total_qty FROM lineitem GROUP BY l_orderkey "
        "HAVING sum(l_quantity) > 250) "
        "SELECT o.o_orderkey, o.o_custkey, "
        "CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents, "
        "q.total_qty FROM orders o JOIN q ON o.o_orderkey = q.l_orderkey "
        "ORDER BY q.total_qty DESC, o.o_orderkey LIMIT 20"
    ),
    "returned_revenue_topk": (
        "SELECT c.c_custkey, c.c_name, n.n_name, "
        "CAST(sum(CAST(round(l_extendedprice * (1e0 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name, n.n_name "
        "ORDER BY revenue_cents DESC, c.c_custkey LIMIT 20"
    ),
    "funnel_conversion": (
        "WITH s AS (SELECT user_id, "
        "min(CASE WHEN event_type = 'view' THEN ts END) AS first_view, "
        "max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase "
        "FROM events GROUP BY user_id) "
        "SELECT CAST(count(first_view) AS BIGINT) AS n_viewers, "
        "CAST(count(CASE WHEN last_purchase > first_view THEN 1 END) "
        "AS BIGINT) AS n_converted FROM s"
    ),
    "shipping_priority": (
        "SELECT l_orderkey, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents, o_orderdate, o_orderpriority "
        "FROM customer, orders, lineitem "
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
        "AND l_orderkey = o_orderkey "
        "AND o_orderdate < TIMESTAMP '1995-03-15' "
        "AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
    ),
    "repetition_ratio": (
        "WITH g AS (SELECT doc_id, "
        "array_to_string(ws[p : p + 2], ' ') AS gram FROM ("
        "SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 2, 0))) "
        "AS p, ws FROM (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents))), "
        "s AS (SELECT doc_id, count(*) AS n_grams, "
        "count(DISTINCT gram) AS n_distinct_grams FROM g GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams, "
        "CAST(coalesce(s.n_distinct_grams, 0) AS BIGINT) AS n_distinct_grams, "
        "CASE WHEN coalesce(s.n_grams, 0) = 0 THEN 0.0 ELSE "
        "CAST(s.n_grams - s.n_distinct_grams AS DOUBLE) / s.n_grams END "
        "AS dup_ratio FROM documents d LEFT JOIN s USING (doc_id)"
    ),
    "lang_rebalance": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE doc_id % (CASE WHEN lang = 'en' THEN 2 ELSE 5 END) = 0"
    ),
    "events_hourly_users": (
        "SELECT date_trunc('hour', ts) AS hour, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1"
    ),
    "dup_rate_by_source": (
        "SELECT source, count(*) AS n_docs, "
        "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts, "
        "CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*) "
        "AS dup_rate FROM documents GROUP BY source ORDER BY source"
    ),
    "docs_above_p90": (
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > "
        "(SELECT quantile_disc(n_chars, 0.9) FROM documents) ORDER BY doc_id"
    ),
    "user_value_rank": (
        "SELECT event_id, user_id, value, CAST(dense_rank() OVER ("
        "PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS value_rank "
        "FROM events"
    ),
    "events_after_cursor": (
        "SELECT event_id, ts, user_id FROM events "
        "WHERE (ts, event_id) > (TIMESTAMP '2024-01-15 12:00:00', 0) "
        "ORDER BY ts, event_id LIMIT 50"
    ),
    "value_histogram": (
        "SELECT CAST(floor(value / 10) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1"
    ),
    "orders_rollup": (
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
    ),
    "segment_dedup": (
        "WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w, "
        "unnest(range(len(string_split(text, ' ')))) AS ord FROM documents), "
        "segs AS (SELECT doc_id, ord // 10 AS pos, "
        "string_agg(w, ' ' ORDER BY ord) AS seg FROM words "
        "GROUP BY doc_id, ord // 10), "
        "ranked AS (SELECT doc_id, pos, seg, row_number() OVER "
        "(PARTITION BY seg ORDER BY doc_id, pos) AS rn FROM segs) "
        "SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text "
        "FROM ranked WHERE rn = 1 GROUP BY doc_id"
    ),
    "doc_chunks": (
        "WITH c AS (SELECT doc_id, text, unnest(range(CAST(ceil("
        "length(text) / 200.0) AS BIGINT))) AS chunk_id FROM documents) "
        "SELECT doc_id, chunk_id, substr(text, CAST(chunk_id * 200 + 1 AS INT)"
        ", 200) AS chunk FROM c"
    ),
    # sliding-window overlap chunking: same windows as the Ray side
    # (size 200, stride 150; every doc emits chunk 0, empty text included).
    "doc_chunks_overlap": (
        "WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents), "
        "k AS (SELECT doc_id, text, unnest(range(CASE WHEN n <= 200 THEN 1 "
        "ELSE CAST(ceil((n - 200) / 150.0) AS BIGINT) + 1 END)) AS chunk_id "
        "FROM c) SELECT doc_id, chunk_id, "
        "substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk FROM k"
    ),
    "weighted_sample": (
        "SELECT doc_id, ln((CAST(('0x' || substr(md5(text), 1, 8)) "
        "AS BIGINT) + 1) / 4294967296e0) / n_chars AS priority "
        "FROM documents ORDER BY priority DESC, doc_id LIMIT 20"
    ),
    "bm25_topk": (
        # float expressions mirror the Ray side's op order exactly:
        # idf*(tf*(1.2+1))/(tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl)), terms
        # summed left-to-right; DuckDB ln() == libm log (verified bitwise)
        "WITH tf AS (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS dl, "
        "CAST(len(list_filter(string_split(text, ' '), x -> x = 'merge')) "
        "AS BIGINT) AS tf_merge, "
        "CAST(len(list_filter(string_split(text, ' '), x -> x = 'join')) "
        "AS BIGINT) AS tf_join, "
        "CAST(len(list_filter(string_split(text, ' '), x -> x = 'window')) "
        "AS BIGINT) AS tf_window FROM documents), "
        "st AS (SELECT count(*) AS n, "
        "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, "
        "CAST(sum(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS df_merge, "
        "CAST(sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS df_join, "
        "CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS df_window FROM tf) "
        "SELECT doc_id, "
        "ln(1 + (n - df_merge + 0.5e0) / (df_merge + 0.5e0)) * "
        "(tf_merge * (1.2e0 + 1)) / "
        "(tf_merge + 1.2e0 * (1 - 0.75e0 + 0.75e0 * dl / avgdl)) + "
        "ln(1 + (n - df_join + 0.5e0) / (df_join + 0.5e0)) * "
        "(tf_join * (1.2e0 + 1)) / "
        "(tf_join + 1.2e0 * (1 - 0.75e0 + 0.75e0 * dl / avgdl)) + "
        "ln(1 + (n - df_window + 0.5e0) / (df_window + 0.5e0)) * "
        "(tf_window * (1.2e0 + 1)) / "
        "(tf_window + 1.2e0 * (1 - 0.75e0 + 0.75e0 * dl / avgdl)) AS score "
        "FROM tf, st ORDER BY score DESC, doc_id LIMIT 10"
    ),
    "cohort_retention": (
        "WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week "
        "FROM events), coh AS (SELECT user_id, min(week) AS cohort_week "
        "FROM uw GROUP BY user_id) "
        "SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week, "
        "CAST(u.week AS TIMESTAMP) AS activity_week, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM uw u JOIN coh c USING (user_id) GROUP BY 1, 2"
    ),
    "user_value_pct_rank": (
        "SELECT event_id, user_id, percent_rank() OVER "
        "(PARTITION BY user_id ORDER BY value DESC) AS pct FROM events"
    ),
    "train_val_split": (
        "SELECT doc_id, CASE WHEN b < 80 THEN 'train' "
        "WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM "
        "(SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) "
        "% 100 AS b FROM documents)"
    ),
    "sequence_pack": (
        "WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) "
        "AS BIGINT) AS tokens FROM documents), "
        "r AS (SELECT doc_id, tokens, sum(tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM t) "
        "SELECT doc_id, tokens, "
        "CAST(run - tokens AS BIGINT) // 512 AS pack_id FROM r"
    ),
    # external validation of the dedup family's brute-force ground truth:
    # word-3-gram Jaccard in pure SQL (gram STRINGS; the Ray side's crc32
    # shingle ids are collision-free on this subset, verified by equality)
    "ngram_jaccard_pairs": (
        "WITH w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents WHERE doc_id < 200), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2) "
        "SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3 ORDER BY a, b"
    ),
    # winnow family, externally pinned (round-4 verdict item 2): verified
    # shared-run pairs == pairs sharing a >= 23-char substring == pairs
    # sharing a char 23-gram; brute-force as a substr self-join on the
    # same bounded subset the Ray side reads.
    "shared_run_pairs": (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200), "
        "g AS (SELECT DISTINCT doc_id, substr(text, p, 23) AS gram FROM "
        "(SELECT doc_id, text, unnest(generate_series(1, "
        "greatest(length(text) - 22, 0))) AS p FROM d)), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, "
        "CAST(count(*) AS BIGINT) AS n_shared_grams "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2) "
        "SELECT a, b, n_shared_grams FROM inter ORDER BY a, b"
    ),
    # MinHash-LSH + exact-Jaccard verify, externally pinned: the verified
    # pair set equals the full brute-force word-3-gram Jaccard >= 0.5
    # truth on this corpus (LSH recall is exactly 1 here — every true
    # pair's similarity is far above the 32x4-band miss region; pinned
    # deterministically at sf0.001 and sf0.01 by the local sweep, and the
    # planted-dup unit tests cover the algorithmic path independently).
    "minhash_near_dups": (
        "WITH w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2) "
        "SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5 ORDER BY a, b"
    ),
    # full near-dup clustering (MinHash-LSH -> verify -> components ->
    # per-doc assignment): the verified pair set equals brute-force
    # 3-gram Jaccard >= 0.5 (see minhash_near_dups), so the cluster
    # assignment is the recursive closure's labels left-joined onto the
    # corpus, singletons their own canonical
    "near_dup_clusters": (
        "WITH RECURSIVE w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2), "
        "pairs AS (SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
        "e AS (SELECT a AS u, b AS v FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "r AS (SELECT u, v FROM e "
        "UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u), "
        "lab AS (SELECT u AS doc_id, least(u, min(v)) AS cid "
        "FROM r GROUP BY u) "
        "SELECT d.doc_id, "
        "CAST(coalesce(l.cid, d.doc_id) AS BIGINT) AS cluster_id, "
        "CAST(CASE WHEN coalesce(l.cid, d.doc_id) = d.doc_id "
        "THEN 1 ELSE 0 END AS BIGINT) AS is_canonical "
        "FROM documents d LEFT JOIN lab l USING (doc_id) ORDER BY d.doc_id"
    ),
    # END-TO-END curation verdict (exact dedup + near-dup + quality floor
    # with reason precedence): exact_dup from a min-per-md5 window,
    # near-dup membership from the recursive closure over brute-force
    # Jaccard >= 0.5 pairs (== the MinHash pipeline's verified set, see
    # minhash_near_dups), quality mirrored term-for-term from
    # quality_score (round_even == Python's banker's round)
    "curation": (
        "WITH RECURSIVE w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2), "
        "pairs AS (SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
        "e AS (SELECT a AS u, b AS v FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "r AS (SELECT u, v FROM e "
        "UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u), "
        "lab AS (SELECT u AS doc_id, least(u, min(v)) AS cid "
        "FROM r GROUP BY u), "
        "ex AS (SELECT doc_id, CASE WHEN doc_id = "
        "min(doc_id) OVER (PARTITION BY md5(text)) THEN 0 ELSE 1 END "
        "AS exact_dup FROM documents), "
        "feat AS (SELECT doc_id, "
        "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(string_split_regex(regexp_replace("
        "text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', "
        "'g')) AS DOUBLE) / length(text) END AS alpha_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(len(list_filter(string_split_regex(regexp_replace("
        "text, '^\\s+|\\s+$', '', 'g'), '\\s+'), "
        "x -> lower(x) IN ('the','a','and','of','to','in','is','on','for',"
        "'with'))) AS DOUBLE) / n_words END AS stopword_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) "
        "/ n_words END AS mean_word_len FROM documents), "
        "qv AS (SELECT doc_id, round_even("
        "40.0 * alpha_ratio + 30.0 * least(1.0, stopword_ratio * 4.0) "
        "+ 20.0 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 "
        "THEN 1.0 ELSE 0.0 END) "
        "+ 10.0 * (CASE WHEN n_words >= 20 THEN 1.0 "
        "ELSE CAST(n_words AS DOUBLE) / 20.0 END), 4) AS q FROM feat) "
        "SELECT d.doc_id, "
        "CAST(CASE WHEN dr = '' THEN 1 ELSE 0 END AS BIGINT) AS keep, "
        "dr AS drop_reason, q AS quality FROM ("
        "SELECT ex.doc_id, qv.q, CASE WHEN ex.exact_dup = 1 "
        "THEN 'exact_dup' WHEN coalesce(l.cid, ex.doc_id) <> ex.doc_id "
        "THEN 'near_dup' WHEN qv.q < 30.0 THEN 'low_quality' ELSE '' END "
        "AS dr FROM ex JOIN qv ON qv.doc_id = ex.doc_id "
        "LEFT JOIN lab l ON l.doc_id = ex.doc_id) d ORDER BY d.doc_id"
    ),
    # extended (Gopher/FineWeb-style) chain: base curation plus the
    # high_repetition (distinct-word ratio < 0.2) and low_alpha
    # (alpha ratio < 0.4) floors, same precedence order as the Ray side
    "curation_extended": (
        "WITH RECURSIVE w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2), "
        "pairs AS (SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
        "e AS (SELECT a AS u, b AS v FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "r AS (SELECT u, v FROM e "
        "UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u), "
        "lab AS (SELECT u AS doc_id, least(u, min(v)) AS cid "
        "FROM r GROUP BY u), "
        "ex AS (SELECT doc_id, CASE WHEN doc_id = "
        "min(doc_id) OVER (PARTITION BY md5(text)) THEN 0 ELSE 1 END "
        "AS exact_dup FROM documents), "
        "feat AS (SELECT doc_id, "
        "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
        "ELSE len(string_split_regex(regexp_replace("
        "text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_words, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', "
        "'g')) AS DOUBLE) / length(text) END AS alpha_ratio, "
        "CASE WHEN n_words = 0 THEN 1.0 ELSE "
        "CAST(len(list_distinct(string_split_regex(regexp_replace("
        "text, '^\\s+|\\s+$', '', 'g'), '\\s+'))) AS DOUBLE) / n_words END "
        "AS distinct_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(len(list_filter(string_split_regex(regexp_replace("
        "text, '^\\s+|\\s+$', '', 'g'), '\\s+'), "
        "x -> lower(x) IN ('the','a','and','of','to','in','is','on','for',"
        "'with'))) AS DOUBLE) / n_words END AS stopword_ratio, "
        "CASE WHEN n_words = 0 THEN 0.0 ELSE "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) "
        "/ n_words END AS mean_word_len FROM documents), "
        "qv AS (SELECT doc_id, alpha_ratio, distinct_ratio, round_even("
        "40.0 * alpha_ratio + 30.0 * least(1.0, stopword_ratio * 4.0) "
        "+ 20.0 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 "
        "THEN 1.0 ELSE 0.0 END) "
        "+ 10.0 * (CASE WHEN n_words >= 20 THEN 1.0 "
        "ELSE CAST(n_words AS DOUBLE) / 20.0 END), 4) AS q FROM feat) "
        "SELECT d.doc_id, "
        "CAST(CASE WHEN dr = '' THEN 1 ELSE 0 END AS BIGINT) AS keep, "
        "dr AS drop_reason, q AS quality FROM ("
        "SELECT ex.doc_id, qv.q, CASE WHEN ex.exact_dup = 1 "
        "THEN 'exact_dup' WHEN coalesce(l.cid, ex.doc_id) <> ex.doc_id "
        "THEN 'near_dup' WHEN qv.q < 30.0 THEN 'low_quality' "
        "WHEN qv.distinct_ratio < 0.2 THEN 'high_repetition' "
        "WHEN qv.alpha_ratio < 0.4 THEN 'low_alpha' ELSE '' END "
        "AS dr FROM ex JOIN qv ON qv.doc_id = ex.doc_id "
        "LEFT JOIN lab l ON l.doc_id = ex.doc_id) d ORDER BY d.doc_id"
    ),
    # connected components over the same brute-force pair set, as a
    # recursive transitive closure: r reaches every component member from
    # every start node (symmetric edge list; UNION dedups, so cycles
    # terminate), canonical = least(self, min reachable)
    "jaccard_clusters": (
        "WITH RECURSIVE w AS (SELECT doc_id, string_split_regex("
        "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS ws "
        "FROM documents WHERE doc_id < 200), "
        "g0 AS (SELECT doc_id, array_to_string(ws[p : p + 2], ' ') AS gram "
        "FROM (SELECT doc_id, unnest(generate_series(1, "
        "greatest(len(ws) - 2, 0))) AS p, ws FROM w)), "
        "gf AS (SELECT doc_id, array_to_string(ws, ' ') AS gram FROM w "
        "WHERE len(ws) < 3 AND array_to_string(ws, ' ') <> ''), "
        "g AS (SELECT DISTINCT doc_id, gram FROM "
        "(SELECT * FROM g0 UNION ALL SELECT * FROM gf)), "
        "s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id), "
        "inter AS (SELECT g1.doc_id AS a, g2.doc_id AS b, count(*) AS i "
        "FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id "
        "GROUP BY 1, 2), "
        "pairs AS (SELECT a, b FROM inter "
        "JOIN s sa ON sa.doc_id = a JOIN s sb ON sb.doc_id = b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
        "e AS (SELECT a AS u, b AS v FROM pairs "
        "UNION ALL SELECT b, a FROM pairs), "
        "r AS (SELECT u, v FROM e "
        "UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u) "
        "SELECT u AS doc_id, CAST(least(u, min(v)) AS BIGINT) AS canonical "
        "FROM r GROUP BY u ORDER BY doc_id"
    ),
    # TPC-H Q22 shape: above-average balance as an exact integer
    # cross-multiplication (cents * n > sum_cents, no float average), NOT
    # EXISTS vs URGENT orders, per-nation rollup.
    "rich_idle_customers": (
        "WITH c AS (SELECT c_custkey, c_nationkey, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_acctbal "
        "FROM customer), "
        "st AS (SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n "
        "FROM c WHERE c_acctbal > 0.0), "
        "rich AS (SELECT c.* FROM c, st WHERE cents * n > s), "
        "idle AS (SELECT r.* FROM rich r WHERE NOT EXISTS ("
        "SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey "
        "AND o.o_orderpriority = '1-URGENT')) "
        "SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust, "
        "CAST(sum(cents) AS BIGINT) AS bal_cents "
        "FROM idle JOIN nation ON n_nationkey = c_nationkey "
        "GROUP BY n_name ORDER BY nation"
    ),
    # TPC-H Q13 shape: zero-order customers included via LEFT OUTER JOIN.
    "customer_distribution": (
        "SELECT n_orders, CAST(count(*) AS BIGINT) AS n_cust FROM ("
        "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders "
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey) GROUP BY n_orders ORDER BY n_orders"
    ),
    # TPC-H Q17 shape: below-0.2*avg quantity test as the exact integer
    # cross-multiplication qty * 5 * n < sum_qty (no float average).
    "small_qty_part_revenue": (
        "WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'), "
        "l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qc, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS ec "
        "FROM lineitem JOIN pk ON l_partkey = p_partkey), "
        "a AS (SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS sq, "
        "count(*) AS n FROM l GROUP BY l_partkey) "
        "SELECT CAST(sum(ec) AS BIGINT) AS revenue_cents, "
        "CAST(count(*) AS BIGINT) AS n_items "
        "FROM l JOIN a USING (l_partkey) WHERE qc * 5 * n < sq"
    ),
    # TPC-H Q4 shape: EXISTS == per-orderkey MAX(l_shipdate) fold + join.
    "slow_orders_by_priority": (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders "
        "FROM orders WHERE EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 90 DAY) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    # TPC-H Q16 shape: distinct suppliers per (brand, size) via lineitem.
    "brand_supplier_counts": (
        "SELECT p_brand, p_size, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY p_brand, p_size ORDER BY p_brand, p_size"
    ),
    # triangle count over the co-order part graph (canonical a<b<c, each
    # triangle counted exactly once).
    "part_triangles": (
        "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b "
        "FROM pp p1 JOIN pp p2 ON p1.l_orderkey = p2.l_orderkey "
        "AND p1.l_partkey < p2.l_partkey) "
        "SELECT CAST(count(*) AS BIGINT) AS n_triangles "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    ),
    # same oracle for the degree-ordered O(m^1.5) plan — identical count.
    "part_triangles_ordered": (
        "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b "
        "FROM pp p1 JOIN pp p2 ON p1.l_orderkey = p2.l_orderkey "
        "AND p1.l_partkey < p2.l_partkey) "
        "SELECT CAST(count(*) AS BIGINT) AS n_triangles "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    ),
    # local clustering coefficient: exact int triangle/degree folds, ONE
    # mirrored division (2*t / (d*(d-1))) so the double hashes bit-equal.
    "part_clustering_coeff": (
        "WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT DISTINCT p1.l_partkey AS a, p2.l_partkey AS b "
        "FROM pp p1 JOIN pp p2 ON p1.l_orderkey = p2.l_orderkey "
        "AND p1.l_partkey < p2.l_partkey), "
        "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), "
        "tn AS (SELECT node, count(*) AS n_tri FROM ("
        "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri) GROUP BY node), "
        "dn AS (SELECT node, count(*) AS deg FROM ("
        "SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node) "
        "SELECT dn.node, CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_tri, "
        "CAST(dn.deg AS BIGINT) AS deg, "
        "CASE WHEN dn.deg >= 2 THEN CAST(2 * coalesce(tn.n_tri, 0) "
        "AS DOUBLE) / (dn.deg * (dn.deg - 1)) ELSE 0.0 END AS coeff "
        "FROM dn LEFT JOIN tn USING (node) ORDER BY dn.node"
    ),
    # TPC-H Q6 shape: all predicates scan-side; exact 1e-4-dollar units.
    "discounted_revenue": (
        "SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4, "
        "CAST(count(*) AS BIGINT) AS n_items FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
        "AND l_quantity < 24"
    ),
    # TPC-H Q19 shape: OR-of-ANDs across both sides, exact integer revenue.
    "disjunctive_revenue": (
        "SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
        "AS revenue_c4, CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE "
        "(p_type = 'PROMO' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 1 AND 20) OR "
        "(p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30 "
        "AND l_quantity BETWEEN 10 AND 35) OR "
        "(p_type = 'LARGE' AND p_size BETWEEN 20 AND 50 "
        "AND l_quantity BETWEEN 20 AND 50)"
    ),
    # TPC-H Q21 shape: double-quantified EXISTS / NOT EXISTS per order.
    "suppliers_kept_waiting": (
        "WITH ls AS ("
        "  SELECT l_orderkey, l_suppkey, "
        "         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
        "             THEN 1 ELSE 0 END) AS late "
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "  GROUP BY l_orderkey, l_suppkey), "
        "st AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late "
        "       FROM ls GROUP BY l_orderkey) "
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM ls JOIN st USING (l_orderkey) "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE ls.late = 1 AND st.n_supp >= 2 AND st.n_late = 1 "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25"
    ),
    # gaps-and-islands: longest consecutive-day streak per user.
    "user_streaks": (
        "WITH days AS (SELECT DISTINCT user_id, "
        "  CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d "
        "  FROM events), "
        "r AS (SELECT user_id, d, d - ROW_NUMBER() OVER "
        "      (PARTITION BY user_id ORDER BY d) AS isl FROM days), "
        "runs AS (SELECT user_id, isl, COUNT(*) AS len FROM r "
        "         GROUP BY user_id, isl) "
        "SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days, "
        "CAST(MAX(len) AS BIGINT) AS longest_streak "
        "FROM runs GROUP BY user_id ORDER BY user_id"
    ),
    # skyline / Pareto frontier via NOT EXISTS dominance.
    "part_skyline": (
        "SELECT p_partkey, p_size, p_retailprice FROM part p "
        "WHERE NOT EXISTS (SELECT 1 FROM part q "
        "  WHERE q.p_size <= p.p_size "
        "    AND q.p_retailprice >= p.p_retailprice "
        "    AND (q.p_size < p.p_size "
        "         OR q.p_retailprice > p.p_retailprice)) "
        "ORDER BY p_partkey"
    ),
    # brute-force Levenshtein self-join over the distinct vocabulary.
    "name_edit_pairs": (
        "SELECT a.p_name AS name_a, b.p_name AS name_b "
        "FROM (SELECT DISTINCT p_name FROM part) a, "
        "     (SELECT DISTINCT p_name FROM part) b "
        "WHERE a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 1 "
        "ORDER BY 1, 2"
    ),
    # sliding-window exact COUNT DISTINCT (trailing 7 days, anchored on
    # days present in the data).
    "rolling_distinct_users": (
        "WITH ud AS (SELECT DISTINCT user_id, "
        "  CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d "
        "  FROM events), "
        "days AS (SELECT DISTINCT d FROM ud) "
        "SELECT days.d AS day, "
        "CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS users_7d "
        "FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d "
        "GROUP BY days.d ORDER BY day"
    ),
    # variable-duration interval overlap join: concurrent session pairs,
    # counted once at the later start, grouped by its day.
    "session_overlap_pairs": (
        "WITH x AS (SELECT user_id, ts, "
        "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
        "  > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events), "
        "y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "  ROWS UNBOUNDED PRECEDING) AS sid FROM x), "
        "s AS (SELECT user_id, min(ts) AS st, max(ts) AS en FROM y "
        "  GROUP BY user_id, sid) "
        "SELECT CAST(epoch(date_trunc('day', greatest(a.st, b.st))) "
        "  AS BIGINT) // 86400 AS day, CAST(COUNT(*) AS BIGINT) AS n_pairs "
        "FROM s a JOIN s b ON a.user_id < b.user_id "
        "  AND a.st <= b.en AND b.st <= a.en "
        "GROUP BY day ORDER BY day"
    ),
    # sweep line: peak concurrent 15-min intervals per day (RANGE-frame
    # running sum over ±1 endpoint deltas in (t, d) order).
    "peak_concurrency": (
        "WITH ep AS ("
        "  SELECT ts AS t, 1 AS d FROM events "
        "  UNION ALL "
        "  SELECT ts + INTERVAL 15 MINUTE AS t, -1 AS d FROM events), "
        "r AS (SELECT t, d, SUM(d) OVER (ORDER BY t, d) AS c FROM ep) "
        "SELECT CAST(epoch(date_trunc('day', t)) AS BIGINT) // 86400 AS day, "
        "CAST(MAX(c) AS BIGINT) AS peak "
        "FROM r GROUP BY day ORDER BY day"
    ),
    # TPC-H Q11 shape: group aggregate vs a correlated global threshold.
    "important_parts": (
        "WITH pq AS (SELECT l_partkey, "
        "  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty "
        "  FROM lineitem GROUP BY l_partkey), "
        "tot AS (SELECT SUM(qty) AS t, COUNT(*) AS np FROM pq) "
        "SELECT l_partkey, qty FROM pq, tot "
        "WHERE qty * 2 * np > 3 * t ORDER BY l_partkey"
    ),
    # INTERSECT / EXCEPT via per-key boolean flag folds.
    "part_year_flags": (
        "WITH f AS (SELECT l_partkey, "
        "  MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS y1, "
        "  MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS y2 "
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "  WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "    AND o_orderdate < TIMESTAMP '1998-01-01' "
        "  GROUP BY l_partkey) "
        "SELECT CAST(SUM(y1 * y2) AS BIGINT) AS n_both, "
        "CAST(SUM(y1 * (1 - y2)) AS BIGINT) AS n_only_1996, "
        "CAST(SUM((1 - y1) * y2) AS BIGINT) AS n_only_1997 FROM f"
    ),
    # not SQL-expressible -> rows-only checks recorded by the driver:
    #   extract_flagship, pages_sniff_counts (synthetic binary payloads +
    #   OCR), lang_id (n-gram profile scoring), fingerprints (winnowing
    #   rolling hash), simhash_signatures (signature algorithm),
    #   approx_distinct_custkeys (approximate by design — accuracy pinned
    #   against the exact count in tests/test_sketch.py).
    #   minhash_near_dups GAINED a full-corpus SQL oracle in round 5 (its
    #   verified-pair set equals brute-force 3-gram Jaccard >= 0.5 here);
    #   the winnow family is externally pinned via shared_run_pairs.
}
