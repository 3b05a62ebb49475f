"""Corpus bigram language model + per-document log-probability scoring —
the KenLM-style quality signal web-corpus pipelines use ("how much does
this doc look like the corpus?"), built from two distributed counting
passes and one scoring join.

Determinism design: a float sum over a doc's bigrams is order-sensitive,
and distributed joins return rows in nondeterministic order.  Scores are
therefore accumulated in FIXED-POINT: each bigram contributes
``tf * round(ln(p) * 1e6)`` MICRONATS as an int64 — integer addition is
associative, so the per-doc sums are bitwise identical run to run no
matter how the join shuffles, and the single final division to nats is
the only float op.  (Same idiom as the integer-cents aggregates in
pipelines/queries.py.)

Model: add-one-smoothed bigram conditionals P(b|a) = (C(a,b)+1)/(C(a)+V)
over whitespace tokens, V = distinct unigram count.  Out-of-vocabulary
context words fall back to C(a)=0.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _doc_bigrams_block(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) -> per-doc (doc_id, bg, tf) bigram partials."""
    rows_doc, rows_bg, rows_tf = [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        ws = text.split()
        if len(ws) < 2:
            continue
        counts: dict[str, int] = {}
        for a, b in zip(ws[:-1], ws[1:]):
            k = a + " " + b
            counts[k] = counts.get(k, 0) + 1
        for k, n in counts.items():
            rows_doc.append(int(doc_id))
            rows_bg.append(k)
            rows_tf.append(n)
    return pd.DataFrame({"doc_id": pd.Series(rows_doc, dtype="int64"),
                         "bg": pd.Series(rows_bg, dtype=object),
                         "tf": pd.Series(rows_tf, dtype="int64")})


def score_docs_bigram_lm(docs_ds, *, route: str | None = None
                         ) -> pd.DataFrame:
    """(doc_id, text) Dataset -> per-doc (doc_id, n_bigrams,
    micronats, avg_logprob) via distributed counts + scoring join.

    Size-routed: when the unigram/bigram count tables fit the broadcast
    budget they ship once as sorted arrays and scoring is one map pass
    (no joins); past it the hash-join plan runs.  Both routes share the
    fixed-point micronat arithmetic, so results are bit-identical."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayops import fit_for_join

    _BCAST_MAX = 5_000_000

    def uni_partial(b: pd.DataFrame) -> pd.DataFrame:
        words = b["text"].str.split().explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"w": vc.index.to_numpy(dtype=object),
                             "pn": vc.to_numpy().astype("int64")})

    uni = (docs_ds.map_batches(uni_partial, batch_format="pandas")
           .groupby("w").aggregate(Sum("pn", alias_name="c")))
    vocab_size = uni.count()

    # materialized: consumed twice (bigram counts, then scoring) — without
    # this the Python-loop bigram explode runs two full passes
    doc_bg = docs_ds.map_batches(_doc_bigrams_block,
                                 batch_format="pandas").materialize()
    bg_counts = (doc_bg.map_batches(
        lambda t: t.select(["bg", "tf"]).group_by("bg")
        .aggregate([("tf", "sum")]).rename_columns(["bg", "cab"]),
        batch_format="pyarrow")
        .groupby("bg").aggregate(Sum("cab", alias_name="cab")))

    from ..config import cluster_cpus

    nbk = max(16, cluster_cpus() * 2)

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("dbk", pa.array(
            (t.column("doc_id").to_numpy() % nbk).astype(np.int32),
            pa.int32()))

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed integer fold (exact, order-independent): the
        # Dataset-level aggregate's accumulate is ~quadratic in
        # rows/block over the per-block doc partials entering here
        o = g.groupby("doc_id", as_index=False)[["p_mn", "p_n"]].sum()
        o["p_mn"] = o["p_mn"].astype("int64")
        o["p_n"] = o["p_n"].astype("int64")
        return o.rename(columns={"p_mn": "micronats", "p_n": "n_bigrams"})

    def finish(scored) -> pd.DataFrame:
        out = (scored.map_batches(add_doc_bucket, batch_format="pyarrow")
               .groupby("dbk").map_groups(doc_fold, batch_format="pandas")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        out["micronats"] = out["micronats"].astype("int64")
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        out["avg_logprob"] = (
            out["micronats"].to_numpy().astype(np.float64)
            / (1e6 * out["n_bigrams"].to_numpy().astype(np.float64)))
        return out[["doc_id", "n_bigrams", "micronats", "avg_logprob"]]

    if route is None:
        uni = uni.materialize()
        bg_counts = bg_counts.materialize()
        route = ("broadcast"
                 if int(vocab_size) + bg_counts.count() <= _BCAST_MAX
                 else "join")

    if route == "broadcast":
        uni_df = uni.to_pandas()
        bg_df = bg_counts.to_pandas()
        uo = np.argsort(uni_df["w"].to_numpy(object))
        bo = np.argsort(bg_df["bg"].to_numpy(object))
        ref = ray.put((uni_df["w"].to_numpy(object)[uo],
                       uni_df["c"].to_numpy(np.int64)[uo],
                       bg_df["bg"].to_numpy(object)[bo],
                       bg_df["cab"].to_numpy(np.int64)[bo]))
        V = int(vocab_size)

        class _ScoreBcast:
            def __init__(self):
                (self.uw, self.uc, self.bw, self.bc) = ray.get(ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                if not len(b):
                    return pd.DataFrame({
                        "doc_id": pd.Series([], dtype="int64"),
                        "p_mn": pd.Series([], dtype="int64"),
                        "p_n": pd.Series([], dtype="int64")})
                bgs = b["bg"].to_numpy(object)
                # every bigram/context of the corpus is in the corpus
                # count tables by construction — plain sorted lookups
                cab = self.bc[np.searchsorted(self.bw, bgs)]
                ctx = np.array([s.split(" ", 1)[0] for s in bgs],
                               dtype=object)
                ca = self.uc[np.searchsorted(self.uw, ctx)]
                tf = b["tf"].to_numpy(np.int64)
                lp = np.log((cab + 1.0) / (ca + float(V)))
                mn = np.floor(lp * 1e6 + 0.5).astype(np.int64) * tf
                g = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(np.int64),
                                  "p_mn": mn, "p_n": tf})
                o = g.groupby("doc_id", as_index=False).sum()
                o["p_mn"] = o["p_mn"].astype("int64")
                o["p_n"] = o["p_n"].astype("int64")
                return o

        return finish(doc_bg.map_batches(_ScoreBcast,
                                         batch_format="pandas",
                                         concurrency=(1, 8)))

    # decorate each doc bigram with C(a,b), then with C(a)
    bg_schema = pa.schema([("doc_id", pa.int64()), ("bg", pa.large_string()),
                           ("tf", pa.int64())])
    cab_schema = pa.schema([("bg", pa.large_string()), ("cab", pa.int64())])
    j1 = fit_for_join(doc_bg, bg_schema).join(
        fit_for_join(bg_counts, cab_schema), join_type="inner",
        num_partitions=4, on=("bg",), right_on=("bg",))

    def add_ctx(t: pa.Table) -> pa.Table:
        bgs = t.column("bg").to_pylist()
        ctx = [b.split(" ", 1)[0] for b in bgs]
        return t.append_column("w", pa.array(ctx, pa.large_string()))

    j1c = j1.map_batches(add_ctx, batch_format="pyarrow")
    ca_schema = pa.schema([("w", pa.large_string()), ("c", pa.int64())])
    j1c_schema = pa.schema([("doc_id", pa.int64()), ("bg", pa.large_string()),
                            ("tf", pa.int64()), ("cab", pa.int64()),
                            ("w", pa.large_string())])
    j2 = fit_for_join(j1c, j1c_schema).join(
        fit_for_join(uni, ca_schema), join_type="inner",
        num_partitions=4, on=("w",), right_on=("w",))

    V = int(vocab_size)

    def micronats(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy()
        cab = t.column("cab").to_numpy()
        ca = t.column("c").to_numpy()
        # round-half-away (np.round is half-even; match python round? use
        # floor(x+0.5) for a single fixed rule both in tests and here)
        lp = np.log((cab + 1.0) / (ca + float(V)))
        mn = np.floor(lp * 1e6 + 0.5).astype(np.int64) * tf
        g = (pa.table({"doc_id": t.column("doc_id"),
                       "mn": pa.array(mn, pa.int64()),
                       "n": t.column("tf")})
             .group_by("doc_id").aggregate([("mn", "sum"), ("n", "sum")]))
        return g.rename_columns(["doc_id", "p_mn", "p_n"])

    return finish(j2.map_batches(micronats, batch_format="pyarrow"))


def score_docs_reference(docs: list[tuple[int, str]]) -> pd.DataFrame:
    """Single-process reference: identical model, smoothing and
    fixed-point rule — outputs must match ``score_docs_bigram_lm``
    bit-for-bit."""
    uni: dict[str, int] = {}
    bg: dict[str, int] = {}
    for _id, text in docs:
        ws = text.split()
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws[:-1], ws[1:]):
            k = a + " " + b
            bg[k] = bg.get(k, 0) + 1
    V = len(uni)
    rows = []
    for doc_id, text in docs:
        ws = text.split()
        if len(ws) < 2:
            continue
        mn_total, n = 0, 0
        counts: dict[str, int] = {}
        for a, b in zip(ws[:-1], ws[1:]):
            k = a + " " + b
            counts[k] = counts.get(k, 0) + 1
        for k, tf in counts.items():
            a = k.split(" ", 1)[0]
            lp = math.log((bg[k] + 1.0) / (uni[a] + float(V)))
            mn_total += int(math.floor(lp * 1e6 + 0.5)) * tf
            n += tf
        rows.append((doc_id, n, mn_total, mn_total / (1e6 * n)))
    return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "micronats",
                                       "avg_logprob"])
