"""Edge cases for the vectorized corpus-curation kernels in
pipelines/queries.py: n-gram/bigram explode framing, quota partials,
repetition stats.  Pure-pandas unit tests (no Ray session needed) — the
end-to-end values are covered by the oracle gate in test_queries.py."""
import numpy as np
import pandas as pd

from ocr_main_ray.pipelines.queries import (
    DECON_NGRAM,
    DUP_NGRAM_K,
    _bigram_partial,
    _gram_partials,
    _grams_frame,
    _grams_frame_all,
    _quota_partial,
    _repetition_batch,
)


def _docs_df(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                         "text": pd.Series(texts, dtype=object)})


def test_grams_frame_empty_and_short_docs():
    # empty text, whitespace-only, and docs shorter than n yield no grams
    out = _grams_frame(_docs_df(["", "   ", "a b c"]), n=DECON_NGRAM)
    assert out.empty
    assert list(out.columns) == ["doc_id", "gram"]


def test_grams_frame_no_cross_document_windows():
    # last words of doc 0 + first words of doc 1 must NOT form a gram
    out = _grams_frame(_docs_df(["a b c d", "e f g h"]), n=4)
    assert set(out["gram"]) == {"a b c d", "e f g h"}
    assert out["doc_id"].tolist() == [0, 1]


def test_grams_frame_distinct_vs_all():
    df = _docs_df(["x y x y x y"])  # grams: "x y x", "y x y" repeated
    dist = _grams_frame(df, n=3)
    full = _grams_frame_all(df, n=3)
    assert len(full) == 4  # 6 words -> 4 windows
    assert len(dist) == 2  # two distinct gram strings
    assert set(dist["gram"]) == set(full["gram"]) == {"x y x", "y x y"}


def test_grams_frame_leading_trailing_whitespace():
    out = _grams_frame(_docs_df(["  a b c d  "]), n=4)
    assert out["gram"].tolist() == ["a b c d"]


def test_gram_partials_planted_duplicates():
    # two docs sharing an exact 8-gram span, one unrelated short doc
    span = "one two three four five six seven eight"
    assert len(span.split()) == DUP_NGRAM_K
    out = _gram_partials(_docs_df([f"{span} tail", f"head {span}", "short"]))
    assert list(out.columns) == ["g", "doc_id", "occ"]
    hits = out[out["g"] == span]
    assert sorted(hits["doc_id"]) == [0, 1]
    assert (hits["occ"] == 1).all()
    # repeats inside one doc collapse to one row with occ = count
    rep = _gram_partials(_docs_df([" ".join(["w"] * (DUP_NGRAM_K + 2))]))
    assert rep["g"].tolist() == [" ".join(["w"] * DUP_NGRAM_K)]
    assert rep["occ"].tolist() == [3]


def test_gram_partials_empty_and_short():
    out = _gram_partials(_docs_df(["", "   ", "a b c"]))
    assert out.empty
    assert out["occ"].dtype == "int64" and out["doc_id"].dtype == "int64"


def test_bigram_partial_counts_and_boundaries():
    out = _bigram_partial(_docs_df(["a b a b", "b a"]))
    counts = dict(zip(out["bg"], out["pn"]))
    # doc0: "a b","b a","a b"; doc1: "b a" — never "b|doc0 b|doc1"
    assert counts == {"a b": 2, "b a": 2}
    assert out["pn"].dtype == np.int64


def test_bigram_partial_empty_inputs():
    assert _bigram_partial(_docs_df([])).empty
    assert _bigram_partial(_docs_df(["", "solo"])).empty


def test_quota_partial_keeps_k_lowest_per_source():
    df = pd.DataFrame({
        "doc_id": pd.Series(range(30), dtype="int64"),
        "source": ["s%d" % (i % 2) for i in range(30)],
        "n_chars": pd.Series([10] * 30, dtype="int64"),
    })
    out = _quota_partial(df)
    per = out.groupby("source")["doc_id"].apply(list).to_dict()
    assert per["s0"] == sorted(per["s0"]) and len(per["s0"]) == 10
    assert per["s0"][0] == 0 and per["s1"][0] == 1


def test_repetition_batch_ratio_values():
    out = _repetition_batch(_docs_df(["a b c a b c a b c", "a b c d", ""]))
    out = out.set_index("doc_id")
    # doc0: 7 windows of 3, distinct {"a b c","b c a","c a b"} -> (7-3)/7
    assert out.loc[0, "n_grams"] == 7
    assert out.loc[0, "n_distinct_grams"] == 3
    assert out.loc[0, "dup_ratio"] == (7 - 3) / 7
    # doc1: 2 windows, both distinct -> 0.0; doc2: no grams -> zeros
    assert out.loc[1, "dup_ratio"] == 0.0
    assert out.loc[2, "n_grams"] == 0 and out.loc[2, "dup_ratio"] == 0.0
    assert out["n_grams"].dtype == np.int64


# ---------------------------------------------------------------------------
# segment dedup / chunking / packing kernels (pure-pandas units)
# ---------------------------------------------------------------------------

def test_segment_batch_roundtrip_and_tail():
    import pyarrow as pa
    from ocr_main_ray.pipelines.queries import _segment_batch, SEG_WORDS

    words = [f"w{i}" for i in range(SEG_WORDS * 2 + 3)]  # ragged tail
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([" ".join(words)], pa.string())})
    segs = _segment_batch(t, num_buckets=8).to_pandas()
    assert list(segs["pos"]) == [0, 1, 2]
    assert " ".join(segs["seg"]) == " ".join(words)  # lossless resegmentation
    assert (segs["sbucket"] >= 0).all() and (segs["sbucket"] < 8).all()


def test_seg_keep_first_prefers_lowest_doc_then_pos():
    from ocr_main_ray.pipelines.queries import _seg_keep_first

    g = pd.DataFrame({"doc_id": [5, 2, 2], "pos": [0, 3, 1],
                      "seg": ["dup seg", "dup seg", "dup seg"],
                      "sbucket": [0, 0, 0]})
    out = _seg_keep_first(g, num_buckets=4)
    assert len(out) == 1
    assert out.iloc[0]["doc_id"] == 2 and out.iloc[0]["pos"] == 1


def test_chunk_batch_covers_text_exactly():
    from ocr_main_ray.pipelines.queries import CHUNK_CHARS, _chunk_batch

    txts = ["a" * (CHUNK_CHARS * 2 + 5), "b" * 3, "c" * CHUNK_CHARS]
    b = pd.DataFrame({"doc_id": [0, 1, 2], "text": txts})
    out = _chunk_batch(b)
    for d, tx in enumerate(txts):
        mine = out[out.doc_id == d].sort_values("chunk_id")
        assert "".join(mine["chunk"]) == tx          # lossless cover
        assert (mine["chunk"].str.len() <= CHUNK_CHARS).all()
        assert list(mine["chunk_id"]) == list(range(len(mine)))


def test_chunk_batch_empty_frame_typed():
    from ocr_main_ray.pipelines.queries import _chunk_batch

    out = _chunk_batch(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                     "text": pd.Series([], dtype="object")}))
    assert len(out) == 0
    assert out["doc_id"].dtype == "int64" and out["chunk_id"].dtype == "int64"


def test_split_batch_deterministic_and_dup_consistent():
    from ocr_main_ray.pipelines.queries import _split_batch

    b = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["xyz", "xyz", "other"]})
    out = _split_batch(b)
    # identical text -> identical split (the leakage-safety property)
    assert out.iloc[0]["split"] == out.iloc[1]["split"]
    assert list(out["split"]) == list(_split_batch(b)["split"])  # stable


def test_pct_rank_bucket_matches_sql_semantics():
    from ocr_main_ray.pipelines.queries import _pct_rank_bucket

    g = pd.DataFrame({"event_id": [0, 1, 2, 3, 4],
                      "user_id": [1, 1, 1, 2, 3],
                      "value": [10.0, 10.0, 5.0, 7.0, 7.0],
                      "ubucket": [0] * 5})
    out = _pct_rank_bucket(g).set_index("event_id")
    # user 1: two ties at rank 1 -> pct 0; value 5 at rank 3 -> (3-1)/(3-1)=1
    assert out.loc[0, "pct"] == 0.0 and out.loc[1, "pct"] == 0.0
    assert out.loc[2, "pct"] == 1.0
    # single-event users -> 0.0
    assert out.loc[3, "pct"] == 0.0 and out.loc[4, "pct"] == 0.0


def test_retention_bucket_counts_first_week_cohort():
    from ocr_main_ray.pipelines.queries import _retention_bucket

    ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-02 09:00",  # same week
                         "2024-01-08 12:00",                      # next week
                         "2024-01-08 15:00"])                     # user 2 joins wk2
    g = pd.DataFrame({"user_id": [1, 1, 1, 2], "ts": ts, "ubucket": [0] * 4})
    out = _retention_bucket(g).set_index(["cohort_week", "activity_week"])
    w1, w2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-08")
    assert out.loc[(w1, w1), "p_n"] == 1   # user 1 active in cohort week
    assert out.loc[(w1, w2), "p_n"] == 1   # user 1 retained into week 2
    assert out.loc[(w2, w2), "p_n"] == 1   # user 2's own cohort


def test_bm25_tf_counts_and_presence():
    from ocr_main_ray.pipelines.queries import BM25_TERMS, _bm25_tf

    b = pd.DataFrame({"doc_id": [0, 1],
                      "text": ["merge merge join other", "plain words only"]})
    out = _bm25_tf(b).set_index("doc_id")
    assert out.loc[0, "tf_merge"] == 2 and out.loc[0, "tf_join"] == 1
    assert out.loc[0, "tf_window"] == 0
    assert out.loc[1, [f"tf_{t}" for t in BM25_TERMS]].sum() == 0
    assert out.loc[0, "dl"] == 4 and out.loc[1, "dl"] == 3
    assert out.loc[0, "has_merge"] == 1 and out.loc[1, "has_merge"] == 0


def test_pii_scrub_redacts_planted_spans():
    import pyarrow as pa
    from ocr_main_ray.pipelines.queries import pii_scrub_batch

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "contact alice.smith+x@example.co.uk or call 555-867-5309 now",
            "reach me at 415 555 0133 and 212.555.0101 thanks",
            "no personal data here",
        ]),
    })
    out = pii_scrub_batch(t)
    clean = out.column("text_clean").to_pylist()
    npii = out.column("n_pii").to_pylist()
    assert clean[0] == "contact <EMAIL> or call <PHONE> now"
    assert npii[0] == 2
    assert clean[1] == "reach me at <PHONE> and <PHONE> thanks"
    assert npii[1] == 2
    assert clean[2] == "no personal data here" and npii[2] == 0


def test_funnel_partials_sentinel_semantics():
    import numpy as np
    import pyarrow as pa
    from ocr_main_ray.pipelines.queries import (
        _TS_MAX_SENT, _TS_MIN_SENT, _funnel_partials)

    ts = pa.array(np.array([100, 200, 50, 300], dtype="int64"),
                  pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": ts,
        "event_type": pa.array(["view", "purchase", "purchase", "view"]),
    })
    out = _funnel_partials(t).to_pandas().set_index("user_id")
    views = out[out["lp"] == _TS_MIN_SENT]
    purchases = out[out["fv"] == _TS_MAX_SENT]
    # user 1: viewed at 100, purchased at 200 (converted)
    assert views.loc[1, "fv"] == 100 and purchases.loc[1, "lp"] == 200
    # user 2: purchase at 50 BEFORE its view at 300 -> max purchase < min view
    assert views.loc[2, "fv"] == 300 and purchases.loc[2, "lp"] == 50
