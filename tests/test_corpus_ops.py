"""Edge cases for the vectorized corpus-curation kernels in
pipelines/queries.py: n-gram/bigram explode framing, quota partials,
repetition stats.  Pure-pandas unit tests (no Ray session needed) — the
end-to-end values are covered by the oracle gate in test_queries.py."""
import numpy as np
import pandas as pd

from ocr_main_ray.pipelines.queries import (
    DECON_NGRAM,
    _bigram_partial,
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
