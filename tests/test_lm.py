"""Bigram LM scoring: distributed == single-process reference bit-for-bit
(fixed-point micronat accumulation makes the float order irrelevant)."""
import pandas as pd
import pyarrow as pa


def test_bigram_lm_matches_reference(ray_session):
    import ray.data as rd

    from ocr_main_ray.functions.lm import (score_docs_bigram_lm,
                                           score_docs_reference)

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(100)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = score_docs_bigram_lm(ds)
    want = (score_docs_reference(list(docs.itertuples(index=False)))
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)  # dtype-strict, bit-exact


def test_bigram_lm_determinism(ray_session):
    import ray.data as rd

    from ocr_main_ray.functions.lm import score_docs_bigram_lm

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).head(60)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    a = score_docs_bigram_lm(ds)
    b = score_docs_bigram_lm(ds.repartition(7))  # different block layout
    pd.testing.assert_frame_equal(a, b)
