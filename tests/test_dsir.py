"""DSIR importance-weighting kernels: hashed-BoW counts, smoothing,
per-doc log-weight segmentation — all pure (no Ray) except the end-to-end
dataset test."""
import numpy as np
import pandas as pd
import pytest

from ocr_main_ray.functions.dsir import (DSIR_NBINS, dsir_count_batch,
                                         dsir_score_batch, fold_counts,
                                         log_ratio)


def _frame():
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "lang": ["en", "en", "de", "de"],
        "text": ["alpha alpha beta", "alpha gamma", "delta delta epsilon",
                 "delta zeta"],
    })


def test_counts_partition_target_vs_raw():
    b = _frame()
    parts = dsir_count_batch(b, (b["lang"] == "en").to_numpy())
    folded = fold_counts(parts)
    # target slice has 5 words, raw has all 10
    assert folded["target"].sum() == 5
    assert folded["raw"].sum() == 10


def test_fold_counts_accumulates_across_batches():
    b = _frame()
    p1 = dsir_count_batch(b.iloc[:2], np.array([True, True]))
    p2 = dsir_count_batch(b.iloc[2:], np.array([False, False]))
    folded = fold_counts(pd.concat([p1, p2], ignore_index=True))
    assert folded["target"].sum() == 5
    assert folded["raw"].sum() == 10


def test_log_ratio_favors_target_heavy_words():
    b = _frame()
    folded = fold_counts(dsir_count_batch(b, (b["lang"] == "en").to_numpy()))
    ratio = log_ratio(folded["target"], folded["raw"])
    scored = dsir_score_batch(b.assign(), ratio)
    # en docs (built from target-only words) must outscore de docs
    assert scored.loc[scored.doc_id.isin([0, 1]), "log_weight"].min() > \
        scored.loc[scored.doc_id.isin([2, 3]), "log_weight"].max()


def test_score_batch_is_per_word_sum():
    ratio = np.zeros(DSIR_NBINS)
    import zlib
    h = zlib.crc32(b"alpha") % DSIR_NBINS
    ratio[h] = 2.5
    b = pd.DataFrame({"doc_id": [7], "text": ["alpha alpha other"]})
    out = dsir_score_batch(b, ratio)
    assert out.loc[0, "log_weight"] == pytest.approx(5.0)


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_end_to_end():
    import ray.data as rd
    import pyarrow as pa
    from ocr_main_ray.functions.dsir import dsir_weights

    b = _frame()
    ds = rd.from_arrow(pa.Table.from_pandas(b, preserve_index=False))
    out = dsir_weights(ds).to_pandas().sort_values("doc_id")
    assert len(out) == 4
    assert out.log_weight.iloc[0] > out.log_weight.iloc[2]
    # deterministic across runs
    out2 = dsir_weights(ds).to_pandas().sort_values("doc_id")
    assert np.array_equal(out.log_weight.to_numpy(),
                          out2.log_weight.to_numpy())
