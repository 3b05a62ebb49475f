"""Distributed logistic regression: bit-determinism (ordered reduce),
bit-equality with the single-process mirror, and actual learning."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ocr_main_ray.functions.logreg import (logreg_fit, logreg_fit_reference,
                                           logreg_predict)


def _blocks(n_blocks=4, rows=50, seed=3):
    """Separable 2-feature data, id-ordered, one pa.Table per block."""
    rng = np.random.default_rng(seed)
    n = n_blocks * rows
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.int8)
    tables, ranges = [], []
    for b in range(n_blocks):
        s, e = b * rows, (b + 1) * rows
        tables.append(pa.table({
            "doc_id": pa.array(np.arange(s, e), pa.int64()),
            "f1": pa.array(X[s:e, 0]), "f2": pa.array(X[s:e, 1]),
            "y": pa.array(y[s:e], pa.int8())}))
        ranges.append((s, e))
    return X, y, tables, ranges


@pytest.mark.usefixtures("ray_session")
def test_fit_bit_equals_reference_mirror():
    X, y, tables, ranges = _blocks()
    ds = rd.from_arrow(tables)
    w, hist = logreg_fit(ds, ["f1", "f2"], "y", "doc_id", iters=25, lr=0.7)
    w_ref = logreg_fit_reference(X, y.astype(np.float64), ranges,
                                 iters=25, lr=0.7)
    assert np.array_equal(w, w_ref)          # bitwise, not allclose
    assert len(hist) == 25
    assert hist[-1] < hist[0]                # loss decreased


@pytest.mark.usefixtures("ray_session")
def test_fit_run_to_run_deterministic():
    _, _, tables, _ = _blocks(seed=11)
    w1, _ = logreg_fit(rd.from_arrow(tables), ["f1", "f2"], "y", "doc_id",
                       iters=10)
    w2, _ = logreg_fit(rd.from_arrow(tables), ["f1", "f2"], "y", "doc_id",
                       iters=10)
    assert np.array_equal(w1, w2)


@pytest.mark.usefixtures("ray_session")
def test_predict_learns_separable_data():
    _, y, tables, _ = _blocks(seed=5)
    ds = rd.from_arrow(tables)
    w, _ = logreg_fit(ds, ["f1", "f2"], "y", "doc_id", iters=60, lr=1.0)
    out = logreg_predict(ds, w, ["f1", "f2"]).to_pandas()
    acc = (out["pred"].to_numpy() == out["y"].to_numpy()).mean()
    assert acc >= 0.97
    assert out["prob"].between(0, 1).all()
    # threshold semantics
    assert ((out["prob"] >= 0.5) == (out["pred"] == 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_l2_shrinks_weights():
    _, _, tables, _ = _blocks(seed=9)
    ds = rd.from_arrow(tables)
    w0, _ = logreg_fit(ds, ["f1", "f2"], "y", "doc_id", iters=30, l2=0.0)
    w1, _ = logreg_fit(ds, ["f1", "f2"], "y", "doc_id", iters=30, l2=0.5)
    assert np.linalg.norm(w1) < np.linalg.norm(w0)


@pytest.mark.usefixtures("ray_session")
def test_feature_stats_ordered_fold():
    from ocr_main_ray.functions.logreg import feature_stats
    X, _, tables, _ = _blocks(seed=21)
    mu, sd = feature_stats(rd.from_arrow(tables), ["f1", "f2"], "doc_id")
    assert np.allclose(mu, X.mean(axis=0), atol=1e-12)
    assert np.allclose(sd, X.std(axis=0), atol=1e-12)
    mu2, sd2 = feature_stats(rd.from_arrow(tables), ["f1", "f2"], "doc_id")
    assert np.array_equal(mu, mu2) and np.array_equal(sd, sd2)  # bitwise
