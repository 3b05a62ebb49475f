"""HyperLogLog sketch: accuracy, mergeability, and the distributed query
against the exact distinct count."""
import numpy as np
import pyarrow as pa
import pytest

from ocr_main_ray.functions.sketch import (HLL_M, HLL_P, hll_estimate,
                                           hll_partial)

SF_DIR = "/root/testdata/sf0.001"


def _merge(tables):
    regs = np.zeros(HLL_M, dtype=np.int64)
    for t in tables:
        np.maximum.at(regs, t.column("reg").to_numpy(),
                      t.column("rho").to_numpy())
    nz = np.nonzero(regs)[0]
    return nz, regs[nz]


def test_accuracy_large():
    # 100k distinct keys; p=12 -> ~1.6% std err; allow 3 sigma
    keys = np.arange(100_000, dtype=np.int64) * 7919 + 13
    est = hll_estimate(*_merge([hll_partial(keys)]))
    assert abs(est - 100_000) / 100_000 < 0.05


def test_accuracy_small_linear_counting():
    keys = np.arange(150, dtype=np.int64)
    est = hll_estimate(*_merge([hll_partial(keys)]))
    assert abs(est - 150) / 150 < 0.02


def test_duplicates_do_not_inflate():
    keys = np.tile(np.arange(500, dtype=np.int64), 40)  # 20k rows, 500 distinct
    est = hll_estimate(*_merge([hll_partial(keys)]))
    assert abs(est - 500) / 500 < 0.05


def test_merge_equals_single_pass():
    keys = np.arange(50_000, dtype=np.int64) * 31 + 7
    whole = hll_estimate(*_merge([hll_partial(keys)]))
    parts = [hll_partial(c) for c in np.array_split(keys, 7)]
    merged = hll_estimate(*_merge(parts))
    assert merged == whole


def test_partial_is_bounded():
    t = hll_partial(np.arange(1_000_000, dtype=np.int64))
    assert t.num_rows <= HLL_M
    assert t.column("rho").to_numpy().min() >= 1
    assert t.column("rho").to_numpy().max() <= 64 - HLL_P + 1


@pytest.mark.usefixtures("ray_session")
def test_query_matches_exact_within_tolerance():
    import duckdb

    from ocr_main_ray.pipelines.queries import q_approx_distinct_custkeys

    exact = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()[0]
    approx = q_approx_distinct_custkeys(SF_DIR).column(
        "approx_n_custkeys")[0].as_py()
    assert abs(approx - exact) / exact < 0.05
