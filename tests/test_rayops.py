"""Regression tests for ocr_main_ray.rayops — Ray 2.49 empty-block diseases.

Round-2 flake: with enough CPUs the input splits into blocks small enough
that some shingle/aggregate outputs are EMPTY; Ray then passes those blocks
through map_batches/rename_columns without running the UDF (emitting
zero-column or stale-schema blocks), and any such block on a join side
crashes HashShuffleAggregator.finalize with ArrowInvalid.  These tests
engineer the empty blocks directly so the shape reproduces at any CPU count.
"""
import pyarrow as pa
import pytest

from ocr_main_ray.rayops import concat_batches, fit_for_join


def _dirty_ds():
    """Dataset with empty-with-schema blocks (the poison carrier)."""
    import ray.data as rd

    full = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "sh": pa.array([b"x", b"y"], pa.large_binary())})
    empty = full.schema.empty_table()
    return rd.from_arrow([full, empty, empty])


SCHEMA = pa.schema([("doc_id", pa.int64()), ("sh", pa.large_binary())])


@pytest.mark.usefixtures("ray_session")
def test_fit_for_join_drops_empty_blocks():
    import ray

    fit = fit_for_join(_dirty_ds(), SCHEMA).materialize()
    bundle = fit._plan.execute()
    rows = [m.num_rows for m in bundle.metadata]
    assert all(r > 0 for r in rows)
    assert sum(rows) == 2
    for ref in bundle.block_refs:
        assert ray.get(ref).schema.names == ["doc_id", "sh"]


@pytest.mark.usefixtures("ray_session")
def test_fit_for_join_empty_dataset_keeps_schema():
    import ray.data as rd

    ds = rd.from_arrow(SCHEMA.empty_table())
    fit = fit_for_join(ds, SCHEMA)
    assert fit.count() == 0
    assert fit.schema().names == ["doc_id", "sh"]


@pytest.mark.usefixtures("ray_session")
def test_join_after_rename_with_empty_blocks():
    """The exact failing shape: rename-by-map_batches over a dataset with
    empty blocks, used as the right side of a join.  Without fit_for_join
    the un-renamed/zero-column empties crash the Acero key lookup."""
    import ray.data as rd

    right = fit_for_join(_dirty_ds(), SCHEMA).map_batches(
        lambda t: t.rename_columns(["a_doc", "sh_a"]), batch_format="pyarrow")
    left = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                                   "b": pa.array([9, 9, 9], pa.int64())}))
    j = left.join(right, join_type="inner", num_partitions=8,
                  on=("a",), right_on=("a_doc",))
    out = j.to_pandas().sort_values("a").reset_index(drop=True)
    assert list(out["a"]) == [1, 2]
    assert list(out["sh_a"]) == [b"x", b"y"]


def test_concat_batches_handles_empty_and_zero_column():
    zero_col = pa.table({})
    full = pa.table({"a": pa.array([1], pa.int64()),
                     "b": pa.array([2], pa.int64())})
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    out = concat_batches([zero_col, full], schema)
    assert out.num_rows == 1 and out.schema == schema
    assert concat_batches([], schema).num_rows == 0
    assert concat_batches([], schema).schema == schema


@pytest.mark.usefixtures("ray_session")
def test_verify_pairs_distributed_with_empty_shingle_blocks():
    """End-to-end: candidate verification where the docs dataset is split so
    some ShingleSets outputs are empty (only some blocks hold candidates)."""
    import ray.data as rd

    from ocr_main_ray.functions.dedup import verify_pairs_distributed

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = [
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([base], pa.string())}),
        pa.table({"doc_id": pa.array([2], pa.int64()),
                  "text": pa.array([base + " tail"], pa.string())}),
        # this block holds no candidate -> empty ShingleSets output
        pa.table({"doc_id": pa.array([50], pa.int64()),
                  "text": pa.array(["completely unrelated words here"],
                                   pa.string())}),
    ]
    docs_ds = rd.from_arrow(docs)
    cand = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64()),
                                   "b": pa.array([2], pa.int64())}))
    out = verify_pairs_distributed(cand, docs_ds, threshold=0.5,
                                   num_partitions=8).to_pandas()
    assert len(out) == 1
    assert (out.loc[0, "a"], out.loc[0, "b"]) == (1, 2)
    assert out.loc[0, "jaccard"] > 0.5


@pytest.mark.usefixtures("ray_session")
def test_salted_join_equals_plain_join():
    """Skewed left (80% one hot key) x small right: the salted join's row
    set must be identical to a plain pandas merge, for inner AND
    left_outer (incl. null propagation for unmatched keys)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.rayops import salted_join

    rng = np.random.default_rng(13)
    n = 5000
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 50, n))
    left_t = pa.table({"k": pa.array(keys, pa.int64()),
                       "lval": pa.array(np.arange(n, dtype=np.int64))})
    right_t = pa.table({"rk": pa.array(np.arange(0, 40, dtype=np.int64)),
                        "rval": pa.array([f"r{i}" for i in range(40)])})
    left = rd.from_arrow(left_t)
    right = rd.from_arrow(right_t)

    for how, ray_how in (("inner", "inner"), ("left", "left_outer")):
        got = (salted_join(left, right, on="k", right_on="rk",
                           join_type=ray_how, num_partitions=4, salt=8)
               .to_pandas())
        exp = left_t.to_pandas().merge(
            right_t.to_pandas(), how=how, left_on="k", right_on="rk")
        key_cols = ["k", "lval"]
        got_s = got.sort_values(key_cols).reset_index(drop=True)
        exp_s = exp.sort_values(key_cols).reset_index(drop=True)
        assert len(got_s) == len(exp_s), ray_how
        assert got_s["lval"].equals(exp_s["lval"]), ray_how
        # rval: compare with NaN-safe equality
        assert (got_s["rval"].fillna("<null>")
                .equals(exp_s["rval"].fillna("<null>"))), ray_how


def test_salted_join_rejects_unsupported_type():
    import pytest as _pytest

    from ocr_main_ray.rayops import salted_join

    with _pytest.raises(ValueError, match="inner/left_outer"):
        salted_join(None, None, on="k", join_type="right_outer")
