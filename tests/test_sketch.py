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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cms_never_undercounts_and_bounds_overcount():
    import numpy as np

    from ocr_main_ray.functions.sketch import (
        CMS_D, CMS_W, cms_partial, cms_query)

    rng = np.random.default_rng(7)
    # zipf-ish stream: 2000 distinct words, heavy head
    words = np.array([f"w{i}" for i in range(2000)], dtype=object)
    counts = (10000 / (np.arange(2000) + 1)).astype("int64") + 1
    # split into 4 "batches" and merge additively (the distributed shape)
    import pandas as pd
    parts = []
    for sl in np.array_split(np.arange(2000), 4):
        parts.append(cms_partial(words[sl], counts[sl]).to_pandas())
    merged = (pd.concat(parts).groupby("slot", as_index=False)["cnt"].sum())
    est = cms_query(merged["slot"].to_numpy(), merged["cnt"].to_numpy(), words)
    assert (est >= counts).all()                       # one-sided error
    n_total = counts.sum()
    eps = np.e / CMS_W
    # classic bound: err <= eps * N with prob 1 - e^-D; allow every word
    # here since the stream is tiny relative to the sketch
    assert (est - counts <= eps * n_total).all()
    # the heavy head stays within 5% relative error at this load factor
    assert (est[:20] - counts[:20] <= 0.05 * counts[:20]).all()


def test_cms_partial_is_bounded():
    import numpy as np

    from ocr_main_ray.functions.sketch import CMS_D, CMS_W, cms_partial

    words = np.array([f"tok{i}" for i in range(50_000)], dtype=object)
    t = cms_partial(words, np.ones(50_000, dtype=np.int64))
    assert t.num_rows <= CMS_D * CMS_W


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np

    from ocr_main_ray.functions.sketch import bloom_build, bloom_test

    keys = np.arange(0, 200_000, 3, dtype=np.int64)
    bits = bloom_build(keys)
    assert bloom_test(bits, keys).all()                # zero false negatives
    misses = np.arange(1, 200_000, 3, dtype=np.int64)  # disjoint residue
    fp = bloom_test(bits, misses).mean()
    assert fp < 0.01


def test_bloom_empty_keyset():
    import numpy as np

    from ocr_main_ray.functions.sketch import bloom_build, bloom_test

    bits = bloom_build(np.array([], dtype=np.int64))
    probe = bloom_test(bits, np.arange(100, dtype=np.int64))
    assert probe.sum() <= 2  # essentially nothing passes an empty filter


# ---------------------------------------------------------------------------
# approximate-quantile sketch
# ---------------------------------------------------------------------------

def test_quantile_sketch_rank_error_bound():
    import numpy as np
    import pyarrow as pa

    from ocr_main_ray.functions.sketch import (QSK_K, quantile_partial,
                                               quantile_query)

    rng = np.random.RandomState(7)
    blocks = [rng.lognormal(5, 2, size=10_000).astype(np.int64)
              for _ in range(20)]
    parts = [quantile_partial(b) for b in blocks]
    merged = pa.concat_tables(parts)
    vals = merged.column("qv").to_numpy()
    ws = merged.column("qw").to_numpy()
    assert int(ws.sum()) == sum(len(b) for b in blocks)  # weights exact
    assert len(vals) <= QSK_K * len(blocks)              # bounded merge input

    everything = np.sort(np.concatenate(blocks))
    n = len(everything)
    for q, got in zip([0.5, 0.9, 0.99],
                      quantile_query(vals, ws, [0.5, 0.9, 0.99])):
        # realized rank of the returned value vs target rank
        rank = np.searchsorted(everything, got, side="right")
        assert abs(rank / n - q) < 2.5 / (2 * QSK_K) + 1e-9


def test_quantile_sketch_exact_when_small():
    import numpy as np

    from ocr_main_ray.functions.sketch import quantile_partial, quantile_query

    v = np.array([5, 1, 9, 3, 7], dtype=np.int64)
    t = quantile_partial(v)  # k >= n -> every value kept, weight 1
    assert t.column("qw").to_numpy().tolist() == [1] * 5
    assert quantile_query(t.column("qv").to_numpy(),
                          t.column("qw").to_numpy(), [0.5]) == [5]


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------

def test_int8_quantization_topk_recall():
    import numpy as np

    from ocr_main_ray.functions.similarity import (cosine_topk_int8,
                                                   normalize_rows,
                                                   quantize_int8)

    rng = np.random.RandomState(3)
    m = normalize_rows(rng.randn(2000, 64))
    q = rng.randn(64)
    exact = np.argsort(-(m @ (q / np.linalg.norm(q))), kind="stable")[:10]
    codes, scales = quantize_int8(m)
    assert codes.dtype == np.int8 and codes.shape == m.shape
    approx = cosine_topk_int8(codes, scales, q, 10)
    overlap = len(set(exact.tolist()) & set(approx.tolist()))
    assert overlap >= 8  # top-10 recall >= 0.8 under int8 noise


def test_int8_quantization_roundtrip_error_bound():
    import numpy as np

    from ocr_main_ray.functions.similarity import (normalize_rows,
                                                   quantize_int8)

    rng = np.random.RandomState(4)
    m = normalize_rows(rng.randn(100, 32)).astype(np.float32)
    codes, scales = quantize_int8(m)
    recon = codes.astype(np.float32) * scales[:, None]
    assert np.abs(recon - m).max() <= (np.abs(m).max(axis=1) / 127.0
                                       ).max() * 0.5 + 1e-6


def test_mmr_rerank_diversity_and_degenerate_lambda():
    import numpy as np

    from ocr_main_ray.functions.similarity import mmr_rerank, normalize_rows

    rng = np.random.RandomState(9)
    # two tight clusters + singletons; top scores all in cluster A
    a = normalize_rows(rng.randn(1, 16))
    cluster_a = normalize_rows(a + 0.01 * rng.randn(5, 16))
    b = normalize_rows(rng.randn(5, 16))
    vecs = np.vstack([cluster_a, b])
    scores = np.array([1.0, 0.99, 0.98, 0.97, 0.96,
                       0.5, 0.49, 0.48, 0.47, 0.46])
    plain = np.argsort(-scores, kind="stable")[:4]
    assert set(plain) == {0, 1, 2, 3}          # plain top-k: one cluster
    diverse = mmr_rerank(vecs, scores, k=4, lam=0.5)
    assert diverse[0] == 0                     # best item always first
    assert len(set(diverse.tolist()) & {5, 6, 7, 8, 9}) >= 2  # spread out
    # lam=1 degenerates to plain relevance order
    assert mmr_rerank(vecs, scores, k=4, lam=1.0).tolist() == plain.tolist()
    # deterministic
    assert (mmr_rerank(vecs, scores, 4, 0.5)
            == mmr_rerank(vecs, scores, 4, 0.5)).all()
