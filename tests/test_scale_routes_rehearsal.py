"""Scale-route rehearsal (round-4 verdict item 6): synthesize enough rows
to push the size routers past their thresholds and assert the DISTRIBUTED
branch is the one that actually executed — not merely that both routes
agree at toy size (tests/test_query_shapes.py already pins agreement).

Branch detection is driver-side: each router's small-data branch makes a
driver-process call (pq.read_table, the exact all-pairs sweep, the
union-find dict build) that the test replaces with a tripwire; worker
processes never see the patch, so a passing test proves the scale branch
ran end-to-end in the driver's plan.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _trip(name):
    def boom(*a, **k):
        raise AssertionError(f"small-data branch ran: {name}")
    return boom


@pytest.mark.slow
def test_bcast_dim_router_picks_hashjoin_past_threshold(ray_session,
                                                        tmp_path,
                                                        monkeypatch):
    """A customer dimension with > _BCAST_DIM_MAX_ROWS rows must route
    q_building_orders to the hash-partitioned join WITHOUT an explicit
    route override; the broadcast branch's driver-side pq.read_table is a
    tripwire.  The 5M+ rows are real — the router reads parquet metadata,
    so nothing smaller exercises it."""
    from ocr_main_ray.pipelines import queries
    from ocr_main_ray.pipelines.queries import (_BCAST_DIM_MAX_ROWS,
                                                q_building_orders)

    n = _BCAST_DIM_MAX_ROWS + 100
    keys = np.arange(n, dtype=np.int64)
    seg = np.full(n, "MACHINERY", dtype=object)
    seg[[3, 7]] = "BUILDING"
    pq.write_table(pa.table({"c_custkey": pa.array(keys),
                             "c_mktsegment": pa.array(seg, pa.string())}),
                   tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([3, 7, 42], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 99.0], pa.float64())}),
        tmp_path / "orders.parquet")

    monkeypatch.setattr(pq, "read_table", _trip("pq.read_table broadcast"))
    got = q_building_orders(str(tmp_path)).to_pandas()  # route=None: router
    assert int(got.loc[0, "n_orders"]) == 2
    assert int(got.loc[0, "revenue_cents"]) == 3000


@pytest.mark.slow
def test_embedding_auto_routes_to_lsh_past_threshold(ray_session,
                                                     monkeypatch):
    """embedding_near_dups_auto past EXACT_ALLPAIRS_ROW_LIMIT rows must
    take the LSH-bucketed path; the exact all-pairs function is the
    tripwire.  1M+ real rows with a planted identical pair (vec_ids 0/1)
    that the LSH path must surface (identical vectors share every bucket;
    vec 0 is its bucket's min id, so even the degenerate-bucket star
    comparison catches the pair)."""
    import ray.data as rd

    from ocr_main_ray.functions import similarity
    from ocr_main_ray.functions.similarity import (EXACT_ALLPAIRS_ROW_LIMIT,
                                                   embedding_near_dups_auto)

    dim = 4
    n = EXACT_ALLPAIRS_ROW_LIMIT + 500

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        rng = np.random.default_rng(int(ids[0]) + 1)
        m = rng.normal(size=(len(ids), dim))
        m[ids == 0] = [1.0, 0.0, 0.0, 0.0]   # planted identical pair
        m[ids == 1] = [1.0, 0.0, 0.0, 0.0]
        return pd.DataFrame({"vec_id": ids.astype("int64"),
                             "embedding": list(m)})

    ds = rd.range(n).map_batches(gen, batch_format="pandas")
    monkeypatch.setattr(similarity, "embedding_near_dup_pairs",
                        _trip("exact all-pairs sweep"))
    out = embedding_near_dups_auto(ds, dim=dim, threshold=0.95, k=2, L=4)
    pairs = out.to_pandas()
    assert {"a", "b", "cos_sim"} <= set(pairs.columns)
    hit = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]
    assert len(hit) >= 1
    assert float(hit["cos_sim"].iloc[0]) > 0.999


def test_curation_distributed_label_path(ray_session, monkeypatch):
    """driver_pair_budget below the verified pair count must route
    curate_documents to the distributed min-label-propagation join; the
    broadcast branch's union-find dict build is the tripwire.  The budget
    is the documented scale-down parameter (DRIVER_PAIR_BUDGET itself is
    50M pairs — the knob exists precisely so the scale branch is
    rehearsable), and the planted near-identical docs must still come out
    canonicalized identically to the broadcast path's documented output:
    lowest doc_id kept, the rest dropped as near_dup."""
    import ray.data as rd

    from ocr_main_ray.pipelines import curate
    from ocr_main_ray.pipelines.curate import curate_documents

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the miller watches the river turn the ancient wheel")
    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 10, 20], dtype="int64"),
        "text": [base, base + " extra", base + " extra words",
                 "an entirely different document about maritime law and "
                 "the registration of cargo vessels in northern ports",
                 "short"],
    })
    ds = rd.from_pandas(docs)
    expected = curate_documents(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    monkeypatch.setattr(curate, "_pairs_to_dict",
                        _trip("driver union-find dict"))
    got = curate_documents(ds, driver_pair_budget=-1).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected)
    # the planted near-dup cluster actually collapsed
    keep = got["keep"].astype(bool)
    assert 1 in got[keep]["doc_id"].tolist()
    dropped = got[~keep]
    assert set(dropped[dropped["drop_reason"] == "near_dup"]["doc_id"]) \
        >= {2, 3}
