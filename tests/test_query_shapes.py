"""Kernel-level tests for the round-3 plan-shape queries (TPC-H Q21,
gaps-and-islands, skyline, deletion-neighborhood edit join).

The distributed queries themselves are oracle-checked in test_queries.py;
these pin the block-local kernels' edge cases directly."""
import numpy as np
import pandas as pd
import pyarrow as pa

from ocr_main_ray.pipelines.queries import (
    _editpairs_bucket,
    _lev_le1,
    _local_skyline,
    _streak_bucket,
    _waiting_bucket,
)


# ---------------------------------------------------------------- _lev_le1

def test_lev_le1_truth_table():
    assert _lev_le1("abc", "abc")            # equal
    assert _lev_le1("abc", "abd")            # one substitution
    assert _lev_le1("abc", "abcd")           # one insertion at end
    assert _lev_le1("abc", "xabc")           # one insertion at front
    assert _lev_le1("abc", "ab")             # one deletion
    assert _lev_le1("", "a")                 # empty vs one char
    assert not _lev_le1("abc", "axy")        # two substitutions
    assert not _lev_le1("abc", "abcde")      # length diff 2
    assert not _lev_le1("ab", "ba")          # transposition costs 2
    assert not _lev_le1("abcd", "acbd")      # swap inside costs 2


# ---------------------------------------------------------- local skyline

def _brute_skyline(size, price):
    keep = []
    for i in range(len(size)):
        dominated = any(
            size[j] <= size[i] and price[j] >= price[i]
            and (size[j] < size[i] or price[j] > price[i])
            for j in range(len(size)))
        if not dominated:
            keep.append(i)
    return keep


def test_local_skyline_matches_brute_force():
    rng = np.random.default_rng(7)
    size = rng.integers(1, 12, 60).astype(np.int32)
    price = np.round(rng.uniform(1, 20, 60), 1)
    t = pa.table({"p_partkey": pa.array(np.arange(60), pa.int64()),
                  "p_size": pa.array(size),
                  "p_retailprice": pa.array(price)})
    got = sorted(_local_skyline(t).column("p_partkey").to_pylist())
    assert got == _brute_skyline(size, price)


def test_local_skyline_keeps_exact_ties():
    # identical (size, price) rows do not dominate each other: all kept
    t = pa.table({"p_partkey": pa.array([1, 2, 3], pa.int64()),
                  "p_size": pa.array([5, 5, 9], pa.int32()),
                  "p_retailprice": pa.array([10.0, 10.0, 1.0])})
    got = sorted(_local_skyline(t).column("p_partkey").to_pylist())
    assert got == [1, 2]  # the (9, 1.0) row is dominated by both ties


def test_local_skyline_empty():
    t = pa.table({"p_partkey": pa.array([], pa.int64()),
                  "p_size": pa.array([], pa.int32()),
                  "p_retailprice": pa.array([], pa.float64())})
    assert _local_skyline(t).num_rows == 0


# ------------------------------------------------------------ streaks

def test_streak_bucket_islands():
    g = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 1],   # user 1 day 12 duplicated
        "day":     [10, 11, 12, 20, 5, 7, 12],
        "ubucket": [0] * 7,
    })
    out = _streak_bucket(g).set_index("user_id")
    assert out.loc[1, "n_days"] == 4          # 10,11,12,20
    assert out.loc[1, "longest_streak"] == 3  # 10-12
    assert out.loc[2, "n_days"] == 2
    assert out.loc[2, "longest_streak"] == 1  # 5 and 7 not consecutive


# --------------------------------------------------------- Q21 bucket fold

def test_waiting_bucket_quantifiers():
    # order 1: suppliers 10 (late) + 11 (on time)  -> supplier 10 qualifies
    # order 2: suppliers 10 (late) + 11 (late)     -> two late, nobody
    # order 3: supplier 10 alone (late)            -> single-supplier, nobody
    # order 4: split rows for (4, 12): late on one block-partial row only
    g = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4, 4],
        "l_suppkey":  [10, 11, 10, 11, 10, 12, 12, 13],
        "late":       [1, 0, 1, 1, 1, 0, 1, 0],
        "obucket":    [0] * 8,
    })
    out = _waiting_bucket(g)
    got = dict(zip(out["l_suppkey"], out["pn"]))
    assert got == {10: 1, 12: 1}


# ------------------------------------------------- deletion-neighborhood

def test_editpairs_bucket_verifies_candidates():
    # "ab" and "ba" share deletion variants ("a", "b") but are distance 2:
    # candidate generation must propose them, verification must reject.
    g = pd.DataFrame({
        "k":      ["a", "a", "b", "b", "ab", "ab"],
        "p_name": ["ab", "ba", "ab", "ba", "ab", "abc"],
        "kbucket": [0] * 6,
    })
    out = _editpairs_bucket(g)
    pairs = set(zip(out.column("name_a").to_pylist(),
                    out.column("name_b").to_pylist()))
    assert ("ab", "abc") in pairs
    assert ("ab", "ba") not in pairs


# ----------------------------------------------------------- sweep line

def test_endpoints_partial_collapses_ties():
    import pyarrow as pa
    from ocr_main_ray.pipelines.queries import (CONCUR_SPAN_US,
                                                _endpoints_partial)
    # two events at the same ts -> one +1 row with dsum=2, one -1 with -2
    ts = pa.array([1_000_000, 1_000_000], pa.timestamp("us"))
    out = _endpoints_partial(pa.table({"ts": ts}))
    rows = sorted(zip(out.column("t").to_pylist(),
                      out.column("d").to_pylist(),
                      out.column("dsum").to_pylist()))
    assert rows == [(1_000_000, 1, 2), (1_000_000 + CONCUR_SPAN_US, -1, -2)]


# ---------------------------------------------------- property tests

from hypothesis import given, settings, strategies as st

settings.register_profile("shapes", derandomize=True)
settings.load_profile("shapes")


def _lev_full(a: str, b: str) -> int:
    m = [[i + j if i * j == 0 else 0 for j in range(len(b) + 1)]
         for i in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i][j] = min(m[i - 1][j] + 1, m[i][j - 1] + 1,
                          m[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return m[len(a)][len(b)]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc", max_size=6), st.text(alphabet="abc", max_size=6))
def test_lev_le1_equals_full_dp(a, b):
    assert _lev_le1(a, b) == (_lev_full(a, b) <= 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 6), st.integers(1, 8)),
                min_size=0, max_size=25))
def test_local_skyline_property(pairs):
    size = np.asarray([p[0] for p in pairs], np.int32)
    price = np.asarray([float(p[1]) for p in pairs], np.float64)
    t = pa.table({"p_partkey": pa.array(np.arange(len(pairs)), pa.int64()),
                  "p_size": pa.array(size),
                  "p_retailprice": pa.array(price)})
    got = sorted(_local_skyline(t).column("p_partkey").to_pylist())
    assert got == _brute_skyline(size, price)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), st.integers(0, 20)),
                min_size=1, max_size=30))
def test_streak_bucket_property(pairs):
    g = pd.DataFrame({"user_id": [p[0] for p in pairs],
                      "day": [p[1] for p in pairs],
                      "ubucket": [0] * len(pairs)})
    out = _streak_bucket(g).set_index("user_id")
    for u in set(g["user_id"]):
        days = sorted(set(g[g["user_id"] == u]["day"]))
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur); cur = 1
        runs.append(cur)
        assert out.loc[u, "n_days"] == len(days)
        assert out.loc[u, "longest_streak"] == max(runs)


# ------------------------------------------- local_supplier_revenue routing

def test_local_supplier_revenue_routes_agree(ray_session):
    """The size-routed broadcast and hashjoin paths of the TPC-H Q5
    analogue must produce identical results — the hashjoin path is what
    runs when customer/supplier outgrow _BCAST_DIM_MAX_ROWS."""
    from ocr_main_ray.pipelines.queries import (_BCAST_DIM_MAX_ROWS,
                                                q_local_supplier_revenue)
    sf = "/root/testdata/sf0.001"
    a = q_local_supplier_revenue(sf, route="broadcast")
    b = q_local_supplier_revenue(sf, route="hashjoin")
    pd.testing.assert_frame_equal(a, b)
    assert a.shape[0] > 0
    assert _BCAST_DIM_MAX_ROWS >= 1_000_000  # broadcast stays the sf0.1 path


def test_returned_revenue_topk_routes_agree(ray_session):
    """The broadcast (orderkey→custkey lookup + point-read decoration) and
    hashjoin (per-order partials → two joins) paths of the TPC-H Q10
    analogue must produce identical results — the hashjoin path is what
    runs when orders outgrows _BCAST_DIM_MAX_ROWS."""
    from ocr_main_ray.pipelines.queries import q_returned_revenue_topk
    sf = "/root/testdata/sf0.001"
    a = q_returned_revenue_topk(sf, route="broadcast")
    b = q_returned_revenue_topk(sf, route="hashjoin")
    pd.testing.assert_frame_equal(a, b)
    assert a.shape[0] > 0


def test_part_year_flags_routes_agree(ray_session):
    """The broadcast (windowed orderkey→year-flag lookup, one groupby)
    and hashjoin (pre-distinct + join) paths of the INTERSECT/EXCEPT
    flag-fold query must produce identical results."""
    from ocr_main_ray.pipelines.queries import q_part_year_flags
    sf = "/root/testdata/sf0.001"
    a = q_part_year_flags(sf, route="broadcast")
    b = q_part_year_flags(sf, route="hashjoin")
    pd.testing.assert_frame_equal(a, b)
    assert int(a.loc[0, "n_both"]) > 0


def test_suppliers_kept_waiting_routes_agree(ray_session):
    """The broadcast (orderkey→orderdate lookup, obucket groupby only)
    and hashjoin paths of the TPC-H Q21 analogue must produce identical
    results."""
    from ocr_main_ray.pipelines.queries import q_suppliers_kept_waiting
    sf = "/root/testdata/sf0.001"
    a = q_suppliers_kept_waiting(sf, route="broadcast")
    b = q_suppliers_kept_waiting(sf, route="hashjoin")
    pd.testing.assert_frame_equal(a, b)
    assert a.shape[0] > 0


def test_set_similarity_join_routes_agree(ray_session):
    """The small-vocabulary bitmask path (uint64 masks + popcount
    arithmetic) and the general prefix-filter path must produce the same
    exact Jaccard >= 0.5 pair set."""
    from ocr_main_ray.pipelines.queries import q_set_similarity_join
    sf = "/root/testdata/sf0.001"
    a = q_set_similarity_join(sf, route="bitmask")
    b = q_set_similarity_join(sf, route="prefix")
    assert a.equals(b)
    assert a.num_rows > 0


def test_token_familiarity_routes_agree(ray_session):
    """The broadcast-vocabulary (fold inside the scan, zero pass-2
    exchanges) and hash-join paths of token_familiarity must produce
    identical results — the join path is what runs when the corpus
    vocabulary outgrows _BCAST_DIM_MAX_ROWS."""
    from ocr_main_ray.pipelines.queries import q_token_familiarity
    sf = "/root/testdata/sf0.001"
    a = q_token_familiarity(sf, route="broadcast")
    b = q_token_familiarity(sf, route="join")
    pd.testing.assert_frame_equal(a, b)
    assert a.shape[0] > 0


# -------------------------------------------- events_topk_weighted routing

def test_events_topk_weighted_routes_agree(ray_session):
    """The skew-salted and plain hash-join paths of the hot-key weighted
    join must be identical; the 5-distinct-key weight table must route to
    the salted path by default (5 < num_partitions x factor)."""
    from ocr_main_ray.pipelines.queries import q_events_topk_weighted
    sf = "/root/testdata/sf0.001"
    a = q_events_topk_weighted(sf, route="salted")
    b = q_events_topk_weighted(sf, route="plain")
    default = q_events_topk_weighted(sf)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, default)  # default = salted here
    assert a.shape == (20, 3)


# ---------------------------------------------- events_asof_orders routing

def test_events_asof_orders_routes_agree(ray_session):
    """The broadcast and user-bucket co-partitioned as-of paths must be
    identical; the bucketed path is what runs when orders (a FACT table)
    outgrows _BCAST_DIM_MAX_ROWS."""
    from ocr_main_ray.pipelines.queries import q_events_asof_orders
    sf = "/root/testdata/sf0.001"
    key = ["event_id"]
    a = (q_events_asof_orders(sf, route="broadcast")
         .sort_values(key).reset_index(drop=True))
    b = (q_events_asof_orders(sf, route="bucketed")
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert len(a) > 0


# ------------------------------------- empty broadcast dimensions (review)

def _empty_window_sf(tmp_path) -> str:
    """sf0.001 clone whose orders table is EMPTY and whose lineitems all
    ship before 1996 — exercises every broadcast-lookup stage with a
    zero-row dimension / empty aggregate window (round-4 review: the raw
    searchsorted-then-index pattern raised IndexError on these inputs)."""
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    src = "/root/testdata/sf0.001"
    out = tmp_path / "empty_dim_sf"
    out.mkdir()
    for name in ("customer", "supplier", "nation", "region", "part"):
        shutil.copy(f"{src}/{name}.parquet", out / f"{name}.parquet")
    orders = pq.read_table(f"{src}/orders.parquet")
    pq.write_table(orders.slice(0, 0), out / "orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    mask = pc.less(li.column("l_shipdate"),
                   pa.scalar(pd.Timestamp("1996-01-01")))
    li = li.filter(mask)
    assert li.num_rows > 0  # lookups must actually run over real batches
    pq.write_table(li, out / "lineitem.parquet")
    return str(out)


def test_returned_revenue_topk_empty_orders(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_returned_revenue_topk
    sf = _empty_window_sf(tmp_path)
    out = q_returned_revenue_topk(sf, route="broadcast")
    assert list(out.columns) == ["c_custkey", "c_name", "n_name",
                                 "revenue_cents"]
    assert len(out) == 0


def test_local_supplier_revenue_empty_orders(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_local_supplier_revenue
    sf = _empty_window_sf(tmp_path)
    out = q_local_supplier_revenue(sf, route="broadcast")
    assert len(out) == 0


def test_top_supplier_revenue_empty_window(ray_session, tmp_path):
    from ocr_main_ray.pipelines.queries import q_top_supplier_revenue
    sf = _empty_window_sf(tmp_path)
    out = q_top_supplier_revenue(sf)
    assert list(out.columns) == ["s_suppkey", "s_name",
                                 "total_revenue_cents"]
    assert len(out) == 0
    assert out["total_revenue_cents"].dtype == "int64"


def test_sorted_lookup_empty_and_out_of_range():
    from ocr_main_ray.pipelines.queries import _sorted_lookup
    hit, vals = _sorted_lookup(np.array([], dtype=np.int64),
                               np.array([], dtype=np.int64),
                               np.array([1, 2, 3]))
    assert not hit.any() and len(vals) == 3
    keys = np.array([10, 20, 30], dtype=np.int64)
    v = np.array([1, 2, 3], dtype=np.int64)
    hit, vals = _sorted_lookup(keys, v, np.array([5, 20, 99]))
    assert hit.tolist() == [False, True, False]
    assert vals[1] == 2


# ---------------------------------------------------- round-4 routed family
# Every remaining query that broadcast (or driver-materialized) an
# sf-scaled dimension table gained a hashjoin fallback past
# _BCAST_DIM_MAX_ROWS; each pair below pins both paths pointwise equal.

def _routes_agree(qfn, key_cols=None, nonempty=True):
    import pandas as pd
    import pyarrow as pa

    sf = "/root/testdata/sf0.001"
    a, b = qfn(sf, route="broadcast"), qfn(sf, route="hashjoin")
    if isinstance(a, pa.Table):
        a, b = a.to_pandas(), b.to_pandas()
    if key_cols:
        a = a.sort_values(key_cols).reset_index(drop=True)
        b = b.sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    if nonempty:
        assert a.shape[0] > 0


def test_revenue_by_segment_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_revenue_by_segment
    _routes_agree(q_revenue_by_segment, ["c_mktsegment"])


def test_revenue_by_nation_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_revenue_by_nation
    _routes_agree(q_revenue_by_nation, ["n_name"])


def test_building_orders_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_building_orders
    _routes_agree(q_building_orders)


def test_shipping_priority_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_shipping_priority
    _routes_agree(q_shipping_priority, ["l_orderkey"])


def test_orders_above_cust_avg_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_orders_above_cust_avg
    _routes_agree(q_orders_above_cust_avg, ["o_orderkey"])


def test_brand_weighted_price_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_brand_weighted_price
    _routes_agree(q_brand_weighted_price, ["p_brand"])


def test_promo_revenue_share_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_promo_revenue_share
    _routes_agree(q_promo_revenue_share)


def test_nation_pair_volume_routes_agree(ray_session):
    # empty at sf0.001 (no suppliers in the two nations) — the agreement
    # on the empty frame still pins schema + the empty-side guards
    from ocr_main_ray.pipelines.queries import q_nation_pair_volume
    _routes_agree(q_nation_pair_volume,
                  ["supp_nation", "cust_nation", "l_year"], nonempty=False)


def test_nation_pair_volume_nonempty_fixture(ray_session, tmp_path):
    """Planted suppliers/customers in nations 1 and 2 so both route plans
    exercise the non-trivial lhs/rhs join + fold on REAL rows (sf0.001 has
    no suppliers in those nations, so the sf-data route test above only
    pins the empty frame).  Expects exactly the two hand-computed
    pair-direction rows, same from both routes."""
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_nation_pair_volume

    ts = pa.timestamp("us")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 5], pa.int64()),
        "n_name": pa.array(["NOISE", "ALPHA", "BRAVO", "OTHER"])}),
        tmp_path / "nation.parquet")
    # suppliers: 1 in nation 1, 2 in nation 2, 3 in an ignored nation
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([1, 2, 0], pa.int64())}),
        tmp_path / "supplier.parquet")
    # customers: 10 in nation 2, 11 in nation 1, 12 in an ignored nation
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([2, 1, 5], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 102], pa.int64()),
        "o_custkey": pa.array([10, 11, 12], pa.int64())}),
        tmp_path / "orders.parquet")
    from datetime import datetime
    d = lambda s: datetime(*map(int, s.split("-")))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 101, 101, 100, 102], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1, 3, 1], pa.int64()),
        "l_extendedprice": pa.array(
            [100.0, 50.0, 200.0, 70.0, 30.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array(
            [d("1995-06-01"),   # supp n1 -> cust n2: ALPHA->BRAVO 1995
             d("1995-07-01"),   # supp n2 == cust n2: dropped (same nation)
             d("1996-03-01"),   # supp n2 -> cust n1: BRAVO->ALPHA 1996
             d("1996-04-01"),   # supp n1 == cust n1: dropped
             d("1997-05-01"),   # out of the [1995, 1997) window: dropped
             d("1995-08-01")],  # cust 12 in ignored nation: dropped
            ts)}),
        tmp_path / "lineitem.parquet")

    expect = pd.DataFrame({
        "supp_nation": ["ALPHA", "BRAVO"],
        "cust_nation": ["BRAVO", "ALPHA"],
        "l_year": pd.array([1995, 1996], dtype="int64"),
        "revenue_cents": pd.array([9000, 20000], dtype="int64")})
    for route in ("broadcast", "hashjoin"):
        got = q_nation_pair_volume(str(tmp_path), route=route)
        if isinstance(got, pa.Table):
            got = got.to_pandas()
        got = (got.sort_values(["supp_nation", "cust_nation", "l_year"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_promo_revenue_share_no_promo_parts(ray_session, tmp_path):
    """Empty-side guard: with zero PROMO parts the hashjoin route must
    not call Dataset.join on the fully-empty promo_keys side — both
    routes return promo=0 against the real total."""
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_promo_revenue_share

    from datetime import datetime
    d = lambda s: datetime(*map(int, s.split("-")))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([d("1996-01-05"), d("1996-01-20")],
                               pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["STANDARD", "ECONOMY"])}),
        tmp_path / "part.parquet")
    for route in ("broadcast", "hashjoin"):
        got = q_promo_revenue_share(str(tmp_path), route=route).to_pandas()
        assert int(got.loc[0, "promo_cents"]) == 0
        assert int(got.loc[0, "total_cents"]) == 15000
        assert float(got.loc[0, "promo_share"]) == 0.0


def test_shipping_priority_no_building_customers(ray_session, tmp_path):
    """Empty-side guard: with zero BUILDING customers both routes return
    the typed empty top-10 frame instead of crashing Dataset.join."""
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_shipping_priority

    from datetime import datetime
    d = lambda s: datetime(*map(int, s.split("-")))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["AUTOMOBILE", "MACHINERY"])}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([d("1995-01-01"), d("1995-02-01")],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"])}),
        tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 11], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_shipdate": pa.array([d("1995-06-01"), d("1995-07-01")],
                               pa.timestamp("us"))}),
        tmp_path / "lineitem.parquet")
    for route in ("broadcast", "hashjoin"):
        got = q_shipping_priority(str(tmp_path), route=route)
        assert got.shape[0] == 0
        assert list(got.columns) == ["l_orderkey", "revenue_cents",
                                     "o_orderdate", "o_orderpriority"]
        assert str(got["l_orderkey"].dtype) == "int64"
        assert str(got["o_orderdate"].dtype) == "datetime64[us]"


def test_building_orders_building_cust_without_orders(ray_session, tmp_path):
    """Coalesce guard: BUILDING customers exist but none has an order, so
    the hashjoin route's per_cust⋈seg_keys join is empty and Sum returns
    None — both routes must yield the {0, 0} row."""
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_building_orders

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "MACHINERY"])}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([2, 2], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0], pa.float64())}),
        tmp_path / "orders.parquet")
    for route in ("broadcast", "hashjoin"):
        got = q_building_orders(str(tmp_path), route=route).to_pandas()
        assert int(got.loc[0, "n_orders"]) == 0
        assert int(got.loc[0, "revenue_cents"]) == 0


def test_region_market_share_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_region_market_share
    _routes_agree(q_region_market_share, ["o_year"])


def test_bloom_semi_join_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_bloom_semi_join
    _routes_agree(q_bloom_semi_join, ["l_returnflag"])


def test_small_qty_part_revenue_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_small_qty_part_revenue
    _routes_agree(q_small_qty_part_revenue)


def test_disjunctive_revenue_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_disjunctive_revenue
    _routes_agree(q_disjunctive_revenue)


def test_customer_top_decile_share_routes_agree(ray_session):
    from ocr_main_ray.pipelines.queries import q_customer_top_decile_share
    sf = "/root/testdata/sf0.001"
    a = q_customer_top_decile_share(sf, route="local").to_pandas()
    b = q_customer_top_decile_share(sf, route="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_customer_top_decile_share_tie_skew(ray_session, tmp_path):
    """Degenerate value skew: many customers with IDENTICAL revenue
    around the k-th rank.  The distributed order statistic must resolve
    the threshold inside one bucket and count ties exactly like the
    local sort (ties all equal T, so the sum is tie-break-free)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_customer_top_decile_share

    # 40 customers: 5 with unique high totals, 30 tied exactly at 100.00,
    # 5 low.  k = 4 -> threshold falls among unique highs; also run a
    # variant where k lands inside the tie block.
    cust = list(range(1, 41))
    price = ([500.0, 400.0, 300.0, 200.0, 150.0]
             + [100.0] * 30 + [1.0] * 5)
    pq.write_table(pa.table({"o_orderkey": pa.array(cust, pa.int64()),
                             "o_custkey": pa.array(cust, pa.int64()),
                             "o_totalprice": pa.array(price, pa.float64())}),
                   tmp_path / "orders.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array(cust, pa.int64())}),
                   tmp_path / "customer.parquet")
    a = q_customer_top_decile_share(str(tmp_path),
                                    route="local").to_pandas()
    b = q_customer_top_decile_share(str(tmp_path),
                                    route="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert int(a.loc[0, "n_top"]) == 4
    # k inside the tie block: duplicate every tied row's weight via a
    # second orders file with 60 more tied customers
    cust2 = list(range(41, 101))
    pq.write_table(
        pa.table({"o_orderkey": pa.array(cust2, pa.int64()),
                  "o_custkey": pa.array(cust2, pa.int64()),
                  "o_totalprice": pa.array([100.0] * 60, pa.float64())}),
        tmp_path / "orders2.parquet")
    import pandas as pd2
    both = pd2.concat([pq.read_table(tmp_path / "orders.parquet").to_pandas(),
                       pq.read_table(tmp_path / "orders2.parquet").to_pandas()])
    pq.write_table(pa.Table.from_pandas(both, preserve_index=False),
                   tmp_path / "orders.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array(cust + cust2, pa.int64())}),
                   tmp_path / "customer.parquet")
    a = q_customer_top_decile_share(str(tmp_path),
                                    route="local").to_pandas()
    b = q_customer_top_decile_share(str(tmp_path),
                                    route="distributed").to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert int(a.loc[0, "n_top"]) == 10  # threshold T=100.00 inside ties


def test_default_route_flips_past_threshold(ray_session, monkeypatch):
    """route=None must consult _BCAST_DIM_MAX_ROWS at call time: with the
    threshold forced to 0 every dimension 'outgrows' a broadcast and the
    default call must take the hashjoin path (same results, no ray.put of
    the dimension)."""
    import ocr_main_ray.pipelines.queries as Q

    sf = "/root/testdata/sf0.001"
    expected = {}
    for name in ("revenue_by_segment", "bloom_semi_join",
                 "customer_top_decile_share"):
        out = Q.QUERIES[name](sf)
        expected[name] = (out.to_pandas() if hasattr(out, "to_pandas")
                          and not isinstance(out, pd.DataFrame) else out)
    monkeypatch.setattr(Q, "_BCAST_DIM_MAX_ROWS", 0)
    for name, exp in expected.items():
        got = Q.QUERIES[name](sf)
        if hasattr(got, "to_pandas") and not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values(list(got.columns)).reset_index(drop=True),
            exp.sort_values(list(exp.columns)).reset_index(drop=True))


def test_hashjoin_routes_empty_dimension(ray_session, tmp_path):
    """A dimension slice that prunes to zero rows must not crash the
    hashjoin fallbacks (Dataset.join rejects a fully-empty side) and must
    match the broadcast route's empty/zero results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import (q_bloom_semi_join,
                                                q_building_orders)

    # customers: none in BUILDING; parts: all below the big-size cut
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["AUTOMOBILE", "MACHINERY"], pa.string()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_size": pa.array([1, 2], pa.int64()),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([100.0, 200.0], pa.float64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_returnflag": pa.array(["N", "R"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0], pa.float64()),
    }), tmp_path / "lineitem.parquet")
    sf = str(tmp_path)
    for route in ("broadcast", "hashjoin"):
        out = q_building_orders(sf, route=route).to_pandas()
        assert int(out.loc[0, "n_orders"]) == 0, route
        assert int(out.loc[0, "revenue_cents"]) == 0, route
        empty = q_bloom_semi_join(sf, route=route)
        assert len(empty) == 0, route


def test_norm_exact_dedup_collapses_variants(ray_session, tmp_path):
    """Planted trivially-reformatted copies: whitespace runs, leading /
    trailing space, and case changes must land in ONE normalized class
    (survivor = min doc_id), while genuinely different text stays apart."""
    import pyarrow.parquet as pq

    from ocr_main_ray.pipelines.queries import q_norm_exact_dedup

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "The quick Brown Fox",
            "  the   quick\tbrown fox\n",   # ws + case variant of 1
            "THE QUICK BROWN FOX",          # case variant of 1
            "a different document",
            "a  DIFFERENT document",        # variant of 4
        ])}),
        tmp_path / "documents.parquet")
    out = (q_norm_exact_dedup(str(tmp_path))
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 4]
    assert out["n_copies"].tolist() == [3, 2]
