"""Link extraction + distributed PageRank."""
import numpy as np
import pyarrow as pa


def test_extract_links_batch():
    from ocr_main_ray.stages.urlnorm import extract_links_batch

    t = pa.table({
        "url": pa.array(["http://a.com/page"], pa.string()),
        "html": pa.array([
            b'<a href="http://b.co.uk/x">b</a>'
            b'<a href="/local">self</a>'
            b'<A HREF=\'https://sub.c.org/y\'>c</A>'
            b'<a href="#frag">skip</a>'], pa.large_binary())})
    out = extract_links_batch(t)
    assert out.column("src_domain").to_pylist() == ["a.com"] * 3
    assert out.column("dst_domain").to_pylist() == ["b.co.uk", "a.com",
                                                    "c.org"]


def test_extract_links_cap():
    from ocr_main_ray.stages.urlnorm import extract_links_batch

    html = b"".join(b'<a href="http://d%d.com/">x</a>' % i
                    for i in range(500))
    t = pa.table({"url": pa.array(["http://farm.com/"], pa.string()),
                  "html": pa.array([html], pa.large_binary())})
    out = extract_links_batch(t, max_links_per_page=200)
    assert out.num_rows == 200


def test_pagerank_distributed_matches_reference(ray_session):
    import ray.data as rd

    from ocr_main_ray.functions.graph import (pagerank_distributed,
                                              pagerank_reference)

    rng = np.random.RandomState(11)
    n = 60
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(400)]
    # a few dangling nodes: remove all out-edges of nodes 0..4
    edges = [(s, d) for s, d in edges if s >= 5]
    tbl = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(8)
    got = pagerank_distributed(ds, n, n_iter=15)
    want = pagerank_reference(edges, n, n_iter=15)
    assert np.allclose(got, want, rtol=0, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # probability mass conserved


def test_connected_components_matches_union_find(ray_session):
    import ray.data as rd

    from ocr_main_ray.functions.graph import (cc_reference,
                                              connected_components_distributed)

    rng = np.random.RandomState(5)
    n = 120
    # sparse graph -> several components, incl. a long chain 100..119
    edges = [(int(rng.randint(0, 50)), int(rng.randint(0, 50)))
             for _ in range(40)]
    edges += [(i, i + 1) for i in range(100, 119)]
    tbl = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64())})
    ds = rd.from_arrow(tbl).repartition(6)
    got = connected_components_distributed(ds, n)
    want = cc_reference(edges, n)
    assert np.array_equal(got, want)
    # isolated nodes keep their own id
    assert got[99] == 99


def test_pagerank_join_matches_reference(ray_session):
    """Join-based path (node state in a Dataset, no driver rank vector)
    equals the dense reference on the same graph."""
    import ray.data as rd

    from ocr_main_ray.functions.graph import pagerank_join, pagerank_reference

    rng = np.random.RandomState(11)
    n = 60
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(400)]
    edges = [(s, d) for s, d in edges if s >= 5]  # dangling nodes 0..4
    tbl = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64())})
    out = (pagerank_join(rd.from_arrow(tbl).repartition(8), n, n_iter=15)
           .to_pandas().sort_values("node"))
    want = pagerank_reference(edges, n, n_iter=15)
    assert out["node"].tolist() == list(range(n))
    assert np.allclose(out["rank"].to_numpy(), want, rtol=0, atol=1e-12)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_cc_join_matches_union_find_sparse_ids(ray_session):
    """Join-based CC works on ARBITRARY (non-dense) ids and equals
    union-find min-id components; chain collapses via pointer jumping."""
    import ray.data as rd

    from ocr_main_ray.functions.graph import cc_join, cc_reference

    rng = np.random.RandomState(5)
    edges = [(int(rng.randint(0, 50)), int(rng.randint(0, 50)))
             for _ in range(40)]
    edges += [(i, i + 1) for i in range(100, 119)]       # long chain
    edges += [(10**9 + 7, 10**9 + 8)]                    # sparse far ids
    n_dense = 120
    tbl = pa.table({"src": pa.array([a for a, b in edges], pa.int64()),
                    "dst": pa.array([b for a, b in edges], pa.int64())})
    lab = (cc_join(rd.from_arrow(tbl).repartition(6))
           .to_pandas().set_index("node")["label"].to_dict())
    dense_edges = [(a, b) for a, b in edges if a < n_dense and b < n_dense]
    want = cc_reference(dense_edges, n_dense)
    seen = sorted({x for e in dense_edges for x in e})
    assert all(lab[i] == want[i] for i in seen)
    assert lab[10**9 + 7] == lab[10**9 + 8] == 10**9 + 7
    # only edge-touched nodes appear — no dense node table anywhere
    assert set(lab) == {x for e in edges for x in e}
