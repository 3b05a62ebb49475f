"""Static regression guard for the broadcast-dimension class.

Rounds 3-4 closed every query that drove an sf-scaled table (customer /
supplier / part / orders / lineitem / embeddings / documents) through a
driver read + ``ray.put`` broadcast with no scale fallback: each such
query now takes a ``route`` kwarg and hash-joins past
``_BCAST_DIM_MAX_ROWS``.  This test keeps the class closed — a NEW
``ray.put`` site in the query layer must either live in a route-kwarg'd
function (with its agreement test) or be added to the documented
bounded-by-construction allowlist below, with a reason.
"""
import re
import pathlib

QUERIES_PY = (pathlib.Path(__file__).parent.parent
              / "ocr_main_ray" / "pipelines" / "queries.py")

# Functions whose ray.put payload is bounded regardless of scale factor,
# with the reason (checked against the source comments by reviewers):
BOUNDED_BROADCASTS = {
    "q_decontaminate",        # benchmark test-suite grams: real suites are
                              # MBs by construction (documented at the site)
    "q_nation_customer_names",  # 25-row nation name map
    "q_events_value_mad",     # one scalar (the global median)
    "q_events_value_ntile",   # distinct-cents histogram base ranks
                              # (bounded by the value domain)
    "q_bigram_pmi",           # <= 40 words from the top-20 bigrams
    "_source_edges",          # distinct-source node dictionary (distinct
                              # set, produced by a distributed groupby)
    "_edge_bcast",            # graph CSR broadcast, size-routed inside the
                              # helper itself (join fallback past 5M edges)
    "q_part_triangles_ordered",  # node-degree arrays; the documented
                              # 10^10-node path is the join swap in
                              # functions/graph.py (see docstring)
    "q_peak_concurrency",     # per-day carry offsets (bounded by days)
    "q_bpe_tokenize_stats",   # trained BPE merge list (vocabulary-sized)
}


def _functions_with_ray_put():
    src = QUERIES_PY.read_text()
    out = {}
    for chunk in re.split(r"(?m)^def ", src)[1:]:
        name = chunk.split("(", 1)[0]
        if "ray.put(" in chunk:
            sig = chunk.split(")", 1)[0]
            out[name] = "route" in sig
    return out


def test_every_query_ray_put_is_routed_or_bounded():
    unrouted = [name for name, has_route in _functions_with_ray_put().items()
                if not has_route and name not in BOUNDED_BROADCASTS]
    assert unrouted == [], (
        f"new ray.put broadcast site(s) in pipelines/queries.py without a "
        f"route kwarg: {unrouted}. Either add a size-routed hashjoin "
        f"fallback (pattern: q_local_supplier_revenue) with a routes-agree "
        f"test, or — only if the payload is bounded regardless of sf — add "
        f"the function to BOUNDED_BROADCASTS with the reason.")


def test_no_unfiltered_driver_read_of_fact_tables():
    """pq.read_table / pd.read_parquet of orders or lineitem on the driver
    must carry a pushed filter or live in a route-kwarg'd function (the
    broadcast route below the threshold)."""
    src = QUERIES_PY.read_text()
    bad = []
    for chunk in re.split(r"(?m)^def ", src)[1:]:
        name = chunk.split("(", 1)[0]
        sig = chunk.split(")", 1)[0]
        if "route" in sig:
            continue
        for m in re.finditer(
                r"(?:pq\.read_table|pd\.read_parquet)\((?:[^)(]|\([^)(]*\))*"
                r"(?:orders|lineitem)\.parquet", chunk):
            bad.append(name)
    assert bad == [], (
        f"driver-side read of a fact table outside a routed function: "
        f"{sorted(set(bad))}")
