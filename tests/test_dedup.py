import datetime as dt

import pyarrow as pa
import pytest

import ray.data

from ocr_main_ray.sources.synth import PAGES_SCHEMA
from ocr_main_ray.stages.dedup import dedup_by_url, dedup_table


def _pages(rows):
    urls, tss, payloads = zip(*rows)
    n = len(rows)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.large_binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["eng"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


T0 = dt.datetime(2025, 1, 1)


def test_dedup_table_keep_first():
    tbl = _pages([
        ("u1", T0 + dt.timedelta(days=1), b"later"),
        ("u1", T0, b"first"),
        ("u2", T0, b"only"),
        ("u1", T0 + dt.timedelta(days=2), b"latest"),
    ])
    out = dedup_table(tbl)
    assert out.num_rows == 2
    d = dict(zip(out.column("url").to_pylist(), out.column("html").to_pylist()))
    assert d == {"u1": b"first", "u2": b"only"}


@pytest.mark.usefixtures("ray_session")
def test_dedup_ray_matches_oracle():
    rows = []
    for k in range(30):
        rows.append((f"u{k % 10}", T0 + dt.timedelta(seconds=k), str(k).encode()))
    tbl = _pages(rows)
    oracle = dedup_table(tbl)
    ds = dedup_by_url(ray.data.from_arrow(tbl))
    got = ds.take_all()
    got_map = {r["url"]: r["html"] for r in got}
    exp_map = dict(zip(oracle.column("url").to_pylist(),
                       oracle.column("html").to_pylist()))
    assert got_map == exp_map
    # arrival order must not matter: reversed input, same winners
    rev = tbl.take(pa.array(list(range(tbl.num_rows - 1, -1, -1))))
    got2 = {r["url"]: r["html"] for r in dedup_by_url(ray.data.from_arrow(rev)).take_all()}
    assert got2 == exp_map


# ---------------------------------------------------------------------------
# incremental-ingest dedup (new batch vs historical corpus)
# ---------------------------------------------------------------------------

def test_incremental_new_docs_filters_seen(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.stages.dedup import content_hashes, incremental_new_docs

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha doc", "beta doc", "gamma doc"]}))
    seen = content_hashes(corpus)
    assert len(seen) == 3

    incoming = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": ["alpha doc",        # exact dup of corpus -> dropped
                 "delta doc",        # new -> kept
                 "beta doc",         # dup -> dropped
                 "delta doc"]}))     # within-batch dup of a NEW doc -> kept
    out = incremental_new_docs(incoming, seen).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]


def test_incremental_empty_corpus_keeps_all(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_main_ray.stages.dedup import incremental_new_docs

    incoming = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"]}))
    out = incremental_new_docs(incoming,
                               np.empty(0, np.int64)).to_pandas()
    assert len(out) == 2
