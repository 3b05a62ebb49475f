"""URL canonicalization + registered-domain rules (stages/urlnorm.py)."""
import pyarrow as pa

from ocr_main_ray.stages.urlnorm import (canonical_url, canonicalize_batch,
                                         registered_domain)


def test_canonical_url_rules():
    assert (canonical_url("HTTP://Example.com:80/a//b/?utm_source=x&z=2&a=1#f")
            == "http://example.com/a/b/?a=1&z=2")
    assert canonical_url("https://ex.com:443/") == "https://ex.com/"
    assert canonical_url("https://ex.com:8443/x") == "https://ex.com:8443/x"
    # trailing slash is NOT merged; empty path becomes "/"
    assert canonical_url("http://ex.com") == "http://ex.com/"
    assert canonical_url("http://ex.com/a/") == "http://ex.com/a/"
    # tracking params dropped, others kept sorted
    assert (canonical_url("http://ex.com/p?gclid=1&b=2&fbclid=3&a=1")
            == "http://ex.com/p?a=1&b=2")


def test_registered_domain():
    assert registered_domain("http://news.bbc.co.uk/x") == "bbc.co.uk"
    assert registered_domain("https://a.b.example.com/") == "example.com"
    assert registered_domain("http://example.com") == "example.com"
    assert registered_domain("http://localhost/") == "localhost"
    assert registered_domain("http://user@host.example.org:8080/") == "example.org"


def test_canonicalize_batch_columns():
    t = pa.table({"url": pa.array(
        ["HTTP://A.com:80/x?utm_a=1", "http://b.co.uk/y"], pa.string())})
    out = canonicalize_batch(t)
    assert out.column("canonical_url").to_pylist() == [
        "http://a.com/x", "http://b.co.uk/y"]
    assert out.column("registered_domain").to_pylist() == ["a.com", "b.co.uk"]


def test_dedup_by_canonical_url_collapses_variants(ray_session):
    import datetime
    import ray.data as rd

    from ocr_main_ray.stages.dedup import dedup_by_url
    from ocr_main_ray.stages.urlnorm import canonicalize_batch

    ts = datetime.datetime(2025, 1, 1)
    pages = pa.table({
        "url": pa.array(["HTTP://Ex.com:80/a?utm_x=1", "http://ex.com/a",
                         "http://other.com/b"], pa.string()),
        "warc_ts": pa.array([ts, ts, ts], pa.timestamp("us")),
        "html": pa.array([b"x", b"y", b"z"], pa.large_binary()),
    })
    ds = rd.from_arrow(pages).map_batches(
        lambda t: canonicalize_batch(t)
        .drop(["url"]).rename_columns(
            ["warc_ts", "html", "url", "registered_domain"]),
        batch_format="pyarrow")
    out = dedup_by_url(ds).to_pandas()
    assert len(out) == 2  # the two /a variants collapsed


def test_robots_noindex_flagging():
    from ocr_main_ray.stages.urlnorm import robots_noindex_batch

    pages = pa.table({"html": pa.array([
        b'<html><head><meta name="robots" content="noindex,nofollow">'
        b"</head><body>x</body></html>",
        b'<html><head><meta content="NOINDEX" name=robots></head>y</html>',
        b'<html><head><meta name="robots" content="index,follow"></head>',
        b"<html><body>no meta at all</body></html>",
        b"",
    ], pa.large_binary())})
    out = robots_noindex_batch(pages)
    assert out.column("robots_noindex").to_pylist() == [
        True, True, False, False, False]


def test_robots_noindex_outside_head_window_ignored():
    from ocr_main_ray.stages.urlnorm import robots_noindex_batch

    far = (b"<html><head></head><body>" + b"x" * 5000 +
           b'<meta name="robots" content="noindex"></body>')
    out = robots_noindex_batch(pa.table({"html": pa.array([far],
                                                          pa.large_binary())}))
    assert out.column("robots_noindex").to_pylist() == [False]


def test_pipeline_hygiene_flags(ray_session):
    import datetime
    import ray.data as rd

    from ocr_main_ray.config import PipelineConfig
    from ocr_main_ray.pipelines.extract import extract_dataset

    ts = datetime.datetime(2025, 1, 1)
    body = ("<html><head></head><body><p>" + "word " * 40
            + "</p></body></html>").encode()
    noidx = (b'<html><head><meta name="robots" content="noindex"></head>'
             b"<body><p>" + b"word " * 40 + b"</p></body></html>")
    pages = pa.table({
        "url": pa.array(["HTTP://Ex.com:80/a?utm_x=1", "http://ex.com/a",
                         "http://keep.com/b", "http://drop.com/c"],
                        pa.string()),
        "warc_ts": pa.array([ts] * 4, pa.timestamp("us")),
        "html": pa.array([body, body, body, noidx], pa.large_binary()),
        "text": pa.array([""] * 4, pa.string()),
        "lang": pa.array([""] * 4, pa.string()),
    })
    cfg = PipelineConfig(canonical_urls=True, drop_noindex=True)
    out = extract_dataset(rd.from_arrow(pages).repartition(2),
                          config=cfg).to_pandas()
    # the two /a variants collapsed to one canonical url; noindex dropped
    assert len(out) == 2
    assert set(out["url"]) == {"http://ex.com/a", "http://keep.com/b"}
