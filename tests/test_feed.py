"""RSS/Atom feed route: detection, extraction, pipeline wiring."""
import datetime

import pyarrow as pa

from ocr_main_ray.stages.feed import extract_feed_blocks, is_feed

RSS = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
       b"<title>Chan</title>"
       b"<item><title>First &amp; Foremost</title>"
       b"<description><![CDATA[Body <b>one</b> here]]></description></item>"
       b"<item><title>Second</title>"
       b"<description>Plain two</description></item>"
       b"</channel></rss>")

ATOM = (b'<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">'
        b"<entry><title>A1</title><summary>S1 text</summary></entry>"
        b"</feed>")


def test_is_feed_detection():
    assert is_feed(RSS[:512])
    assert is_feed(ATOM[:512])
    assert not is_feed(b"<!DOCTYPE html><html><head>")
    assert not is_feed(b'<?xml version="1.0"?><!DOCTYPE html><html xmlns=')
    assert not is_feed(b"%PDF-1.4")


def test_extract_feed_blocks_rss():
    blocks = extract_feed_blocks(RSS)
    assert blocks == ["First & Foremost\nBody one here", "Second\nPlain two"]


def test_extract_feed_blocks_atom():
    assert extract_feed_blocks(ATOM) == ["A1\nS1 text"]


def test_feed_through_pipeline(ray_session):
    import ray.data as rd

    from ocr_main_ray.pipelines.extract import extract_dataset

    ts = datetime.datetime(2025, 1, 1)
    pages = pa.table({
        "url": pa.array(["http://f.com/feed.xml"], pa.string()),
        "warc_ts": pa.array([ts], pa.timestamp("us")),
        "html": pa.array([RSS], pa.large_binary()),
        "text": pa.array([""], pa.string()),
        "lang": pa.array([""], pa.string()),
    })
    out = extract_dataset(rd.from_arrow(pages)).to_pandas()
    assert out.iloc[0]["content_type"] == "feed"
    assert out.iloc[0]["extracted_text"] == (
        "First & Foremost\nBody one here\n\nSecond\nPlain two")
    assert out.iloc[0]["n_pages"] == 1


def test_urls_from_sitemap():
    from ocr_main_ray.stages.feed import urls_from_sitemap

    sm = (b'<?xml version="1.0"?>'
          b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
          b"<url><loc> http://a.com/1 </loc></url>"
          b"<url><loc>http://a.com/2</loc><lastmod>2024-01-01</lastmod></url>"
          b"</urlset>")
    assert urls_from_sitemap(sm) == ["http://a.com/1", "http://a.com/2"]
    idx = (b"<sitemapindex><sitemap><loc>http://a.com/sitemap1.xml</loc>"
           b"</sitemap></sitemapindex>")
    assert urls_from_sitemap(idx) == ["http://a.com/sitemap1.xml"]
