"""HTML metadata extraction stage."""
import pyarrow as pa

from ocr_main_ray.stages.html_meta import extract_meta_batch


def _t(html: bytes) -> pa.Table:
    return pa.table({"html": pa.array([html], pa.large_binary())})


def test_og_title_priority_over_title_tag():
    out = extract_meta_batch(_t(
        b'<head><meta property="og:title" content="OG Wins">'
        b"<title>Tag Title</title></head>"))
    assert out.column("meta_title")[0].as_py() == "OG Wins"


def test_title_tag_fallback_and_description():
    out = extract_meta_batch(_t(
        b"<head><title> My Page </title>"
        b'<meta name="description" content="a desc"></head>'))
    assert out.column("meta_title")[0].as_py() == "My Page"
    assert out.column("meta_description")[0].as_py() == "a desc"


def test_author_and_published_variants():
    out = extract_meta_batch(_t(
        b'<head><meta content="Jane Doe" name="author">'
        b'<meta property="article:published_time" content="2024-05-06T07:00:00Z">'
        b"</head>"))
    assert out.column("meta_author")[0].as_py() == "Jane Doe"
    assert out.column("meta_published")[0].as_py() == "2024-05-06T07:00:00Z"


def test_jsonld_date_fallback_and_empty_defaults():
    out = extract_meta_batch(_t(
        b'<head><script type="application/ld+json">'
        b'{"@type":"Article","datePublished":"2023-01-02"}</script></head>'))
    assert out.column("meta_published")[0].as_py() == "2023-01-02"
    out2 = extract_meta_batch(_t(b"<html><body>nothing</body></html>"))
    for c in ["meta_title", "meta_description", "meta_author",
              "meta_published"]:
        assert out2.column(c)[0].as_py() == ""
