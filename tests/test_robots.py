"""robots.txt parser + crawl-permission filter (stages/robots.py)."""
import pyarrow as pa
import pytest

from ocr_main_ray.stages.robots import (apply_robots_filter,
                                        build_robots_index, parse_robots)

BASIC = b"""
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /tmp
"""


def test_longest_match_allow_wins():
    r = parse_robots(BASIC)
    assert r.allowed("/public/x")
    assert not r.allowed("/private/secret.html")
    assert r.allowed("/private/ok.html")        # longer Allow beats Disallow
    assert not r.allowed("/tmp")
    assert not r.allowed("/tmpfile")            # prefix match, no anchor


def test_wildcards_and_anchor():
    r = parse_robots(b"User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*b/")
    assert not r.allowed("/docs/file.pdf")
    assert r.allowed("/docs/file.pdf?x=1")      # $ anchors the end
    assert not r.allowed("/aXYZb/page")
    assert r.allowed("/ab")                     # needs the trailing slash


def test_agent_group_selection():
    txt = b"""
User-agent: *
Disallow: /

User-agent: goodbot
Disallow:

User-agent: goodbot-images
Disallow: /img/
"""
    assert not parse_robots(txt, "otherbot").allowed("/x")
    assert parse_robots(txt, "goodbot").allowed("/x")   # empty Disallow
    # longest agent prefix wins
    assert parse_robots(txt, "goodbot-images/1.0").allowed("/x")
    assert not parse_robots(txt, "goodbot-images/1.0").allowed("/img/a.png")


def test_shared_agent_run_and_ignored_directives():
    txt = b"""
User-agent: a
User-agent: b
Crawl-delay: 10
Sitemap: https://x/s.xml
Disallow: /blocked
"""
    for agent in ("a", "b"):
        r = parse_robots(txt, agent)
        assert not r.allowed("/blocked/page")
        assert r.allowed("/open")
    assert parse_robots(txt, "c").allowed("/blocked/page")  # no * group


def test_tie_allow_beats_disallow():
    r = parse_robots(b"User-agent: *\nDisallow: /dir/\nAllow: /dir/")
    assert r.allowed("/dir/x")


@pytest.mark.usefixtures("ray_session")
def test_apply_robots_filter_on_pages():
    import ray.data as rd

    robots = pa.table({
        "host": ["strict.example.com", "open.example.com"],
        "payload": [b"User-agent: *\nDisallow: /no/",
                    b"User-agent: *\nDisallow:"]})
    pages = pa.table({"url": [
        "https://strict.example.com/no/secret",
        "https://strict.example.com/yes/fine",
        "https://open.example.com/no/anything",
        "https://unknown.example.com/whatever",   # no robots -> allowed
        "not a url at all",
    ]})
    out = (apply_robots_filter(rd.from_arrow(pages), robots)
           .to_pandas().set_index("url")["robots_allowed"])
    assert not out["https://strict.example.com/no/secret"]
    assert out["https://strict.example.com/yes/fine"]
    assert out["https://open.example.com/no/anything"]
    assert out["https://unknown.example.com/whatever"]
    assert out["not a url at all"]


def test_index_last_payload_wins():
    tbl = pa.table({"host": ["H.example.com", "h.example.com"],
                    "payload": [b"User-agent: *\nDisallow: /",
                                b"User-agent: *\nDisallow:"]})
    idx = build_robots_index(tbl)
    assert idx["h.example.com"].allowed("/x")
