"""Boilerplate-stripped HTML text extraction (sources/html_extract.py)."""

from knowledgebase_processor_spark.sources.html_extract import (
    extract_main_text, pages_with_text, strip_boilerplate,
)

PAGE = b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = "SCRIPT NOISE";</script><style>.c{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<header><h1>Site Header Banner With Many Words Here</h1></header>
<article>
<p>This is the main article content paragraph, long enough to keep
and clearly not navigation boilerplate at all.</p>
<p>Second real paragraph of body text that also exceeds the minimum
character threshold for content blocks.</p>
<p><a href="x">link</a> <a href="y">menu</a></p>
</article>
<aside>Related links sidebar with plenty of text that should vanish
because aside subtrees are boilerplate by rule.</aside>
<footer>Copyright 2024 Example Corp All Rights Reserved Worldwide</footer>
</body></html>"""


def test_extract_main_text_keeps_content_drops_boilerplate():
    text = extract_main_text(PAGE)
    assert "main article content" in text
    assert "Second real paragraph" in text
    for noise in ("SCRIPT NOISE", "color:red", "Home", "Copyright",
                  "sidebar", "Site Header Banner"):
        assert noise not in text
    # short all-link paragraph (menu) dropped
    assert "menu" not in text


def test_extract_main_text_edge_cases():
    assert extract_main_text(None) == ""
    assert extract_main_text(b"") == ""
    assert extract_main_text("<p>tiny</p>") == ""          # under MIN_CHARS
    pre = "<pre>short code\n  kept   verbatim</pre>"
    assert extract_main_text(pre) == "short code\n  kept   verbatim"
    # malformed html must not raise
    extract_main_text(b"<div><p>unclosed <a href=")
    # invalid utf-8 bytes decode with replacement, no crash
    extract_main_text(b"\xff\xfe<p>" + b"x" * 40 + b"</p>")


def test_extract_main_text_deterministic():
    assert extract_main_text(PAGE) == extract_main_text(PAGE)


def test_strip_boilerplate_operator(spark):
    pages = spark.createDataFrame(
        [("u1", PAGE.decode()), ("u2", "<p>" + "content word " * 10 + "</p>")],
        "url string, html string")
    rows = {r.url: r.extracted_text
            for r in strip_boilerplate(pages).collect()}
    assert "main article content" in rows["u1"]
    assert rows["u2"].startswith("content word")


def test_pages_with_text_cascade(spark):
    pages = spark.createDataFrame(
        [("u1", "<p>" + "w " * 30 + "</p>", "shipped text"),
         ("u2", "<p>" + "extracted body text " * 5 + "</p>", None)],
        "url string, html string, text string")
    rows = {r.url: r.text for r in pages_with_text(pages).collect()}
    assert rows["u1"] == "shipped text"          # shipped text wins
    assert rows["u2"].startswith("extracted body text")


def test_unclosed_head_and_form_do_not_swallow_body():
    # HTML5-legal omitted </head>: body content must survive
    page = (b"<html><head><title>T</title><meta charset=utf-8>"
            b"<body><p>Long real article content paragraph here ok</p>")
    assert "Long real article content" in extract_main_text(page)
    # same without <body>: first content block closes head
    page2 = (b"<html><head><title>T</title>"
             b"<p>Another long enough content paragraph right here</p>")
    assert "Another long enough" in extract_main_text(page2)
    # unclosed <form> inside the page must not swallow the rest
    page3 = (b"<body><form><input name=q>"
             b"<p>should be dropped (inside form)</p></form>"
             b"<p>content after the form block is long and kept fine</p>")
    out3 = extract_main_text(page3)
    assert "content after the form" in out3 and "inside form" not in out3
