"""HTML sanitize + span walk (M8/M9) — pins DocxExportServiceImpl.java:46-159
walk order and UpdateOcrContentImpl.java:45-51 boilerplate stripping."""

from unravel_ray.html_extract import (
    extract_html_spans,
    is_html,
    split_plain_text,
)


def test_heading_paragraph_list_order():
    html = "<h1>Title</h1><p>Para one.</p><ul><li>a</li><li>b</li></ul><p>End.</p>"
    assert extract_html_spans(html) == [
        ("heading", "Title"),
        ("text", "Para one."),
        ("list_item", "a"),
        ("list_item", "b"),
        ("text", "End."),
    ]


def test_script_and_style_stripped():
    html = "<script>evil()</script><p>keep</p><style>.x{}</style>"
    assert extract_html_spans(html) == [("text", "keep")]


def test_event_handlers_do_not_leak():
    html = '<p onclick="steal()">safe text</p>'
    assert extract_html_spans(html) == [("text", "safe text")]


def test_nav_dropped():
    html = '<nav><a href="/">Home</a><a href="/x">X</a></nav><p>body</p>'
    assert extract_html_spans(html) == [("text", "body")]


def test_link_farm_div_dropped_but_texty_div_kept():
    farm = '<div><a href="#1">one</a> <a href="#2">two</a> <a href="#3">three</a></div>'
    assert extract_html_spans(farm) == []
    # Mixed-content div: reference recurses into element children only
    # (jsoup children() yields elements; bare text in a container is not
    # walked — DocxExportServiceImpl.java:133-140 default branch).
    texty = "<div>plain prose inside a div with <a href='#'>one link</a> only</div>"
    assert extract_html_spans(texty) == [("text", "one link")]
    # A pure-text div (no element children) IS kept as a fallback paragraph.
    pure = "<div>plain prose inside a div with no links at all in sight</div>"
    assert extract_html_spans(pure) == [
        ("text", "plain prose inside a div with no links at all in sight")
    ]


def test_inline_marks_flattened_into_paragraph():
    html = "<p>Hello <b>bold</b> and <em>italic</em> end</p>"
    assert extract_html_spans(html) == [("text", "Hello bold and italic end")]


def test_br_becomes_line_break():
    html = "<p>line one<br>line two</p>"
    assert extract_html_spans(html) == [("text", "line one\nline two")]


def test_unknown_container_recurses_unknown_leaf_falls_back():
    html = "<article><h2>H</h2><p>P</p></article><blockquote>quoted</blockquote>"
    assert extract_html_spans(html) == [
        ("heading", "H"),
        ("text", "P"),
        ("text", "quoted"),
    ]


def test_ol_list_items():
    html = "<ol><li>first</li><li>second</li></ol>"
    assert extract_html_spans(html) == [("list_item", "first"), ("list_item", "second")]


def test_whitespace_normalized():
    html = "<p>  a   lot\t of   space  </p>"
    assert extract_html_spans(html) == [("text", "a lot of space")]


def test_empty_runs_dropped():
    assert extract_html_spans("<p></p><p>x</p><h1>  </h1>") == [("text", "x")]


def test_bare_text_at_top_level_not_walked():
    # jsoup body.children() yields elements only
    assert extract_html_spans("stray text <p>kept</p>") == [("text", "kept")]


def test_split_plain_text_crlf_and_trailing():
    assert split_plain_text("a\r\nb\n\nc\n\n") == ["a", "b", "", "c"]
    assert split_plain_text("") == []


def test_is_html_sniff():
    assert is_html("<p>x</p>")
    assert is_html("<ul><li>x</li></ul>")
    assert not is_html("just text with <div>")
    assert not is_html(None)


def test_table_cells_recurse_to_fallback_paragraphs():
    # tables are unknown containers: recursion reaches the td leaves
    # (DocxExportServiceImpl.java default branch)
    html = "<table><tr><td>cell one</td><td>cell two</td></tr></table>"
    assert extract_html_spans(html) == [("text", "cell one"), ("text", "cell two")]


def test_nested_list_items():
    html = "<ul><li>outer</li><li><ul><li>inner</li></ul></li></ul>"
    spans = extract_html_spans(html)
    # outer li is a list_item; the li wrapping a nested ul renders its text
    assert ("list_item", "outer") in spans
    assert any("inner" in t for _, t in spans)


def test_deeply_nested_containers():
    html = "<div><section><article><p>deep</p></article></section></div>"
    assert extract_html_spans(html) == [("text", "deep")]


def test_unterminated_script_content_discarded():
    """html.parser drops unterminated CDATA content at EOF; the fast
    tokenizer must agree (regression: it used to keep '</a>' as text,
    inflating ancestor link-farm totals)."""
    from unravel_ray.html_extract import _fast_fragment, parse_fragment

    html = "<div><script></a></div>x<p>tail</p>"
    # the stray </div> inside script stays CDATA text per stdlib...
    for frag in ("<script></a>", "<script>abc", "<div><script>x</div>"):
        fast = _fast_fragment(frag)
        if fast is None:
            continue  # fallback is always safe

        def flat(node):
            if isinstance(node, str):
                return [node]
            out = [f"<{node.tag}>"]
            for c in node.children:
                out.extend(flat(c))
            return out

        assert flat(fast) == flat(parse_fragment(frag)), frag
