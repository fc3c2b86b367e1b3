"""Property-based tests (hypothesis) over the pure leaf kernels."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from unravel_ray.dedup import minhash_signature, ngram_jaccard, simhash62
from unravel_ray.html_extract import extract_html_spans, split_plain_text
from unravel_ray.pages import PageSelectionError, resolve_pages
from unravel_ray.pdftext import join_direct, join_ocr, needs_ocr_mode

# ---------------------------------------------------------------------------
# page selection
# ---------------------------------------------------------------------------


@given(
    total=st.integers(1, 500),
    start=st.one_of(st.none(), st.integers(-5, 520)),
    end=st.one_of(st.none(), st.integers(-5, 520)),
    pages=st.one_of(st.none(), st.lists(st.integers(-5, 520), max_size=20)),
)
@settings(max_examples=300, deadline=None)
def test_resolve_pages_model(total, start, end, pages):
    """Against a brute-force model: either both raise, or results match the
    reference semantics (discrete beats range; sorted unique 0-indexed)."""
    try:
        got = resolve_pages(total, start, end, pages)
    except PageSelectionError:
        # model must also consider it invalid
        if pages:
            assert any(p < 1 or p > total for p in pages)
        else:
            s = start if start is not None else 1
            e = end if end is not None else total
            assert (
                (start is not None and (start < 1 or start > total))
                or (end is not None and (end < 1 or end > total))
                or s > e
            )
        return
    if pages:
        assert got == sorted({p - 1 for p in pages})
    else:
        s = (start or 1) - 1
        e = end if end is not None else total
        assert got == list(range(s, e))
    assert all(0 <= p < total for p in got)
    assert got == sorted(set(got))


# ---------------------------------------------------------------------------
# pdf joins
# ---------------------------------------------------------------------------

page_text = st.one_of(st.none(), st.text(alphabet=" \t\nabcXYZ-", max_size=30))


@given(st.lists(st.tuples(st.integers(1, 999), page_text), max_size=12))
@settings(max_examples=300, deadline=None)
def test_join_direct_invariants(pages):
    out = join_direct(pages)
    nonblank = [(n, t.strip()) for n, t in pages if t and t.strip()]
    if not nonblank:
        assert out == ""
        return
    # every contributing page's stripped text appears, in order
    pos = 0
    for _, t in nonblank:
        i = out.find(t, pos)
        assert i >= 0
        pos = i + len(t)
    # separator count = contributing pages - 1
    assert len(re.findall(r"\n--- Page \d+ ---\n", out)) >= len(nonblank) - 1
    # never starts with a separator
    assert not out.startswith("\n--- Page")


@given(st.lists(st.tuples(st.integers(1, 999), page_text), min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_join_ocr_keeps_every_page(pages):
    out = join_ocr(pages)
    # separator gate is accumulated-TEXT emptiness (PdfTextExtractor.java:136):
    # a run of leading blank pages emits no separators; once any text (or a
    # separator) has been emitted, every later page gets one.
    leading_blank = 0
    for _, t in pages:
        if t is None or t.strip() == "":
            leading_blank += 1
        else:
            break
    expected = max(0, len(pages) - leading_blank - 1) if leading_blank < len(pages) else 0
    assert len(re.findall(r"\n--- Page \d+ ---\n", out)) == expected


@given(st.lists(st.tuples(st.integers(1, 99), page_text), max_size=8))
@settings(max_examples=200, deadline=None)
def test_needs_ocr_iff_all_blank(pages):
    assert needs_ocr_mode(pages) == all(t is None or t.strip() == "" for _, t in pages)


# ---------------------------------------------------------------------------
# html walk robustness
# ---------------------------------------------------------------------------

tag = st.sampled_from(["p", "h1", "h2", "ul", "li", "div", "b", "em", "span",
                       "script", "nav", "br", "a", "blockquote"])
word = st.text(alphabet="abcdef ", min_size=0, max_size=12)


@st.composite
def tag_soup(draw, depth=0):
    n = draw(st.integers(0, 4 if depth < 2 else 0))
    parts = []
    for _ in range(n):
        t = draw(tag)
        if t == "br":
            parts.append("<br>")
        elif draw(st.booleans()):
            inner = draw(tag_soup(depth=depth + 1)) if depth < 2 else draw(word)
            parts.append(f"<{t}>{inner}</{t}>")
        else:
            parts.append(f"<{t}>{draw(word)}")  # unclosed tag
    parts.append(draw(word))
    return "".join(parts)


@given(tag_soup())
@settings(max_examples=300, deadline=None)
def test_html_walk_never_crashes_or_leaks_script(html):
    spans = extract_html_spans("<script>SENTINEL()</script>" + html)
    for kind, text in spans:
        assert kind in {"heading", "text", "list_item"}
        assert text != ""
        assert "SENTINEL" not in text
        assert "\r" not in text


@given(tag_soup())
@settings(max_examples=300, deadline=None)
def test_single_pass_walk_equals_strip_then_walk(html):
    """extract_html_spans' fused strip+walk must equal the composable
    two-pass pipeline (strip_boilerplate -> walk_spans) on arbitrary soup."""
    from unravel_ray.html_extract import (
        parse_fragment,
        strip_boilerplate,
        walk_spans,
    )

    fused = extract_html_spans(html)
    two_pass = walk_spans(strip_boilerplate(parse_fragment(html)))
    assert fused == two_pass


@given(st.text(alphabet="ab \r\n", max_size=60))
@settings(max_examples=300, deadline=None)
def test_split_plain_text_java_model(text):
    """Model: Java split("\\r?\\n") drops only trailing empties."""
    parts = re.split(r"\r?\n", text)
    while parts and parts[-1] == "":
        parts.pop()
    assert split_plain_text(text) == parts


# ---------------------------------------------------------------------------
# dedup kernels
# ---------------------------------------------------------------------------

doc_text = st.text(alphabet="abcdefgh ", min_size=0, max_size=200)


@given(doc_text)
@settings(max_examples=100, deadline=None)
def test_minhash_identity(text):
    a = minhash_signature(text)
    b = minhash_signature(text)
    assert (a == b).all()
    if text.split():
        assert float(np.mean(a == minhash_signature(text))) == 1.0


@given(doc_text, doc_text)
@settings(max_examples=100, deadline=None)
def test_jaccard_bounds_and_symmetry(t1, t2):
    j = ngram_jaccard(t1, t2)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(t2, t1)
    assert ngram_jaccard(t1, t1) == 1.0


@given(doc_text)
@settings(max_examples=100, deadline=None)
def test_simhash_in_range_and_stable(text):
    h = simhash62(text)
    assert 0 <= h < (1 << 62)
    assert simhash62(text) == h


# richer soup for the fast-parser differential: quotes, slashes, attrs,
# entities, comments, stray '<' — everything that can trigger fallback
fast_soup_atom = st.sampled_from([
    "<p>", "</p>", "<P >", "<div>", "</div>", "<br>", "<br/>", "<li>",
    "<ul>", "</ul>", "<a href=\"x/y\">", "<a href='q'>", "<a href=x/>",
    "<b/>", "<em a=1 />", "<span a=\"</span>\">", "&amp;", "&", "<!--c-->",
    "<!doctype html>", "< p", "<", ">", "word", " txt ", "\nline\n",
    "<script>", "</script>", "<style>", "</style>", "</ script x>",
    "<script>x</scripty></script>", "<script/>", "x</p y>z",
    # hyphenated/custom tags: the fast tokenizer's name group stops at '-';
    # these must fall back to stdlib, never mis-parse as the prefix tag
    "<nav-bar>", "</nav-bar>", "<h1-x>", "</h1-x>", "<ul-x>", "</ul-x>",
    "<script-y>", "</script-y>", "<p-q a=1>", "<p\x0bx>",
])


@given(st.lists(fast_soup_atom, max_size=14))
@settings(max_examples=500, deadline=None)
def test_fast_parser_differential_vs_stdlib(parts):
    """Whenever the fast tokenizer claims an input, its extract output
    must equal the stdlib-parser path byte-for-byte; risky inputs must
    fall back (never a wrong answer, only a slower one)."""
    from unravel_ray.html_extract import (
        _dropped,
        _fast_fragment,
        parse_fragment,
    )

    html = "".join(parts)
    fast = _fast_fragment(html)
    if fast is None:
        return  # fallback path; stdlib is the only implementation

    # structural tree equality (tags in order; adjacent text runs merged —
    # chunk boundaries are not semantic)
    def flat(node, acc):
        if isinstance(node, str):
            if acc and isinstance(acc[-1], tuple) and acc[-1][0] == "txt":
                acc[-1] = ("txt", acc[-1][1] + node)
            else:
                acc.append(("txt", node))
            return acc
        acc.append(("open", node.tag))
        for c in node.children:
            flat(c, acc)
        acc.append(("close", node.tag))
        return acc

    assert flat(fast, []) == flat(parse_fragment(html), [])

    # and full extract output through both trees
    import unravel_ray.html_extract as H

    def via(tree):
        out = []

        def process(el):
            tag = el.tag
            if tag in H.HEADING_TAGS:
                t = H._para_stripped(el)
                if t:
                    out.append(("heading", t))
            elif tag == "p":
                t = H._para_stripped(el)
                if t:
                    out.append(("text", t))
            elif tag in ("ul", "ol"):
                for li in el.children:
                    if not isinstance(li, str) and li.tag == "li":
                        t = H._para_stripped(li)
                        if t:
                            out.append(("list_item", t))
            else:
                surv = [c for c in el.children
                        if not isinstance(c, str) and not _dropped(c)]
                if surv:
                    for c in surv:
                        process(c)
                else:
                    t = H._para_stripped(el)
                    if t:
                        out.append(("text", t))

        for child in tree.children:
            if not isinstance(child, str) and not _dropped(child):
                process(child)
        return out

    assert via(fast) == via(parse_fragment(html))


def test_fast_parser_claims_synth_corpus():
    """The fast path must actually engage on the synthetic corpora (else
    the optimization is dead code)."""
    from unravel_ray.html_extract import _fast_fragment
    from unravel_ray.synth import _doc

    claimed = total = 0
    for i in range(300):
        for s in _doc(42, i)["spans"]:
            if s["kind"] == "html":
                total += 1
                if _fast_fragment(s["text"]) is not None:
                    claimed += 1
    assert total > 50
    assert claimed / total > 0.95


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6), min_size=0,
                max_size=12),
       st.text(alphabet="abcd", min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_lev1_pattern_matches_levenshtein_model(words, tok):
    """The RE2 lev<=1 alternation must count EXACTLY the words within
    edit distance 1 of the token — the property the search_fuzzy oracle
    (DuckDB native levenshtein) checks end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from unravel_ray.relational import _lev1_pattern

    text = " ".join(words)
    got = pc.count_substring_regex(
        pa.array([text]), _lev1_pattern(tok))[0].as_py()
    want = sum(1 for w in words if _lev(w, tok) <= 1)
    assert got == want, (words, tok, got, want)


# ---------------------------------------------------------------------------
# n-gram Jaccard: hash-set micros form vs tuple-set model
# ---------------------------------------------------------------------------


@given(
    a=st.lists(st.sampled_from("cat dog fox hen owl ant bee elk".split()),
               min_size=0, max_size=30),
    b=st.lists(st.sampled_from("cat dog fox hen owl ant bee elk".split()),
               min_size=0, max_size=30),
)
@settings(max_examples=300, deadline=None)
def test_shingle_hash_jaccard_matches_tuple_jaccard(a, b):
    """The SQL-exact shingle-HASH-set micros equals floor(tuple-set
    jaccard * 1e6) — hash collisions are the only divergence and cannot
    occur over this 8-word vocabulary (distinct shingles << 2^31)."""
    from unravel_ray.dedup import _shingle_hashes

    ta, tb = " ".join(a), " ".join(b)
    sa = np.unique(_shingle_hashes(ta))
    sb = np.unique(_shingle_hashes(tb))
    inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
    uni = int(sa.size) + int(sb.size) - inter
    micros = 1_000_000 if uni == 0 else inter * 1_000_000 // uni
    true = ngram_jaccard(ta, tb)
    assert micros == int(true * 1_000_000) or abs(micros - true * 1e6) < 1
